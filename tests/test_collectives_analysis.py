"""Communication accounting (bvc_tpu/parallel/analysis.py): the compiled
step's collectives must match the layout's expected structure.

The reference cannot make these assertions at all — its communication is
NCCL calls behind DDP hooks, invisible until a cluster run.  Here the
SPMD partitioner writes the collectives into the program, so we assert
the pod-scale communication contract on the virtual 8-device CPU mesh:

- pure DP all-reduces exactly the gradient volume (plus scalar metrics),
  gathers nothing;
- grad accumulation keeps every large collective OUT of the scan body —
  one gradient all-reduce per optimizer step, not per microbatch;
- FSDP all-gathers parameters and reduce-scatters (or all-reduces)
  gradients;
- TP runs activation collectives over model-axis groups.
"""

import jax
import numpy as np
import pytest

from bvc_tpu.models import videomae
from bvc_tpu.parallel import make_mesh, shard_batch
from bvc_tpu.parallel.analysis import (
    CollectiveOp,
    comm_report,
    parse_collectives,
    tree_bytes,
)
from bvc_tpu.training.optim import make_optimizer
from bvc_tpu.training.state import TrainState
from bvc_tpu.training.steps import make_videomae_train_step, place_state
from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig

_CFG = ModelConfig(
    image_size=32, patch_size=8, num_frames=4, tubelet_size=2,
    hidden_size=32, depth=2, num_heads=4,
    decoder_hidden_size=16, decoder_depth=1, decoder_num_heads=2,
    dtype="float32",
)
# scalar loss/metric reductions are tiny; gradient buffers are not
_BIG = 1024


def _report(param_mode, mesh_shape=None, grad_accum=1):
    mesh = make_mesh(mesh_shape)
    tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
    params = videomae.init_params(jax.random.PRNGKey(0), _CFG)
    state = place_state(
        TrainState.create(params, tx, jax.random.PRNGKey(1)), mesh, param_mode
    )
    step = make_videomae_train_step(
        mesh, _CFG, MaskConfig(mask_ratio=0.75), tx, param_mode,
        grad_accum=grad_accum,
    )
    data_size = mesh.shape["data"]
    video = np.random.default_rng(0).standard_normal(
        (2 * grad_accum * data_size, 4, 32, 32, 3)
    ).astype(np.float32)
    batch = shard_batch(video, mesh)
    text = step.compiled_text(state, batch)
    return comm_report(text), params, text


class TestParser:
    _HLO = """
HloModule jit_step

%add.clone (x: f32[], y: f32[]) -> f32[] {
  %x = f32[] parameter(0)
  %y = f32[] parameter(1)
  ROOT %add = f32[] add(%x, %y)
}

%body (p: (s32[], f32[16,16])) -> (s32[], f32[16,16]) {
  %p = (s32[], f32[16,16]) parameter(0)
  %g = f32[16,16]{1,0} get-tuple-element(%p), index=1
  %ar.loop = f32[16,16]{1,0} all-reduce(%g), channel_id=3, replica_groups=[1,8]<=[8], to_apply=%add.clone
  ROOT %t = (s32[], f32[16,16]) tuple(%g, %ar.loop)
}

ENTRY %main (a: f32[16,16]) -> f32[16,16] {
  %a = f32[16,16]{1,0} parameter(0)
  %w = (s32[], f32[16,16]) while(%init), condition=%cond, body=%body
  %ar.2 = (f32[16,16]{1,0}, f32[]) all-reduce(%a, %s), channel_id=1, replica_groups=[1,8]<=[8], use_global_device_ids=true, to_apply=%add.clone
  %ag = f32[64,16]{1,0} all-gather(%shard), channel_id=2, replica_groups={{0,1,2,3},{4,5,6,7}}, dimensions={0}
  %done = f32[8,16]{1,0} all-reduce-done(%started)
  ROOT %r = f32[16,16] get-tuple-element(%ar.2), index=0
}
"""

    def test_kinds_bytes_groups_and_loops(self):
        ops = parse_collectives(self._HLO)
        kinds = sorted(op.kind for op in ops)
        assert kinds == ["all-gather", "all-reduce", "all-reduce"]
        ar_entry = [
            op for op in ops if op.kind == "all-reduce" and not op.in_loop
        ]
        assert len(ar_entry) == 1
        # tuple payload: 16*16*4 + 4 bytes
        assert ar_entry[0].payload_bytes == 16 * 16 * 4 + 4
        assert ar_entry[0].group_size == 8
        ag = next(op for op in ops if op.kind == "all-gather")
        assert ag.payload_bytes == 64 * 16 * 4
        assert ag.group_size == 4  # explicit groups of 4
        loop = [op for op in ops if op.in_loop]
        assert len(loop) == 1 and loop[0].computation == "body"

    _HLO_INDIRECT = """
HloModule jit_step2

%add2 (x: f32[], y: f32[]) -> f32[] {
  %x = f32[] parameter(0)
  %y = f32[] parameter(1)
  ROOT %add = f32[] add(%x, %y)
}

%branch_ar (q: f32[16,16]) -> f32[16,16] {
  %q = f32[16,16]{1,0} parameter(0)
  ROOT %ar.br = f32[16,16]{1,0} all-reduce(%q), channel_id=5, replica_groups=[1,8]<=[8], to_apply=%add2
}

%branch_id (q2: f32[16,16]) -> f32[16,16] {
  %q2 = f32[16,16]{1,0} parameter(0)
  ROOT %cp = f32[16,16]{1,0} copy(%q2)
}

%body2 (p: (s32[], f32[16,16])) -> (s32[], f32[16,16]) {
  %p = (s32[], f32[16,16]) parameter(0)
  %i = s32[] get-tuple-element(%p), index=0
  %g = f32[16,16]{1,0} get-tuple-element(%p), index=1
  %c = f32[16,16]{1,0} conditional(%i, %g, %g), branch_computations={%branch_id, %branch_ar}
  ROOT %t = (s32[], f32[16,16]) tuple(%i, %c)
}

ENTRY %main2 (a: f32[16,16]) -> f32[16,16] {
  %a = f32[16,16]{1,0} parameter(0)
  %w = (s32[], f32[16,16]) while(%init), condition=%cond2, body=%body2
  ROOT %r = f32[16,16] get-tuple-element(%w), index=1
}
"""

    def test_collective_called_from_loop_body_is_in_loop(self):
        """A collective in a computation invoked FROM the while body (a
        conditional branch here) executes once per iteration; lexical
        nesting alone would miss it — the exact per-iteration-traffic
        regression the grad-accum accounting exists to catch."""
        ops = parse_collectives(self._HLO_INDIRECT)
        assert len(ops) == 1
        assert ops[0].kind == "all-reduce"
        assert ops[0].computation == "branch_ar"
        assert ops[0].in_loop is True

    def test_ring_estimates(self):
        ar = CollectiveOp("all-reduce", 1000, 8)
        assert ar.ring_bytes_per_chip == pytest.approx(2 * 7 / 8 * 1000)
        ag = CollectiveOp("all-gather", 1000, 4)
        assert ag.ring_bytes_per_chip == pytest.approx(3 / 4 * 1000)
        rs = CollectiveOp("reduce-scatter", 125, 8)  # shard-shaped result
        assert rs.ring_bytes_per_chip == pytest.approx(7 * 125)
        assert CollectiveOp("all-reduce", 1000, 1).ring_bytes_per_chip == 0.0
        # ppermutes carry source_target_pairs (group_size stays 1) but
        # each chip still moves the payload once
        assert CollectiveOp("collective-permute", 640, 1).ring_bytes_per_chip == 640.0


class TestDataParallel:
    def test_dp_allreduces_grad_volume_and_gathers_nothing(self):
        report, params, _ = _report("replicated")
        grad_bytes = tree_bytes(params)
        ar = report.bytes_for("all-reduce", min_payload=_BIG)
        # the large all-reduces are exactly the gradient tree (metrics are
        # scalar); combiner passes may merge or split buffers — bytes, not
        # counts, are the contract
        assert ar == pytest.approx(grad_bytes, rel=0.05)
        assert report.bytes_for("all-gather", min_payload=_BIG) == 0
        assert report.bytes_for("reduce-scatter", min_payload=_BIG) == 0

    def test_grad_accum_keeps_collectives_out_of_the_scan(self):
        report, params, text = _report("replicated", grad_accum=4)
        # the scan must actually be there, or the in-loop check is vacuous
        assert " while(" in text
        big_loop_ops = [
            op for op in report.loop_ops if op.payload_bytes >= _BIG
        ]
        assert big_loop_ops == [], (
            "gradient all-reduce must happen once per optimizer step, not "
            f"per microbatch: {[(o.kind, o.payload_bytes) for o in big_loop_ops]}"
        )
        # and the one-shot gradient reduction is still there, once
        ar = report.bytes_for("all-reduce", min_payload=_BIG)
        assert ar == pytest.approx(tree_bytes(params), rel=0.05)


class TestZero1:
    def test_zero1_adds_only_the_param_allgather(self):
        # ZeRO-1: grads still all-reduced (or reduce-scattered), plus ONE
        # param-volume all-gather for the updated params; params are
        # never gathered on use (that would be FSDP's 2x-per-pass cost)
        report, params, _ = _report("zero1")
        grad_bytes = tree_bytes(params)
        ar = report.bytes_for("all-reduce", min_payload=_BIG)
        rs = report.bytes_for("reduce-scatter", min_payload=_BIG)
        assert ar + rs * 8 >= grad_bytes * 0.9  # reduction of grad volume
        ag = report.bytes_for("all-gather", min_payload=_BIG)
        # ~one param volume of gather (updated params), not the several
        # volumes FSDP pays across fwd/bwd passes
        assert grad_bytes * 0.5 <= ag <= grad_bytes * 1.5


class TestFsdp:
    def test_fsdp_gathers_params_and_scatters_grads(self):
        report, params, _ = _report("fsdp")
        # parameters are gathered on use (fwd + bwd recompute paths)
        assert report.bytes_for("all-gather", min_payload=_BIG) > 0
        # gradients return sharded: reduce-scatter (or a partitioner
        # fallback of all-reduce + slice)
        rs = report.bytes_for("reduce-scatter", min_payload=_BIG)
        ar = report.bytes_for("all-reduce", min_payload=_BIG)
        assert rs > 0 or ar > 0


class TestTensorParallel:
    def test_tp_collectives_run_over_model_groups(self):
        report, _, _ = _report("tp", mesh_shape={"data": 4, "model": 2})
        model_ops = [
            op for op in report.ops
            if op.group_size == 2 and op.payload_bytes >= _BIG
        ]
        assert model_ops, "TP must reduce activations over the model axis"
        # DP gradient reduction still present over the 4-way data axis
        data_ops = [
            op for op in report.ops
            if op.group_size in (4, 8) and op.payload_bytes >= _BIG
        ]
        assert data_ops


class TestSeqParallel:
    def test_seq_step_is_ring_hops_plus_one_grad_allreduce(self):
        """The time-sharded step's only communication: neighbor ppermutes
        for the two ring attentions plus ONE gradient all-reduce over
        both axes (SCALING.md 'Sequence parallelism')."""
        from bvc_tpu.parallel.seqpar import (
            make_seq_mesh, make_seq_videomae_train_step, shard_seq_batch,
        )

        mesh = make_seq_mesh(4, 2)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
        params = videomae.init_params(jax.random.PRNGKey(0), _CFG)
        state = TrainState.create(params, tx, jax.random.PRNGKey(1))
        step = make_seq_videomae_train_step(
            mesh, _CFG, MaskConfig(sampler="tube", mask_ratio=0.75), tx
        )
        video = np.random.default_rng(0).standard_normal(
            (8, 4, 32, 32, 3)).astype(np.float32)
        text = step.compiled_text(state, shard_seq_batch(video, mesh))
        report = comm_report(text)
        # one gradient all-reduce, exactly the gradient volume
        assert report.bytes_for("all-reduce", min_payload=_BIG) == (
            pytest.approx(tree_bytes(params), rel=0.05)
        )
        # ring hops present; each chip moves each hop's payload once
        pp = [op for op in report.ops if op.kind == "collective-permute"]
        assert pp, "ring attention must emit collective-permutes"
        for op in pp:
            assert op.ring_bytes_per_chip == float(op.payload_bytes)
        # nothing else: no gathers/scatters in this layout
        assert report.bytes_for("all-gather", min_payload=_BIG) == 0
        assert report.bytes_for("reduce-scatter", min_payload=_BIG) == 0


class TestPipelineParallel:
    def test_pipe_step_is_stage_hops_plus_grad_reductions(self):
        """The GPipe step's communication: neighbor ppermutes for the two
        pipelined stacks (+ the encoder→decoder relay hop), one gradient
        pmean over 'data', and the psum over 'pipe' recovering the
        replicated edge-param grads — no parameter all-gathers anywhere
        (SCALING.md 'Pipeline parallelism')."""
        import dataclasses

        from bvc_tpu.parallel.pipeline import (
            make_pipe_mesh, make_pipe_videomae_train_step, pipe_state_shardings,
        )
        from bvc_tpu.parallel.sharding import shard_batch

        cfg = dataclasses.replace(_CFG, depth=4, decoder_depth=2)
        mesh = make_pipe_mesh(4, 2)
        tx = make_optimizer(OptimConfig(name="sgd", lr=0.05, momentum=0.9))
        params = videomae.init_params(jax.random.PRNGKey(0), cfg)
        state = TrainState.create(params, tx, jax.random.PRNGKey(1))
        state = jax.device_put(state, pipe_state_shardings(state, mesh))
        step = make_pipe_videomae_train_step(
            mesh, cfg, MaskConfig(sampler="tube", mask_ratio=0.75), tx,
            num_microbatches=2,
        )
        video = np.random.default_rng(0).standard_normal(
            (8, 4, 32, 32, 3)).astype(np.float32)
        text = step.compiled_text(state, shard_batch(video, mesh))
        report = comm_report(text)
        # stage hops present (fwd scans + transposed bwd); neighbor traffic
        pp = [op for op in report.ops if op.kind == "collective-permute"]
        assert pp, "GPipe schedule must emit collective-permutes"
        for op in pp:
            assert op.ring_bytes_per_chip == float(op.payload_bytes)
        # grad reductions: at least the per-stage block grads pmean over
        # 'data'; at most a small multiple of the full grad volume (the
        # replicated-leaf psum over 'pipe' adds a second pass there)
        import jax as _jax

        blocks = {"encoder": params["encoder"], "decoder": params["decoder"]}
        stage_bytes = tree_bytes(blocks) // 2  # per chip at pipe=2
        ar = report.bytes_for("all-reduce", min_payload=_BIG)
        assert ar >= stage_bytes
        assert ar <= 3 * tree_bytes(params)
        # no parameter all-gathers / reduce-scatters in this layout
        assert report.bytes_for("all-gather", min_payload=_BIG) == 0
        assert report.bytes_for("reduce-scatter", min_payload=_BIG) == 0
