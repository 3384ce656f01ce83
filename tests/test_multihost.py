"""REAL multi-process multi-host tests (2 CPU processes, gloo collectives).

Everything else in the suite runs multi-DEVICE in one process; these
tests spawn two actual jax processes connected through
``jax.distributed.initialize`` — the configuration the reference reaches
with SLURM multi-node NCCL (``predictive/distributed.py:18-46``) — and
exercise the cross-process primitives the extraction/training paths rely
on: process-count discovery, ``all_gather_objects`` (incl. a zero-row
host), the host barrier, ``EpochSampler`` host slicing, and a jitted
global-mean reduction over a cross-process mesh.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.multihost

_REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, os, sys
proc_id, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, sys.argv[4])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from bvc_tpu.parallel.mesh import distributed_init, make_mesh
# explicit process_id=0 must be honored (regression: `or` fallback)
distributed_init(f"localhost:{port}", n_proc, proc_id)

import numpy as np
from bvc_tpu.parallel.collectives import all_gather_objects, sync_hosts
from bvc_tpu.data.loader import EpochSampler

out = {"process_count": jax.process_count(),
       "process_index": jax.process_index(),
       "local_devices": len(jax.local_devices()),
       "global_devices": len(jax.devices())}

# cross-host object gather; host 1 contributes ZERO rows (uneven-host
# case of the extraction path)
if proc_id == 0:
    local = {"fnames": ["a", "b"], "embeddings": np.ones((2, 4), np.float32)}
else:
    local = {"fnames": [], "embeddings": np.zeros((0, 1), np.float32)}
gathered = all_gather_objects(local)
from bvc_tpu.evalbench.extract import merge_gathered
names, embs = merge_gathered(gathered)
out["gather_names"] = names
out["gather_shape"] = list(embs.shape)

# host-sliced epoch sampling: each host sees its own contiguous block of
# every global batch; the union must cover the dataset exactly
s = EpochSampler(dataset_len=16, global_batch_size=8, shuffle=True, seed=3)
mine = np.concatenate(s.batches(epoch=0))
out["my_indices"] = sorted(int(i) for i in mine)

# jitted global mean over a cross-process mesh (the DP loss reduction)
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = make_mesh()  # all 8 global devices on 'data'
sharding = NamedSharding(mesh, P("data"))
local_part = np.full((4, 2), float(proc_id), np.float32)  # host i -> i
garr = jax.make_array_from_process_local_data(sharding, local_part, (8, 2))
mean = jax.jit(lambda x: x.mean(), out_shardings=NamedSharding(mesh, P()))(garr)
# replicated output: every process reads its local copy
out["global_mean"] = float(np.asarray(mean.addressable_data(0)))

# the REAL train step over the cross-process mesh: replicated params,
# data-sharded uint8 batch, XLA-emitted cross-process grad reduction
from bvc_tpu.models import videomae
from bvc_tpu.parallel import shard_batch
from bvc_tpu.training.optim import make_optimizer
from bvc_tpu.training.state import TrainState
from bvc_tpu.training.steps import make_videomae_train_step, place_state
from bvc_tpu.utils.config import MaskConfig, ModelConfig, OptimConfig
cfg = ModelConfig(image_size=16, patch_size=8, num_frames=2, tubelet_size=2,
                  hidden_size=16, depth=1, num_heads=2,
                  decoder_hidden_size=8, decoder_depth=1,
                  decoder_num_heads=2, dtype="float32")
tx = make_optimizer(OptimConfig(lr=0.01))
params = videomae.init_params(jax.random.PRNGKey(0), cfg)
state = place_state(TrainState.create(params, tx, jax.random.PRNGKey(1)), mesh)
step = make_videomae_train_step(mesh, cfg, MaskConfig(mask_ratio=0.75), tx)
# 16-clip global batch: every host contributes its 8-clip local slice
local_clips = np.random.default_rng(proc_id).integers(
    0, 255, (8, 2, 16, 16, 3), np.uint8)
with mesh:
    batch = shard_batch(local_clips, mesh)
    losses = []
    for _ in range(2):
        state, metrics = step(state, batch)
        losses.append(float(np.asarray(metrics["loss"].addressable_data(0))))
out["step_losses"] = losses

# gradient accumulation over the CROSS-PROCESS mesh: the shard_map
# partial-sum path (one gradient reduction per optimizer step,
# tests/test_collectives_analysis.py) must run across process
# boundaries and reproduce the single-shot loss (identical masks: both
# steps sample from the same state rng over the same global batch)
state_a = place_state(TrainState.create(params, tx, jax.random.PRNGKey(1)), mesh)
step_a = make_videomae_train_step(mesh, cfg, MaskConfig(mask_ratio=0.75), tx,
                                  grad_accum=2)
state_s = place_state(TrainState.create(params, tx, jax.random.PRNGKey(1)), mesh)
step_s = make_videomae_train_step(mesh, cfg, MaskConfig(mask_ratio=0.75), tx)
with mesh:
    _, m_a = step_a(state_a, batch)
    _, m_s = step_s(state_s, batch)
    out["accum_loss"] = float(np.asarray(m_a["loss"].addressable_data(0)))
    out["single_loss"] = float(np.asarray(m_s["loss"].addressable_data(0)))

# FSDP-sharded save -> restore -> resume cycle (VERDICT r2 #4): host 0
# alone cannot materialise non-addressable shards, so save_checkpoint
# must run an all-host distributed save; the restored state must resume
# to the exact same loss as the uninterrupted run
from bvc_tpu.training.checkpoint import load_checkpoint, save_checkpoint
state_f = place_state(TrainState.create(params, tx, jax.random.PRNGKey(1)),
                      mesh, "fsdp")
step_f = make_videomae_train_step(mesh, cfg, MaskConfig(mask_ratio=0.75), tx,
                                  "fsdp")
with mesh:
    state_f, _ = step_f(state_f, batch)
out["fsdp_nonaddressable"] = any(
    isinstance(x, jax.Array) and not x.is_fully_addressable
    for x in jax.tree_util.tree_leaves(state_f.params)
)
ck = os.path.join(os.getcwd(), "model_fsdp_test.ckpt")
save_checkpoint(ck, {"model_state_dict": state_f.params,
                     "opt": state_f.opt_state,
                     "step": np.asarray(jax.device_get(state_f.step)),
                     "rng": np.asarray(jax.device_get(state_f.rng))},
                meta={"run_id": "fsdp_test"})
out["ckpt_meta_exists"] = os.path.exists(os.path.join(ck, "meta.json"))
saved_step = int(np.asarray(jax.device_get(state_f.step)))
saved_rng = np.asarray(jax.device_get(state_f.rng))
# uninterrupted continuation (donates state_f — already on disk)
with mesh:
    _, m_cont = step_f(state_f, batch)
    out["loss_cont"] = float(np.asarray(m_cont["loss"].addressable_data(0)))
# restore on every host, re-place with FSDP shardings, resume
fresh = TrainState.create(videomae.init_params(jax.random.PRNGKey(2), cfg),
                          tx, jax.random.PRNGKey(3))
restored = load_checkpoint(ck, like={
    "model_state_dict": fresh.params, "opt": fresh.opt_state,
    "step": np.zeros((), np.int32), "rng": saved_rng * 0,
})
state_r = place_state(
    TrainState.create(restored["model_state_dict"], tx,
                      jax.numpy.asarray(restored["rng"])).replace(
        opt_state=restored["opt"],
        step=jax.numpy.asarray(int(restored["step"]), jax.numpy.int32)),
    mesh, "fsdp")
with mesh:
    _, m_res = step_f(state_r, batch)
    out["loss_resumed"] = float(np.asarray(m_res["loss"].addressable_data(0)))

# cross-process mesh-DP embedding extraction with UNEQUAL host slices
# (n=5 -> 3 vs 2 local samples): hosts must stay in collective lockstep
# and each must emit ITS OWN rows of the replicated global output
from bvc_tpu.evalbench.extract import extract_embeddings, untrained_embed_fn
from bvc_tpu.utils.config import ModelConfig

ecfg = ModelConfig(family="jepa", image_size=16, patch_size=8, num_frames=2,
                   tubelet_size=1, hidden_size=16, depth=1, num_heads=2,
                   dtype="float32")


class _EmbDs:
    def __len__(self):
        return 5

    def __getitem__(self, i):
        r = np.random.default_rng(100 + i)
        return r.standard_normal((2, 16, 16, 3)).astype(np.float32), f"v{i}.mp4"


efn = untrained_embed_fn("jepa", ecfg, seed=0, mesh=mesh)
names_e, embs_e = extract_embeddings(efn, _EmbDs(), batch_size=2, mesh=mesh,
                                     num_workers=1)
out["extract_names"] = sorted(names_e)
# ground truth: the same samples through a LOCAL single-device embed
efn_local = untrained_embed_fn("jepa", ecfg, seed=0)
err = 0.0
ds = _EmbDs()
by_name = dict(zip(names_e, embs_e))
for i in range(5):
    clip, nm = ds[i]
    ref = np.asarray(efn_local(clip[None]))[0]
    err = max(err, float(np.max(np.abs(by_name[nm] - ref))))
out["extract_max_err"] = err

# seq-parallel host-feed guard: 2x4 keeps each seq ring inside one
# process (4 local devices) -> allowed; 1x8 spans both -> must raise
from bvc_tpu.parallel.seqpar import require_process_local_seq
require_process_local_seq(make_mesh({"data": 2, "seq": 4}))
out["seq_guard_local_ok"] = True
try:
    require_process_local_seq(make_mesh({"data": 1, "seq": 8}))
    out["seq_guard_cross_raised"] = False
except ValueError:
    out["seq_guard_cross_raised"] = True

# CROSS-PROCESS sequence-parallel extraction: data spans the two hosts,
# each seq ring stays within one (mesh 2x4); embed rows must match a
# local single-device embed (the gather_output=True replicated path)
scfg = ModelConfig(image_size=16, patch_size=8, num_frames=8,
                   tubelet_size=2, hidden_size=16, depth=1, num_heads=2,
                   decoder_hidden_size=16, decoder_depth=1,
                   decoder_num_heads=2, dtype="float32")


class _SeqDs:
    def __len__(self):
        return 5

    def __getitem__(self, i):
        r = np.random.default_rng(200 + i)
        return r.standard_normal((8, 16, 16, 3)).astype(np.float32), f"s{i}.mp4"


seq_mesh = make_mesh({"data": 2, "seq": 4})
sfn = untrained_embed_fn("videomae", scfg, seed=0, mesh=seq_mesh)
names_s, embs_s = extract_embeddings(sfn, _SeqDs(), batch_size=2,
                                     mesh=seq_mesh, num_workers=1)
out["seq_extract_names"] = sorted(names_s)
sfn_local = untrained_embed_fn("videomae", scfg, seed=0)
serr = 0.0
sds = _SeqDs()
s_by_name = dict(zip(names_s, embs_s))
for i in range(5):
    clip, nm = sds[i]
    ref = np.asarray(sfn_local(clip[None]))[0]
    serr = max(serr, float(np.max(np.abs(s_by_name[nm] - ref))))
out["seq_extract_max_err"] = serr

# CROSS-PROCESS pipeline parallelism (VERDICT r4 task 4): the GPipe step
# must reproduce the GSPMD DP step's loss AND updated params in two
# layouts — (a) each pipe ring process-LOCAL (mesh 2x4: data spans the
# hosts, every ppermute hop stays inside one process) and (b) the pipe
# ring CROSSING the process boundary (mesh 1x8: activation hops ride the
# inter-process channel — the DCN case of SCALING.md's worked example).
# Layout (a) also runs grad_accum=2, crossing the accumulation
# composition over processes.
import jax.numpy as jnp
from bvc_tpu.parallel.pipeline import (
    make_pipe_mesh, make_pipe_videomae_train_step, pipe_state_shardings,
)

pcfg = ModelConfig(image_size=16, patch_size=8, num_frames=2, tubelet_size=2,
                   hidden_size=16, depth=8, num_heads=2,
                   decoder_hidden_size=8, decoder_depth=8,
                   decoder_num_heads=2, dtype="float32")
pp_params = videomae.init_params(jax.random.PRNGKey(4), pcfg)
pmask = MaskConfig(mask_ratio=0.75)
# the 4-row global batch, identical on both hosts (deterministic halves)
rows = np.concatenate([
    np.random.default_rng(300 + r).integers(0, 255, (4, 2, 16, 16, 3), np.uint8)
    for r in range(2)
])

ref_state = place_state(TrainState.create(pp_params, tx, jax.random.PRNGKey(5)),
                        mesh)
ref_step = make_videomae_train_step(mesh, pcfg, pmask, tx)
with mesh:
    ref_state, ref_m = ref_step(ref_state, shard_batch(rows[proc_id * 4:
                                                            proc_id * 4 + 4],
                                                       mesh))
out["pipe_ref_loss"] = float(np.asarray(ref_m["loss"].addressable_data(0)))


def replicated_scalar(fn, *trees):
    meshes = [l.sharding.mesh for t in trees
              for l in jax.tree_util.tree_leaves(t)]
    m = meshes[0]
    r = jax.jit(fn, out_shardings=NamedSharding(m, P()))(*trees)
    return float(np.asarray(r.addressable_data(0)))


for name, (d_ax, p_ax, mb, accum) in {
    "pipe_local_ring": (2, 4, 2, 2),
    "pipe_cross_ring": (1, 8, 2, 1),
}.items():
    pmesh = make_pipe_mesh(d_ax, p_ax)
    pstate = TrainState.create(pp_params, tx, jax.random.PRNGKey(5))
    # copy post-placement: device_put aliases the source buffer as one
    # shard, and the donating step would delete pp_params out from under
    # the next layout (same pattern as tests/test_pipeline.py _pipe_state)
    pstate = jax.tree_util.tree_map(
        jnp.copy, jax.device_put(pstate, pipe_state_shardings(pstate, pmesh)))
    pstep = make_pipe_videomae_train_step(pmesh, pcfg, pmask, tx,
                                          num_microbatches=mb,
                                          grad_accum=accum)
    local = rows if d_ax == 1 else rows[proc_id * 4: proc_id * 4 + 4]
    with pmesh:
        pstate, pm = pstep(pstate, shard_batch(local, pmesh))
    out[name + "_loss"] = float(np.asarray(pm["loss"].addressable_data(0)))
    # replicated scalar ||pipe_params - ref_params||_inf across BOTH
    # shardings — GSPMD inserts whatever collectives the comparison needs
    out[name + "_pdiff"] = replicated_scalar(
        lambda a, b: jnp.max(jnp.asarray([
            jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))
            for x, y in zip(jax.tree_util.tree_leaves(a),
                            jax.tree_util.tree_leaves(b))
        ])), pstate.params, ref_state.params)

sync_hosts("test-barrier")
print("RESULT " + json.dumps(out), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_collectives(tmp_path):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), "2", str(port), str(_REPO)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(tmp_path),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=600)
            assert p.returncode == 0, stdout
            line = [l for l in stdout.splitlines() if l.startswith("RESULT ")][-1]
            outs.append(json.loads(line[len("RESULT "):]))
    finally:
        # a failed/hung worker must not orphan its peer (the survivor
        # blocks inside a collective for the full gloo timeout)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait(timeout=30)

    by_rank = {o["process_index"]: o for o in outs}
    assert set(by_rank) == {0, 1}
    for o in outs:
        assert o["process_count"] == 2
        assert o["local_devices"] == 4 and o["global_devices"] == 8
        # the zero-row host did not poison the gather, and both hosts see
        # the same merged result
        assert o["gather_names"] == ["a", "b"]
        assert o["gather_shape"] == [2, 4]
        # mean over (4 rows of 0.0 + 4 rows of 1.0) — the cross-process
        # reduction really mixed both hosts' shards
        assert abs(o["global_mean"] - 0.5) < 1e-6

    # host slices are disjoint and cover the dataset
    all_idx = by_rank[0]["my_indices"] + by_rank[1]["my_indices"]
    assert sorted(all_idx) == list(range(16))
    assert set(by_rank[0]["my_indices"]).isdisjoint(by_rank[1]["my_indices"])

    # the SPMD train step produced the SAME finite global loss on both
    # processes (replicated metrics out of a cross-process reduction),
    # and training progressed
    l0, l1 = by_rank[0]["step_losses"], by_rank[1]["step_losses"]
    assert l0 == l1
    assert all(x == x and abs(x) < 1e6 for x in l0)  # finite
    assert l0[1] != l0[0]  # params actually updated

    # cross-process grad accumulation == single-shot (same masks)
    for o in outs:
        assert o["accum_loss"] == pytest.approx(o["single_loss"], rel=1e-5)
    assert by_rank[0]["accum_loss"] == by_rank[1]["accum_loss"]

    # FSDP checkpoint cycle: the saved state really had non-addressable
    # shards (host-0-only np.asarray would have thrown), the save
    # completed (meta written post-swap), and the restored state resumed
    # to the exact same loss as the uninterrupted run on both hosts
    for o in outs:
        assert o["fsdp_nonaddressable"] is True
        assert o["ckpt_meta_exists"] is True
        assert o["loss_resumed"] == pytest.approx(o["loss_cont"], abs=1e-6)
    assert by_rank[0]["loss_cont"] == by_rank[1]["loss_cont"]

    # cross-process extraction: every sample present exactly once on both
    # hosts, and each embedding matches the single-device ground truth
    # (host 1 emitting host 0's rows would blow extract_max_err up)
    for o in outs:
        assert o["extract_names"] == [f"v{i}.mp4" for i in range(5)]
        assert o["extract_max_err"] < 1e-4, o["extract_max_err"]
        # seq-parallel host-feed guard (parallel/seqpar.py)
        assert o["seq_guard_local_ok"] is True
        assert o["seq_guard_cross_raised"] is True
        # cross-process seq-parallel extraction: complete and correct
        assert o["seq_extract_names"] == [f"s{i}.mp4" for i in range(5)]
        assert o["seq_extract_max_err"] < 1e-4, o["seq_extract_max_err"]
        # cross-process pipeline parallelism: both ring layouts (process-
        # local hops and hops crossing the process boundary) reproduce
        # the GSPMD DP step's loss and updated params
        for layout in ("pipe_local_ring", "pipe_cross_ring"):
            assert o[layout + "_loss"] == pytest.approx(
                o["pipe_ref_loss"], abs=2e-5), layout
            assert o[layout + "_pdiff"] < 2e-5, (layout, o[layout + "_pdiff"])
    assert by_rank[0]["pipe_ref_loss"] == by_rank[1]["pipe_ref_loss"]
