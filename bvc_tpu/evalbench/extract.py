"""Embedding extraction over benchmark datasets.

End-to-end analogue of ``benchmarks/compute_embeddings_{videomae,jepa,simclr}.py``:
load a pretraining checkpoint (or every checkpoint in a directory), run
the family-specific embedding head over the train and test splits of a
benchmark task, gather across hosts, and write
``embeddings_{run_id}.csv`` (sorted by fname, deduped — the exact CSV
contract of ``save_results``, ``compute_embeddings_videomae.py:101-126``;
test split goes under ``savedir/test/``).

Family embedding heads:

- videomae: pooled ``LayerNorm(mean(tokens))`` (classification model with
  ``num_labels=0`` — ``compute_embeddings_videomae.py:78-96``)
- jepa: mean over patch tokens of the target/context encoder
  (``compute_embeddings_jepa.py:242``)
- simclr: ResNet features of the LAST frame only, head stripped
  (``compute_embeddings_simclr.py:227,81``)
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from bvc_tpu.evalbench.datasets import (
    Cifar10Dataset,
    SSv2Dataset,
    ToyboxDataset,
    UCF101Dataset,
    drop_none_collate,
)
from bvc_tpu.parallel import make_mesh, shard_batch
from bvc_tpu.parallel.collectives import all_gather_objects
from bvc_tpu.parallel.sharding import batch_sharding, replicated_sharding
from bvc_tpu.training.checkpoint import load_checkpoint, load_meta
from bvc_tpu.utils.config import ModelConfig, RunId
from bvc_tpu.utils.logging import get_logger, is_main_process


def make_task_dataset(ds_task: str, vid_root: str, frame_rate: int,
                      sample_len: int, train: bool, image_size: int = 224,
                      annotation_path: str = "", fold: int = 1):
    if ds_task == "ssv2":
        return SSv2Dataset(vid_root, frame_rate, sample_len, train, image_size)
    if ds_task in ("toybox", "tb_cat", "tb_trans"):
        return ToyboxDataset(vid_root, frame_rate, sample_len, image_size)
    if ds_task == "ucf101":
        # fold plumbed through like the reference's UCF101(fold=...)
        # (benchmarks/dsdatasets.py:238)
        return UCF101Dataset(vid_root, annotation_path or str(Path(vid_root).parent / "ucfTrainTestlist"),
                             fold=fold, train=train, sample_len=sample_len,
                             frame_rate=frame_rate, image_size=image_size)
    if ds_task == "cifar10":
        return Cifar10Dataset(vid_root, sample_len, train, image_size)
    raise ValueError(f"unknown ds_task {ds_task!r}")


def _jit_embed(core: Callable, params_tree: Any, mesh) -> Callable:
    """Wrap ``core(params_tree, video) → [B, D]`` as ``fn(video_np)``.

    ``mesh=None``: plain single-device jit (params as jit ARGUMENTS:
    closing over them would inline every weight as an MLIR constant —
    catastrophic lowering time + device→host fetches on remote-attached
    TPUs).

    With a mesh: params replicated, batch sharded on ``data``, output
    replicated — local-mesh data parallelism matching the reference's
    4-GPU DDP extraction (``compute_embeddings_videomae.py:214,232-237``)
    where each rank embeds its shard of the batch.
    """
    if mesh is None:
        # commit params to the device ONCE: jit only reuses committed
        # device arrays — host numpy leaves would be re-uploaded on every
        # per-batch call
        placed = jax.device_put(params_tree)
        jfn = jax.jit(core)
        return lambda video: jfn(placed, jnp.asarray(video))
    rep = replicated_sharding(mesh)
    placed = jax.device_put(params_tree, rep)
    jfn = jax.jit(core, in_shardings=(rep, batch_sharding(mesh)),
                  out_shardings=rep)

    def fn(video):
        return jfn(placed, shard_batch(np.asarray(video), mesh))

    return fn


def _is_seq_mesh(mesh) -> bool:
    return mesh is not None and "seq" in getattr(mesh, "axis_names", ())


def _seq_jit_embed(params_tree: Any, mesh, model_cfg: ModelConfig,
                   family: str = "videomae") -> Callable:
    """Sequence-parallel embed over a ``('data','seq')`` mesh — ring
    attention with the TIME axis sharded (``parallel/seqpar.py``), for
    clips whose full-attention activations exceed one chip.  VideoMAE
    (classifier-head pooling) and JEPA (patch-token mean) cores; same
    ``fn(video_np) → [B, D]`` contract as :func:`_jit_embed`'s mesh mode;
    equivalence with the single-device embeds is pinned by
    ``tests/test_seqpar.py``.
    """
    from bvc_tpu.parallel.seqpar import (
        make_seq_embed_fn, make_seq_jepa_embed_fn, require_process_local_seq,
        shard_seq_batch,
    )

    require_process_local_seq(mesh)
    multi = jax.process_count() > 1
    # multi-host: shard_seq_batch contributes each process's local rows
    # via the process-local placement path, and gather_output returns the
    # global rows replicated so every host can materialise them;
    # extract_embeddings then slices out this host's segment.
    maker = make_seq_jepa_embed_fn if family == "jepa" else make_seq_embed_fn
    core = maker(mesh, model_cfg, gather_output=multi)
    placed = jax.device_put(params_tree, replicated_sharding(mesh))

    def fn(video):
        return core(placed, shard_seq_batch(np.asarray(video), mesh))

    return fn


def _require_videomae_for_seq(family: str, mesh) -> None:
    if _is_seq_mesh(mesh) and family not in ("videomae", "jepa"):
        raise ValueError(
            "sequence-parallel extraction supports videomae and jepa "
            f"(simclr embeds ONE frame — there is no sequence axis to "
            f"shard; got family={family!r} on a 'seq' mesh). Use a "
            "pure-data mesh for simclr."
        )


def _check_quantize(family: str, mesh, quantize: str) -> bool:
    """Validate the ``quantize`` option; returns True for the int8 path.

    int8 is an opt-in W8A8 inference path (``ops/quant.py``) for the
    transformer families on single-device or data meshes: SimCLR's
    conv trunk and the sequence-parallel ring (which re-slices block
    params inside its own shard_map core) are rejected explicitly
    rather than silently falling back to bf16.
    """
    if quantize in ("none", "", None):
        return False
    if quantize != "int8":
        raise ValueError(f"unknown quantize mode {quantize!r} "
                         "(expected 'none' or 'int8')")
    if family == "simclr":
        raise ValueError("quantize='int8' covers the ViT families "
                         "(videomae, jepa); the resnet conv trunk is "
                         "not quantized")
    if _is_seq_mesh(mesh):
        raise ValueError("quantize='int8' does not compose with "
                         "sequence-parallel extraction; use a pure-data "
                         "mesh")
    return True


def _quantized(params: dict, family: str) -> dict:
    from bvc_tpu.ops.quant import quantize_encoder_tree

    key = "encoder" if family == "videomae" else "blocks"
    return quantize_encoder_tree(params, (key,))


def _feature_dim(family: str, model_cfg: ModelConfig) -> int:
    """Embedding width of a family's extractor — lets an all-empty sweep
    still report a correctly-shaped ``(0, D)`` result."""
    if family == "simclr":
        from bvc_tpu.models import resnet

        return resnet.feature_dim(model_cfg.architecture or "resnet18")
    return model_cfg.hidden_size


def _with_dim(fn: Callable, family: str, model_cfg: ModelConfig) -> Callable:
    fn.feature_dim = _feature_dim(family, model_cfg)
    return fn


def load_family_params(family: str, ckpt_path: str) -> Any:
    """Checkpoint → the param tree the family's embed fn consumes.

    One source of truth for the per-family checkpoint-key quirks, shared
    by :func:`make_embed_fn` and the serving exporter
    (:mod:`bvc_tpu.serving`): videomae embeds from ``model_state_dict``;
    JEPA from the ONLINE encoder — the reference's ``get_model`` calls
    ``load_checkpoint(encoder=..., target_encoder=None)``, loading
    ``checkpoint['encoder']`` (``compute_embeddings_jepa.py:87-89``,
    ``helper.py:36-38``), the EMA target is never used for embeddings;
    SimCLR needs conv params AND batch stats.
    """
    restored = load_checkpoint(ckpt_path)
    if family == "videomae":
        return jax.tree_util.tree_map(np.asarray, restored["model_state_dict"])
    if family == "jepa":
        enc = restored.get("encoder", restored.get("target_encoder"))
        return jax.tree_util.tree_map(np.asarray, enc)
    if family == "simclr":
        return jax.tree_util.tree_map(
            np.asarray,
            {"params": restored["model_state_dict"],
             "stats": restored["batch_stats"]},
        )
    raise ValueError(f"unknown family {family!r}")


def make_embed_fn(family: str, ckpt_path: str, model_cfg: ModelConfig,
                  mesh=None, quantize: str = "none") -> Callable:
    """Load the checkpoint and return ``fn(video_batch) → [B, D]``,
    optionally data-parallel over ``mesh`` (see :func:`_jit_embed`);
    ``fn.feature_dim`` carries the embedding width.  ``quantize='int8'``
    rides the W8A8 MXU path (see :func:`_check_quantize`)."""
    _require_videomae_for_seq(family, mesh)
    q = _check_quantize(family, mesh, quantize)
    if family == "videomae":
        from bvc_tpu.models import videomae

        params = load_family_params(family, ckpt_path)
        if q:
            params = _quantized(params, family)
        if _is_seq_mesh(mesh):
            return _with_dim(_seq_jit_embed(params, mesh, model_cfg),
                             family, model_cfg)
        return _with_dim(_jit_embed(
            lambda prm, video: videomae.embed(prm, video, model_cfg),
            params, mesh,
        ), family, model_cfg)
    if family == "jepa":
        from bvc_tpu.models import jepa as jepa_model

        enc = load_family_params(family, ckpt_path)
        if q:
            enc = _quantized(enc, family)
        if _is_seq_mesh(mesh):
            return _with_dim(
                _seq_jit_embed(enc, mesh, model_cfg, family="jepa"),
                family, model_cfg)
        return _with_dim(_jit_embed(
            lambda prm, video: jepa_model.embed(prm, video, model_cfg),
            enc, mesh,
        ), family, model_cfg)
    if family == "simclr":
        from bvc_tpu.models import resnet

        arch = model_cfg.architecture or "resnet18"

        def _embed(tree, video):
            # last frame only (compute_embeddings_simclr.py:227)
            feats, _ = resnet.apply(
                tree["params"], tree["stats"], video[:, -1], arch,
                training=False, with_head=False,
            )
            return feats

        tree = load_family_params(family, ckpt_path)
        return _with_dim(_jit_embed(_embed, tree, mesh), family, model_cfg)
    raise ValueError(f"unknown family {family!r}")


def untrained_embed_fn(family: str, model_cfg: ModelConfig, seed: int = 0,
                       mesh=None, quantize: str = "none") -> Callable:
    """Random-init model — the stage-0 'untrained baseline' path
    (``init_checkpoint_path='na'``, ``slurm_dev_def.bash:80-87``)."""
    _require_videomae_for_seq(family, mesh)
    q = _check_quantize(family, mesh, quantize)
    if family == "videomae":
        from bvc_tpu.models import videomae

        params = videomae.init_params(jax.random.PRNGKey(seed), model_cfg)
        if q:
            params = _quantized(params, family)
        if _is_seq_mesh(mesh):
            return _with_dim(_seq_jit_embed(params, mesh, model_cfg),
                             family, model_cfg)
        return _with_dim(_jit_embed(
            lambda prm, v: videomae.embed(prm, v, model_cfg), params, mesh
        ), family, model_cfg)
    if family == "jepa":
        from bvc_tpu.models import jepa as jepa_model

        params = jepa_model.init_encoder_params(jax.random.PRNGKey(seed), model_cfg)
        if q:
            params = _quantized(params, family)
        if _is_seq_mesh(mesh):
            return _with_dim(
                _seq_jit_embed(params, mesh, model_cfg, family="jepa"),
                family, model_cfg)
        return _with_dim(_jit_embed(
            lambda prm, v: jepa_model.embed(prm, v, model_cfg), params, mesh
        ), family, model_cfg)
    if family == "simclr":
        from bvc_tpu.models import resnet

        arch = model_cfg.architecture or "resnet18"
        params, stats = resnet.init_params(jax.random.PRNGKey(seed), arch)
        return _with_dim(_jit_embed(
            lambda tree, v: resnet.apply(tree["params"], tree["stats"], v[:, -1],
                                         arch, training=False, with_head=False)[0],
            {"params": params, "stats": stats}, mesh,
        ), family, model_cfg)
    raise ValueError(family)


def save_results(fnames: list[str], embeddings: np.ndarray, phase: str,
                 run_id: str, savedir: str) -> str:
    """CSV contract of the reference ``save_results``."""
    hdim = embeddings.shape[1]
    df = pd.DataFrame(embeddings, columns=[f"dim{i}" for i in range(hdim)])
    df["fnames"] = fnames
    df = df[["fnames"] + [f"dim{i}" for i in range(hdim)]]
    df = df.sort_values("fnames")
    df = df.drop_duplicates(subset="fnames", ignore_index=True)
    out_dir = Path(savedir) / ("test" if phase == "test" else "")
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"embeddings_{run_id}.csv"
    df.to_csv(path, sep=",", float_format="%.6f", index=False)
    return str(path)


def extract_embeddings(
    embed_fn: Callable,
    dataset,
    batch_size: int = 64,
    mesh=None,
    num_workers: int = 6,
) -> tuple[list[str], np.ndarray]:
    """Run ``embed_fn`` over the whole dataset, multi-host aware.

    Within a host the batch rides whatever placement ``embed_fn`` was
    built with (mesh-DP when it came from ``make_embed_fn(..., mesh=)``);
    across hosts samples are strided-sliced and object-gathered.
    """
    mesh = mesh or make_mesh()
    logger = get_logger("bvc_tpu.extract")
    import concurrent.futures as cf

    # batch shapes: full batches ride one compiled shape (batch_size
    # rounded up so every 'data' shard gets equal rows).  SINGLE-host
    # runs additionally pad a short batch only to the next shard
    # multiple — embedding duplicate pad rows up to the full batch would
    # waste compute, and the occasional extra compiled shape is cheaper
    # (persistent compile cache) than re-embedding up to batch_size-1
    # clips per task.  Multi-host runs must NOT do this: every process
    # has to present the same global batch shape to the jitted embed, and
    # hosts reach their short batch at different sample counts — so they
    # always pad to the full padded_size.
    data_size = mesh.shape.get("data", 1)
    padded_size = -(-batch_size // data_size) * data_size
    uniform_shapes = jax.process_count() > 1
    fnames: list[str] = []
    embs: list[np.ndarray] = []
    n = len(dataset)
    idxs = list(range(n))
    # host slicing for multi-host runs
    n_proc, i_proc = jax.process_count(), jax.process_index()
    idxs = idxs[i_proc::n_proc]

    # multi-host: a mesh-DP embed_fn executes cross-process collectives,
    # so EVERY process must make the same number of embed calls with the
    # same shapes.  The strided host slices differ by up to one sample,
    # so the iteration count is derived from the GLOBAL n (identical on
    # all hosts) and a host whose chunk came up empty (exhausted slice /
    # all samples unreadable) participates with a dummy batch and
    # contributes zero rows.
    if uniform_shapes:
        per_host_max = -(-n // n_proc)  # the largest host slice
        n_iters = -(-per_host_max // batch_size) if n else 0
    else:
        n_iters = -(-len(idxs) // batch_size) if idxs else 0

    def _shape_hint():
        # any host can read global samples just to learn the clip shape;
        # scan past unreadable ones (readers return (None, None))
        for i in range(min(n, 16)):
            s = dataset[i]
            clip = s[0] if isinstance(s, tuple) else s
            if clip is not None:
                return np.asarray(clip).shape
        raise RuntimeError(
            "no readable sample in the first 16 — cannot build the "
            "lockstep dummy batch for multi-host extraction"
        )

    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        for it in range(n_iters):
            chunk = idxs[it * batch_size : (it + 1) * batch_size]
            samples = list(pool.map(lambda i: dataset[i], chunk))
            clips, names = drop_none_collate(samples)
            if len(names) == 0:
                if not uniform_shapes:
                    continue
                # keep the collective in lockstep with a dummy batch
                clips = np.zeros((padded_size, *_shape_hint()), np.float32)
            # short batches pad to the next shard multiple (single-host)
            # or the full compiled shape (multi-host, see above)
            if uniform_shapes or clips.shape[0] >= padded_size:
                target = padded_size
            else:
                target = -(-clips.shape[0] // data_size) * data_size
            pad = target - clips.shape[0]
            if pad:
                clips = np.concatenate([clips, np.repeat(clips[-1:], pad, 0)])
            out = np.asarray(embed_fn(clips))
            if out.shape[0] != clips.shape[0]:
                # multi-process mesh embed: the replicated output covers
                # the GLOBAL batch (every host's slice concatenated along
                # 'data' in process order) — take this host's segment,
                # not the head rows (which belong to host 0)
                start = i_proc * clips.shape[0]
                out = out[start : start + clips.shape[0]]
            out = out[: len(names)]
            fnames += list(names)
            embs.append(out.astype(np.float32))
    local = {
        "fnames": fnames,
        "embeddings": np.concatenate(embs) if embs
        else np.zeros((0, getattr(embed_fn, "feature_dim", 1)), np.float32),
    }
    gathered = all_gather_objects(local)
    return merge_gathered(gathered)


def merge_gathered(gathered) -> tuple[list[str], np.ndarray]:
    """Merge per-host ``{'fnames', 'embeddings'}`` dicts.

    A host with zero rows contributes a ``(0, 1)`` placeholder (or a
    ``(0, D)`` one when it ran dummy lockstep batches) whose feature dim
    may not match the real hosts' ``(B, D)`` arrays — concatenating the
    mix would raise, so empty blocks are dropped when any host produced
    rows.  When every host is empty, the widest placeholder dim is
    kept."""
    all_names: list[str] = []
    all_embs: list[np.ndarray] = []
    for d in gathered:
        all_names += list(d["fnames"])
        all_embs.append(np.asarray(d["embeddings"]))
    non_empty = [e for e in all_embs if e.shape[0]]
    if non_empty:
        return all_names, np.concatenate(non_empty)
    dim = max((e.shape[1] for e in all_embs), default=1)
    return all_names, np.zeros((0, dim), np.float32)


def run_id_from_checkpoint(fp: str) -> str:
    name = Path(fp).name
    for pre in ("model_",):
        if name.startswith(pre):
            name = name[len(pre):]
    for suf in (".pth.tar", ".ckpt"):
        if name.endswith(suf):
            name = name[: -len(suf)]
    return name
