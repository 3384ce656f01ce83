"""Serving export: freeze a family's embedding function to a portable
artifact — serialized StableHLO (``jax.export``) + flat param arrays.

The reference has no deployment story: serving its models means
shipping the full training repo and rebuilding the torch module around
a ``.pth.tar`` (``benchmarks/compute_embeddings_videomae.py:60-101``).
Here the extraction forward (the no-grad hot loop,
``compute_embeddings_videomae.py:253-264``) is exported ONCE to a
self-describing artifact directory that any JAX runtime can execute
WITHOUT bvc_tpu model code:

- ``module.jaxexport`` — the serialized exported computation
  (StableHLO + calling convention), batch-POLYMORPHIC by default so one
  artifact serves every batch size;
- ``params.npz`` — the frozen leaves in flatten order (the module's
  signature takes the leaf list, so no pytree structure is needed at
  load time);
- ``meta.json`` — family, model dims, feature dim, quantize mode, input
  signature.

The exported computation embeds everything the extractor embeds:
uint8→normalized conversion (``normalize_on_device`` — clients ship raw
uint8 frames, 4x less wire traffic than f32), the family's pooling
quirks, and optionally the W8A8 int8 path (``ops/quant.py``) frozen
into the weights.

Platform note: the artifact is compiled for the platform(s) it was
lowered for (``platforms=``).  The ViT families' attention routes to
the Pallas flash kernels when TRACED on TPU (``ops/attention.py``
'auto'), which do not lower for CPU — export on (or for) the platform
you deploy to, or pass ``platforms=('cpu',)`` to force the pure-XLA
path everywhere.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Sequence

import numpy as np

_MODULE = "module.jaxexport"
_PARAMS = "params.npz"
_META = "meta.json"


def _embed_core(family: str, model_cfg) -> Callable:
    """``core(params, video) → [b, D]`` for one family — the same math
    the extractor jits (``evalbench/extract.py``)."""
    if family == "videomae":
        from bvc_tpu.models import videomae

        return lambda prm, video: videomae.embed(prm, video, model_cfg)
    if family == "jepa":
        from bvc_tpu.models import jepa

        return lambda prm, video: jepa.embed(prm, video, model_cfg)
    if family == "simclr":
        from bvc_tpu.models import resnet
        from bvc_tpu.models.videomae import normalize_on_device

        arch = model_cfg.architecture or "resnet18"

        def core(tree, video):
            # last frame only (compute_embeddings_simclr.py:227); the
            # live extractor normalizes in the host transform — here it
            # fuses on device, same numerics (bench_extract.py does the
            # same for its simclr arm)
            feats, _ = resnet.apply(
                tree["params"], tree["stats"],
                normalize_on_device(video[:, -1]), arch,
                training=False, with_head=False)
            return feats

        return core
    raise ValueError(f"unknown family {family!r}")


def _feature_dim(family: str, model_cfg) -> int:
    from bvc_tpu.evalbench.extract import _feature_dim as dim

    return dim(family, model_cfg)


def export_embed(family: str, params: Any, model_cfg, quantize: str = "none",
                 batch: int | None = None,
                 platforms: Sequence[str] | None = None):
    """Export the family's embed fn over frozen ``params``.

    Returns ``(exported, leaves, meta)`` — the ``jax.export.Exported``,
    the flat param leaves (np arrays, flatten order = call order), and
    the metadata dict.  ``batch=None`` exports a symbolic batch
    dimension (one artifact, any batch size); an int pins it.
    ``quantize='int8'`` freezes the W8A8 expansion-matmul weights into
    the artifact (ViT families only, same path as
    ``compute_embeddings --quantize int8``).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if quantize not in ("none", "int8"):
        raise ValueError(f"unknown quantize mode {quantize!r}")
    if quantize == "int8":
        if family == "simclr":
            raise ValueError("quantize='int8' covers the ViT families")
        from bvc_tpu.ops.quant import quantize_encoder_tree

        key = "encoder" if family == "videomae" else "blocks"
        params = quantize_encoder_tree(params, (key,))

    core = _embed_core(family, model_cfg)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [np.asarray(l) for l in leaves]

    def core_flat(leaf_list, video):
        return core(jax.tree_util.tree_unflatten(treedef, leaf_list), video)

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    vshape = (b, model_cfg.num_frames, model_cfg.image_size,
              model_cfg.image_size, 3)
    leaf_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]
    video_spec = jax.ShapeDtypeStruct(vshape, jnp.uint8)
    kwargs: dict = {} if platforms is None else {"platforms": tuple(platforms)}
    # traced on TPU, long-sequence attention routes to the Pallas flash
    # kernels (ops/attention.py 'auto'), which lower to tpu_custom_call —
    # not on jax.export's forward-compatibility allowlist.  Allowing it
    # pins the artifact to a compatible libtpu (the usual serving deal
    # for hand-written kernels); CPU-traced artifacts carry no custom
    # calls and skip this.
    kwargs["disabled_checks"] = [
        jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        jexport.DisabledSafetyCheck.custom_call("Sharding"),
    ]
    exported = jexport.export(jax.jit(core_flat), **kwargs)(
        leaf_specs, video_spec)
    meta = {
        "family": family,
        "feature_dim": _feature_dim(family, model_cfg),
        "quantize": quantize,
        "batch": "polymorphic" if batch is None else int(batch),
        "num_frames": model_cfg.num_frames,
        "image_size": model_cfg.image_size,
        "tubelet_size": model_cfg.tubelet_size,
        "architecture": model_cfg.architecture,
        "input": "uint8 [b, num_frames, image_size, image_size, 3] "
                 "(raw frames; normalization is inside the module)",
        "platforms": list(exported.platforms),
        "n_leaves": len(leaves),
    }
    return exported, leaves, meta


def save_artifact(out_dir: str, exported, leaves: list, meta: dict) -> str:
    """Write the artifact directory; returns its path."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / _MODULE).write_bytes(exported.serialize())
    np.savez(out / _PARAMS, **{f"leaf_{i}": l for i, l in enumerate(leaves)})
    (out / _META).write_text(json.dumps(meta, indent=1))
    return str(out)


def load_artifact(path: str) -> Callable:
    """Artifact directory → ``fn(video_uint8) → np [b, D]``.

    Needs only jax + numpy — no bvc_tpu model code executes; the
    computation (including normalization, pooling, and any frozen int8
    dequant) replays from the serialized module.  ``fn.feature_dim`` and
    ``fn.meta`` carry the sidecar.
    """
    import jax
    from jax import export as jexport

    p = Path(path)
    exported = jexport.deserialize((p / _MODULE).read_bytes())
    with np.load(p / _PARAMS) as z:
        leaves = [z[f"leaf_{i}"] for i in range(len(z.files))]
    meta = json.loads((p / _META).read_text())
    # serving hygiene: params committed to the device ONCE (numpy leaves
    # would re-upload every call — 221 MB/call for ViT-B over a remote
    # link), and the exported call jitted so repeat calls are compiled
    # dispatches, not re-traces (measured at live-extractor rate on the
    # chip, PERFORMANCE.md)
    placed = jax.device_put(leaves)
    jfn = jax.jit(exported.call)

    def fn(video) -> np.ndarray:
        return np.asarray(jfn(placed, np.asarray(video, np.uint8)))

    fn.feature_dim = meta["feature_dim"]  # type: ignore[attr-defined]
    fn.meta = meta  # type: ignore[attr-defined]
    return fn
