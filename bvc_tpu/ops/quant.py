"""W8A8 dynamic-quantized dense for the inference/extraction path.

The v5e MXU runs int8 x int8 -> int32 at twice its bf16 MAC rate
(394 TOPS vs 197 TFLOP/s).  Embedding extraction — the reference's
no-grad DDP loop, ``benchmarks/compute_embeddings_videomae.py:253-264``
— is a forward-only, dense-dominated workload (~75% of the ViT-B
encoder's FLOPs at 1568 tokens are the four block matmuls), so it can
ride that rate with:

- **per-output-channel symmetric weight quant** done ONCE at load time
  (:func:`quantize_linear` / :func:`quantize_blocks`): scale_j =
  max|K[:, j]| / 127, kernel stored as int8;
- **per-token dynamic activation quant** in-step inside
  :func:`qdense`: scale_t = max|x[t, :]| / 127 — one VPU pass over the
  dense's INPUT (measured on-chip in ``tools/probe_int8.py`` /
  ``probe_quant_block.py``: quant+dot+dequant = 1.46x a bf16 dense at
  the qkv shape, but a LOSS for narrowing matmuls whose input is wide —
  hence :data:`EXPANSION_MATMULS` is the default selection);
- **int32 accumulation** on the MXU, dequantized by the rank-1 outer
  product of the two scale vectors, bias added in f32.

This is an OPT-IN inference path (``compute_embeddings --quantize
int8``): training and the default extraction stay bf16/f32 for
reference parity.  Accuracy at ViT-B extraction depth is pinned by
``tests/test_quant.py`` (per-dense relative error, embedding cosine,
and end-to-end kNN-score parity vs the bf16 path).

LayerNorm, GELU, softmax/attention, biases, and residuals all stay in
the regular bf16/f32 path — only the selected block matmuls quantize
(default: the expansion pair qkv + fc1, the measured winners; see
``EXPANSION_MATMULS``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# symmetric int8: the MXU-friendly range; -128 is excluded so the
# quantizer is sign-symmetric and |dequant| <= 127 * scale exactly
_QMAX = 127.0


def quantize_linear(p: dict) -> dict:
    """Quantize one linear-layer param dict ``{kernel[, bias]}``.

    ``kernel`` may be unstacked ``[Din, Dout]`` or scan-stacked
    ``[L, Din, Dout]``; the scale is per-output-channel (and per-layer
    for stacked kernels): ``scale[..., j] = max_i |K[..., i, j]| / 127``.
    Returns ``{"kernel_q": int8, "scale": f32[..., Dout][, "bias"]}`` —
    the ``kernel_q`` key is what :func:`bvc_tpu.models.vit._dense`
    dispatches on.
    """
    k = jnp.asarray(p["kernel"], jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=-2)  # reduce Din, keep (layer,) Dout
    scale = jnp.maximum(amax, 1e-12) / _QMAX
    kq = jnp.clip(jnp.round(k / scale[..., None, :]), -_QMAX, _QMAX)
    out = {"kernel_q": kq.astype(jnp.int8), "scale": scale}
    if "bias" in p:
        out["bias"] = jnp.asarray(p["bias"], jnp.float32)
    return out


# Which block matmuls actually WIN from W8A8 on the v5e, measured at the
# extraction shape [64, 1568, 768] (tools/probe_quant_block.py): the
# dynamic per-token quant pass costs ~proportional to the dense's INPUT
# width, so only the expansion matmuls come out ahead —
#   qkv (768->2304)  1.46x    proj (768->768)   0.78x
#   fc1 (768->3072)  1.30x    fc2 (3072->768)   0.68x  (4x-wide input)
# Default = the winners; "all" exists for probes/ablation.
EXPANSION_MATMULS: tuple[str, ...] = ("attn.qkv", "mlp.fc1")
ALL_MATMULS: tuple[str, ...] = ("attn.qkv", "attn.proj", "mlp.fc1", "mlp.fc2")


def quantize_blocks(stacked: dict,
                    layers: tuple[str, ...] = EXPANSION_MATMULS) -> dict:
    """Quantize selected matmuls of a (stacked) transformer block tree
    produced by :func:`bvc_tpu.models.vit.init_blocks`; LayerNorm params
    and unselected matmuls pass through untouched.  ``layers`` entries
    are dotted paths from :data:`ALL_MATMULS`."""
    unknown = set(layers) - set(ALL_MATMULS)
    if unknown:
        raise ValueError(f"unknown block matmuls {sorted(unknown)}; "
                         f"valid: {ALL_MATMULS}")

    def pick(path: str, p: dict) -> dict:
        return quantize_linear(p) if path in layers else p

    return {
        "ln1": stacked["ln1"],
        "ln2": stacked["ln2"],
        "attn": {
            "qkv": pick("attn.qkv", stacked["attn"]["qkv"]),
            "proj": pick("attn.proj", stacked["attn"]["proj"]),
        },
        "mlp": {
            "fc1": pick("mlp.fc1", stacked["mlp"]["fc1"]),
            "fc2": pick("mlp.fc2", stacked["mlp"]["fc2"]),
        },
    }


def quantize_encoder_tree(params: dict,
                          block_keys: tuple[str, ...] = ("encoder",),
                          layers: tuple[str, ...] = EXPANSION_MATMULS) -> dict:
    """Copy ``params`` with the named stacked-block subtrees quantized
    (VideoMAE keeps its blocks under ``'encoder'``, JEPA under
    ``'blocks'``); everything else (patch embed, position tables, heads)
    stays f32 — their FLOPs are negligible and the patch-embed feed is
    uint8-sourced already."""
    out = dict(params)
    for key in block_keys:
        out[key] = quantize_blocks(params[key], layers)
    return out


def qdense(x: jnp.ndarray, p: dict, dtype: Any) -> jnp.ndarray:
    """W8A8 dense: dynamic per-token activation quant, int8 MXU dot
    with int32 accumulation, rank-1 dequant, f32 bias, cast to
    ``dtype``.  Drop-in for ``_dense(x, p, dtype)`` when ``p`` came
    from :func:`quantize_linear`."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xscale = jnp.maximum(amax, 1e-12) / _QMAX
    xq = jnp.clip(jnp.round(xf / xscale), -_QMAX, _QMAX).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, p["kernel_q"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xscale * p["scale"]
    if "bias" in p:
        out = out + p["bias"]
    return out.astype(dtype)


def is_quantized(p: dict) -> bool:
    return "kernel_q" in p
