"""Torch/HF checkpoint interop.

The reference stores torch state dicts (``model_{run_id}.pth.tar``); the
SURVEY's fidelity target is that checkpoints and embeddings survive the
move (§5 checkpoint/resume: "a state-dict-compatible export for embedding
fidelity checks").  This module converts between HF
``VideoMAEForPreTraining`` state dicts and our functional parameter
pytrees, in both directions, without importing torch at module load.

Layout mapping highlights:

- HF ``patch_embeddings.projection`` is ``Conv3d [D, C, ts, p, p]``; ours
  is a dense ``[C*ts*p*p, D]`` with flat order (c, dt, dh, dw) — a pure
  reshape+transpose.
- torch ``nn.Linear`` weights are ``[out, in]``; ours are ``[in, out]``.
- our transformer blocks are STACKED along a leading depth axis; HF
  stores per-layer ``encoder.layer.{i}`` entries.  HF splits qkv into
  separate q/k/v Linears with a quirk: k has NO bias (``qkv_bias`` adds
  bias only to q and v); our fused qkv bias therefore gets zeros in the
  k third when importing, and exports drop the k-bias third.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32).T


def _stack(layers: list[dict]) -> dict:
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *layers)


def _block_from_hf(sd: dict, prefix: str, dim: int) -> dict:
    """One encoder/decoder block from HF VideoMAELayer names."""
    g = lambda k: np.asarray(sd[prefix + k], dtype=np.float32)
    q_w, k_w, v_w = (
        g("attention.attention.query.weight"),
        g("attention.attention.key.weight"),
        g("attention.attention.value.weight"),
    )
    qkv_w = np.concatenate([q_w, k_w, v_w], axis=0).T  # [D, 3D]
    q_b = g("attention.attention.q_bias")
    v_b = g("attention.attention.v_bias")
    qkv_b = np.concatenate([q_b, np.zeros_like(q_b), v_b])
    return {
        "ln1": {"scale": g("layernorm_before.weight"), "bias": g("layernorm_before.bias")},
        "attn": {
            "qkv": {"kernel": qkv_w, "bias": qkv_b},
            "proj": {
                "kernel": g("attention.output.dense.weight").T,
                "bias": g("attention.output.dense.bias"),
            },
        },
        "ln2": {"scale": g("layernorm_after.weight"), "bias": g("layernorm_after.bias")},
        "mlp": {
            "fc1": {"kernel": g("intermediate.dense.weight").T, "bias": g("intermediate.dense.bias")},
            "fc2": {"kernel": g("output.dense.weight").T, "bias": g("output.dense.bias")},
        },
    }


def videomae_from_hf_state_dict(sd: dict, depth: int = 12, decoder_depth: int = 4) -> dict:
    """HF ``VideoMAEForPreTraining.state_dict()`` → our params pytree.

    ``sd`` values may be torch tensors or numpy arrays.
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    proj = sd["videomae.embeddings.patch_embeddings.projection.weight"]
    # [D, C, ts, p, p] → flat (c, dt, dh, dw) → [C*ts*p*p, D]
    D = proj.shape[0]
    kernel = proj.reshape(D, -1).T.astype(np.float32)
    params: dict[str, Any] = {
        "patch_embed": {
            "kernel": kernel,
            "bias": np.asarray(
                sd["videomae.embeddings.patch_embeddings.projection.bias"], np.float32
            ),
        },
        "encoder": _stack(
            [
                _block_from_hf(sd, f"videomae.encoder.layer.{i}.", D)
                for i in range(depth)
            ]
        ),
        "enc_to_dec": {"kernel": _t(sd["encoder_to_decoder.weight"])},
        "mask_token": np.asarray(sd["mask_token"], np.float32),
        "decoder": _stack(
            [
                _block_from_hf(sd, f"decoder.decoder_layers.{i}.", 0)
                for i in range(decoder_depth)
            ]
        ),
        "decoder_norm": {
            "scale": np.asarray(sd["decoder.norm.weight"], np.float32),
            "bias": np.asarray(sd["decoder.norm.bias"], np.float32),
        },
        "decoder_head": {
            "kernel": _t(sd["decoder.head.weight"]),
            "bias": np.asarray(sd["decoder.head.bias"], np.float32),
        },
    }
    return params


def videomae_to_hf_state_dict(params: dict, cfg) -> dict:
    """Our params → HF-layout numpy state dict (for torch export)."""
    import jax

    host = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)
    out: dict[str, np.ndarray] = {}
    pe = host["patch_embed"]
    D = pe["kernel"].shape[1]
    out["videomae.embeddings.patch_embeddings.projection.weight"] = (
        pe["kernel"].T.reshape(D, cfg.in_channels, cfg.tubelet_size,
                               cfg.patch_size, cfg.patch_size)
    )
    out["videomae.embeddings.patch_embeddings.projection.bias"] = pe["bias"]

    def put_block(prefix: str, blk: dict, i: int):
        g = lambda tree, *ks: tree[ks[0]] if len(ks) == 1 else g(tree[ks[0]], *ks[1:])
        lay = {k: jax.tree_util.tree_map(lambda x: x[i], v) for k, v in blk.items()}
        qkv_w = lay["attn"]["qkv"]["kernel"].T  # [3D, D]
        d = qkv_w.shape[1]
        out[prefix + "attention.attention.query.weight"] = qkv_w[:d]
        out[prefix + "attention.attention.key.weight"] = qkv_w[d : 2 * d]
        out[prefix + "attention.attention.value.weight"] = qkv_w[2 * d :]
        qkv_b = lay["attn"]["qkv"]["bias"]
        out[prefix + "attention.attention.q_bias"] = qkv_b[:d]
        out[prefix + "attention.attention.v_bias"] = qkv_b[2 * d :]
        out[prefix + "attention.output.dense.weight"] = lay["attn"]["proj"]["kernel"].T
        out[prefix + "attention.output.dense.bias"] = lay["attn"]["proj"]["bias"]
        out[prefix + "layernorm_before.weight"] = lay["ln1"]["scale"]
        out[prefix + "layernorm_before.bias"] = lay["ln1"]["bias"]
        out[prefix + "layernorm_after.weight"] = lay["ln2"]["scale"]
        out[prefix + "layernorm_after.bias"] = lay["ln2"]["bias"]
        out[prefix + "intermediate.dense.weight"] = lay["mlp"]["fc1"]["kernel"].T
        out[prefix + "intermediate.dense.bias"] = lay["mlp"]["fc1"]["bias"]
        out[prefix + "output.dense.weight"] = lay["mlp"]["fc2"]["kernel"].T
        out[prefix + "output.dense.bias"] = lay["mlp"]["fc2"]["bias"]

    depth = host["encoder"]["ln1"]["scale"].shape[0]
    for i in range(depth):
        put_block(f"videomae.encoder.layer.{i}.", host["encoder"], i)
    dec_depth = host["decoder"]["ln1"]["scale"].shape[0]
    for i in range(dec_depth):
        put_block(f"decoder.decoder_layers.{i}.", host["decoder"], i)
    out["encoder_to_decoder.weight"] = host["enc_to_dec"]["kernel"].T
    out["mask_token"] = host["mask_token"]
    out["decoder.norm.weight"] = host["decoder_norm"]["scale"]
    out["decoder.norm.bias"] = host["decoder_norm"]["bias"]
    out["decoder.head.weight"] = host["decoder_head"]["kernel"].T
    out["decoder.head.bias"] = host["decoder_head"]["bias"]
    return out


# ---------------------------------------------------------------------------
# JEPA (reference's from-scratch ViT, pretraining/predictive/vision_transformer.py)
# ---------------------------------------------------------------------------


def _block_from_ref_vit(sd: dict, prefix: str) -> dict:
    """One block from the reference ViT naming (``blocks.{i}.*``):
    fused qkv Linear WITH k-bias (unlike HF), torch [out, in] kernels."""
    g = lambda k: np.asarray(sd[prefix + k], dtype=np.float32)
    return {
        "ln1": {"scale": g("norm1.weight"), "bias": g("norm1.bias")},
        "attn": {
            "qkv": {"kernel": g("attn.qkv.weight").T, "bias": g("attn.qkv.bias")},
            "proj": {"kernel": g("attn.proj.weight").T, "bias": g("attn.proj.bias")},
        },
        "ln2": {"scale": g("norm2.weight"), "bias": g("norm2.bias")},
        "mlp": {
            "fc1": {"kernel": g("mlp.fc1.weight").T, "bias": g("mlp.fc1.bias")},
            "fc2": {"kernel": g("mlp.fc2.weight").T, "bias": g("mlp.fc2.bias")},
        },
    }


def jepa_encoder_from_reference(sd: dict, depth: int = 12) -> dict:
    """Reference ``VisionTransformer.state_dict()`` → our encoder pytree.

    ``pos_embed`` is skipped — it is a frozen buffer we recompute exactly
    (:func:`bvc_tpu.models.posenc.positional_encoding_3d`, golden-tested).
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    proj = sd["patch_embed.proj.weight"]  # [D, C, ts, p, p]
    D = proj.shape[0]
    return {
        "patch_embed": {
            "kernel": proj.reshape(D, -1).T.astype(np.float32),
            "bias": np.asarray(sd["patch_embed.proj.bias"], np.float32),
        },
        "blocks": _stack(
            [_block_from_ref_vit(sd, f"blocks.{i}.") for i in range(depth)]
        ),
        "norm": {
            "scale": np.asarray(sd["norm.weight"], np.float32),
            "bias": np.asarray(sd["norm.bias"], np.float32),
        },
    }


def jepa_predictor_from_reference(sd: dict, depth: int = 6) -> dict:
    """Reference ``VisionTransformerPredictor.state_dict()`` → our
    predictor pytree (``predictor_pos_embed`` buffer skipped, recomputed)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    return {
        "embed": {
            "kernel": _t(sd["predictor_embed.weight"]),
            "bias": np.asarray(sd["predictor_embed.bias"], np.float32),
        },
        "mask_token": np.asarray(sd["mask_token"], np.float32),
        "blocks": _stack(
            [_block_from_ref_vit(sd, f"predictor_blocks.{i}.") for i in range(depth)]
        ),
        "norm": {
            "scale": np.asarray(sd["predictor_norm.weight"], np.float32),
            "bias": np.asarray(sd["predictor_norm.bias"], np.float32),
        },
        "proj": {
            "kernel": _t(sd["predictor_proj.weight"]),
            "bias": np.asarray(sd["predictor_proj.bias"], np.float32),
        },
    }


def _block_to_ref_vit(out: dict, prefix: str, blk: dict, i: int) -> None:
    """Write one stacked-block layer into reference ViT naming (inverse of
    :func:`_block_from_ref_vit`)."""
    import jax

    lay = {k: jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32)[i], v)
           for k, v in blk.items()}
    out[prefix + "norm1.weight"] = lay["ln1"]["scale"]
    out[prefix + "norm1.bias"] = lay["ln1"]["bias"]
    out[prefix + "attn.qkv.weight"] = lay["attn"]["qkv"]["kernel"].T
    out[prefix + "attn.qkv.bias"] = lay["attn"]["qkv"]["bias"]
    out[prefix + "attn.proj.weight"] = lay["attn"]["proj"]["kernel"].T
    out[prefix + "attn.proj.bias"] = lay["attn"]["proj"]["bias"]
    out[prefix + "norm2.weight"] = lay["ln2"]["scale"]
    out[prefix + "norm2.bias"] = lay["ln2"]["bias"]
    out[prefix + "mlp.fc1.weight"] = lay["mlp"]["fc1"]["kernel"].T
    out[prefix + "mlp.fc1.bias"] = lay["mlp"]["fc1"]["bias"]
    out[prefix + "mlp.fc2.weight"] = lay["mlp"]["fc2"]["kernel"].T
    out[prefix + "mlp.fc2.bias"] = lay["mlp"]["fc2"]["bias"]


def jepa_encoder_to_reference(enc_params: dict, cfg) -> dict:
    """Our encoder pytree → reference ``VisionTransformer.state_dict()``
    layout (``pretraining/predictive/vision_transformer.py:293-343``),
    incl. the frozen ``pos_embed`` parameter recomputed from the golden
    :func:`bvc_tpu.models.posenc.positional_encoding_3d` table."""
    import jax

    from bvc_tpu.models.jepa import encoder_pos_table

    host = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), enc_params)
    ke = host["patch_embed"]["kernel"]  # [C*ts*p*p, D]
    D = ke.shape[1]
    out: dict[str, np.ndarray] = {
        "patch_embed.proj.weight": ke.T.reshape(
            D, cfg.in_channels, cfg.tubelet_size, cfg.patch_size, cfg.patch_size
        ),
        "patch_embed.proj.bias": host["patch_embed"]["bias"],
        "pos_embed": encoder_pos_table(cfg)[None],
        "norm.weight": host["norm"]["scale"],
        "norm.bias": host["norm"]["bias"],
    }
    depth = host["blocks"]["ln1"]["scale"].shape[0]
    for i in range(depth):
        _block_to_ref_vit(out, f"blocks.{i}.", host["blocks"], i)
    return out


def jepa_predictor_to_reference(pred_params: dict, cfg) -> dict:
    """Our predictor pytree → reference
    ``VisionTransformerPredictor.state_dict()`` layout (``:421-535``)."""
    import jax

    from bvc_tpu.models.jepa import predictor_pos_table

    host = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), pred_params)
    out: dict[str, np.ndarray] = {
        "predictor_embed.weight": host["embed"]["kernel"].T,
        "predictor_embed.bias": host["embed"]["bias"],
        "mask_token": host["mask_token"],
        "predictor_pos_embed": predictor_pos_table(cfg)[None],
        "predictor_norm.weight": host["norm"]["scale"],
        "predictor_norm.bias": host["norm"]["bias"],
        "predictor_proj.weight": host["proj"]["kernel"].T,
        "predictor_proj.bias": host["proj"]["bias"],
    }
    depth = host["blocks"]["ln1"]["scale"].shape[0]
    for i in range(depth):
        _block_to_ref_vit(out, f"predictor_blocks.{i}.", host["blocks"], i)
    return out


def resnet_to_torch_state_dict(params: dict, stats: dict, arch: str) -> dict:
    """Our ResNet pytree → torchvision state-dict names with the
    reference's ``fc = Sequential(Linear, ReLU, Linear)`` head
    (``contrastive/pretrain_simclr.py:71-84``).

    Conv kernels HWIO → OIHW; BN gets running stats +
    ``num_batches_tracked`` (torch counts batches; we don't track it —
    exported as 0, torchvision ignores it with momentum set)."""
    from bvc_tpu.models.resnet import BLOCKS

    kind, reps = BLOCKS[arch]
    out: dict[str, np.ndarray] = {}

    def conv(name, w):
        out[name + ".weight"] = np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1))

    def bn(name, p, s):
        out[name + ".weight"] = np.asarray(p["scale"], np.float32)
        out[name + ".bias"] = np.asarray(p["bias"], np.float32)
        out[name + ".running_mean"] = np.asarray(s["mean"], np.float32)
        out[name + ".running_var"] = np.asarray(s["var"], np.float32)
        out[name + ".num_batches_tracked"] = np.asarray(0, np.int64)

    conv("conv1", params["stem"]["conv"])
    bn("bn1", params["stem"]["bn"], stats["stem"])
    n_convs = 3 if kind == "bottleneck" else 2
    for s_i in range(len(reps)):
        for b, (bp, bs) in enumerate(zip(params[f"stage{s_i}"], stats[f"stage{s_i}"])):
            pre = f"layer{s_i + 1}.{b}"
            for c in range(1, n_convs + 1):
                conv(f"{pre}.conv{c}", bp[f"conv{c}"])
                bn(f"{pre}.bn{c}", bp[f"bn{c}"], bs[f"bn{c}"])
            if "down_conv" in bp:
                conv(f"{pre}.downsample.0", bp["down_conv"])
                bn(f"{pre}.downsample.1", bp["down_bn"], bs["down_bn"])
    out["fc.0.weight"] = np.asarray(params["head"]["fc1"]["kernel"], np.float32).T
    out["fc.0.bias"] = np.asarray(params["head"]["fc1"]["bias"], np.float32)
    out["fc.2.weight"] = np.asarray(params["head"]["fc2"]["kernel"], np.float32).T
    out["fc.2.bias"] = np.asarray(params["head"]["fc2"]["bias"], np.float32)
    return out


def load_reference_jepa_checkpoint(path: str, depth: int = 12,
                                   pred_depth: int = 6) -> dict:
    """Load a reference JEPA ``model_*.pth.tar``
    (``pretrain_jepa.py:126-142`` format: encoder/predictor/target_encoder
    keys) into our three-model pytrees."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return {
        "encoder": jepa_encoder_from_reference(ckpt["encoder"], depth),
        "predictor": jepa_predictor_from_reference(ckpt["predictor"], pred_depth),
        "target_encoder": jepa_encoder_from_reference(ckpt["target_encoder"], depth),
    }


def load_reference_checkpoint(path: str, depth: int = 12, decoder_depth: int = 4) -> dict:
    """Load a reference ``model_*.pth.tar`` (torch) into our params
    pytree — migration path for users with existing reference
    checkpoints (``generative/pretrain_videomae.py:72-85`` format)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return videomae_from_hf_state_dict(sd, depth, decoder_depth)
