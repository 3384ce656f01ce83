"""Functional ResNet (18/34/50) + SimCLR projection head.

Replaces the reference's torchvision ResNet with the fc swapped for a
2-layer MLP head (``contrastive/pretrain_simclr.py:71-84``,
``_adapt_model_simclr``).  Channels-last NHWC convs (TPU-native layout),
BatchNorm with running stats carried as a separate ``batch_stats``
collection (torch momentum 0.1, eps 1e-5).

Distributed-semantics note: by default the batch statistics are computed
over the *global* (data-sharded) batch — effectively SyncBN — whereas
torch DDP BatchNorm keeps per-replica stats.  Per-replica stats are a
parallelisation artifact, not a modeling choice; global stats are the
cleaner equivalent and match at world_size=1.  ``apply(bn_groups=N)``
opts into the reference's per-rank semantics exactly (see :func:`_bn`).

Reference quirk preserved at the call site: ``get_model`` wires the head
input as ``1*pred_emb_dim`` (``:77``), which only matches resnet18's
512-d features — resnet50 would need 2048.  We use the true feature dim
and note the divergence (the reference would crash for resnet50).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BLOCKS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
}
STAGE_WIDTHS = (64, 128, 256, 512)


def feature_dim(name: str) -> int:
    kind, _ = BLOCKS[name]
    return 512 * (4 if kind == "bottleneck" else 1)


# -- init -------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout):
    # kaiming normal, fan_out, relu (torchvision default)
    fan_out = kh * kw * cout
    std = float(np.sqrt(2.0 / fan_out))
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _bn_init(c):
    return (
        {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)},
        {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)},
    )


def _linear_init(key, cin, cout):
    # torch Linear default: kaiming-uniform bound sqrt(1/cin)
    bound = float(np.sqrt(1.0 / cin))
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k1, (cin, cout), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
    }


def init_params(key, name: str = "resnet18", head_dim: int = 512) -> tuple[dict, dict]:
    """Returns (params, batch_stats)."""
    kind, reps = BLOCKS[name]
    keys = iter(jax.random.split(key, 200))
    params: dict = {}
    stats: dict = {}
    params["stem"] = {"conv": _conv_init(next(keys), 7, 7, 3, 64)}
    params["stem"]["bn"], stats["stem"] = _bn_init(64)

    cin = 64
    expansion = 4 if kind == "bottleneck" else 1
    for s, (width, rep) in enumerate(zip(STAGE_WIDTHS, reps)):
        stage_p, stage_s = [], []
        for b in range(rep):
            stride = 2 if (s > 0 and b == 0) else 1
            bp: dict = {}
            bs: dict = {}
            if kind == "basic":
                bp["conv1"] = _conv_init(next(keys), 3, 3, cin, width)
                bp["bn1"], bs["bn1"] = _bn_init(width)
                bp["conv2"] = _conv_init(next(keys), 3, 3, width, width)
                bp["bn2"], bs["bn2"] = _bn_init(width)
                cout = width
            else:
                bp["conv1"] = _conv_init(next(keys), 1, 1, cin, width)
                bp["bn1"], bs["bn1"] = _bn_init(width)
                bp["conv2"] = _conv_init(next(keys), 3, 3, width, width)
                bp["bn2"], bs["bn2"] = _bn_init(width)
                bp["conv3"] = _conv_init(next(keys), 1, 1, width, width * 4)
                bp["bn3"], bs["bn3"] = _bn_init(width * 4)
                cout = width * 4
            if b == 0 and (stride != 1 or cin != cout):
                bp["down_conv"] = _conv_init(next(keys), 1, 1, cin, cout)
                bp["down_bn"], bs["down_bn"] = _bn_init(cout)
            stage_p.append(bp)
            stage_s.append(bs)
            cin = cout
        params[f"stage{s}"] = stage_p
        stats[f"stage{s}"] = stage_s

    fdim = feature_dim(name)
    params["head"] = {
        "fc1": _linear_init(next(keys), fdim, head_dim),
        "fc2": _linear_init(next(keys), head_dim, head_dim),
    }
    return params, stats


# -- forward ----------------------------------------------------------------


def _conv(x, w, stride=1):
    # explicit symmetric padding (torch semantics): SAME pads
    # asymmetrically for stride-2 convs, shifting the sampling grid a
    # half pixel vs torchvision
    kh, kw = w.shape[0], w.shape[1]
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x, p, s, training: bool, momentum=0.1, eps=1e-5, groups: int = 1):
    """Returns (y, new_stats).

    ``groups > 1``: per-replica BatchNorm — batch statistics are computed
    independently over each of ``groups`` contiguous batch chunks (chunk
    boundary == shard boundary, so under SPMD each chunk's stats stay
    device-local, exactly the reference's per-rank DDP BatchNorm without
    SyncBN).  Running stats follow group 0, mirroring torch DDP's
    ``broadcast_buffers=True`` which overwrites every rank's buffers with
    rank 0's each forward.  ``groups == 1`` is global-batch (SyncBN)
    semantics — identical to the reference at world_size 1.
    """
    if training:
        xf = x.astype(jnp.float32)
        if groups > 1:
            B = x.shape[0]
            g = xf.reshape(groups, B // groups, *x.shape[1:])
            mean_g = jnp.mean(g, axis=(1, 2, 3))            # [G, C]
            var_g = jnp.var(g, axis=(1, 2, 3))              # [G, C]
            n = (B // groups) * x.shape[1] * x.shape[2]
            mean = jnp.repeat(mean_g, B // groups, axis=0)[:, None, None, :]
            var = jnp.repeat(var_g, B // groups, axis=0)[:, None, None, :]
            unbiased0 = var_g[0] * n / max(n - 1, 1)
            new_s = {
                "mean": (1 - momentum) * s["mean"] + momentum * mean_g[0],
                "var": (1 - momentum) * s["var"] + momentum * unbiased0,
            }
        else:
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.var(xf, axis=(0, 1, 2))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * n / max(n - 1, 1)
            new_s = {
                "mean": (1 - momentum) * s["mean"] + momentum * mean,
                "var": (1 - momentum) * s["var"] + momentum * unbiased,
            }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype), new_s


def apply(
    params: dict,
    stats: dict,
    x: jnp.ndarray,
    name: str = "resnet18",
    training: bool = True,
    with_head: bool = True,
    dtype=jnp.float32,
    bn_groups: int = 1,
):
    """``[B, H, W, 3] → ([B, head_dim] or [B, feat_dim], new_stats)``.

    ``bn_groups``: BatchNorm statistic groups over the batch axis (1 =
    global/SyncBN; = data-shard count for the reference's per-rank DDP
    BatchNorm — see :func:`_bn`)."""
    import functools

    bn = functools.partial(_bn, groups=bn_groups)
    kind, reps = BLOCKS[name]
    x = x.astype(dtype)
    new_stats: dict = {}
    x = _conv(x, params["stem"]["conv"].astype(dtype), stride=2)
    x, new_stats["stem"] = bn(x, params["stem"]["bn"], stats["stem"], training)
    x = jax.nn.relu(x)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )

    for s in range(4):
        stage_p, stage_s = params[f"stage{s}"], stats[f"stage{s}"]
        out_stage = []
        for b, (bp, bs) in enumerate(zip(stage_p, stage_s)):
            stride = 2 if (s > 0 and b == 0) else 1
            identity = x
            nbs: dict = {}
            if kind == "basic":
                y = _conv(x, bp["conv1"].astype(dtype), stride)
                y, nbs["bn1"] = bn(y, bp["bn1"], bs["bn1"], training)
                y = jax.nn.relu(y)
                y = _conv(y, bp["conv2"].astype(dtype))
                y, nbs["bn2"] = bn(y, bp["bn2"], bs["bn2"], training)
            else:
                y = _conv(x, bp["conv1"].astype(dtype))
                y, nbs["bn1"] = bn(y, bp["bn1"], bs["bn1"], training)
                y = jax.nn.relu(y)
                y = _conv(y, bp["conv2"].astype(dtype), stride)
                y, nbs["bn2"] = bn(y, bp["bn2"], bs["bn2"], training)
                y = jax.nn.relu(y)
                y = _conv(y, bp["conv3"].astype(dtype))
                y, nbs["bn3"] = bn(y, bp["bn3"], bs["bn3"], training)
            if "down_conv" in bp:
                identity = _conv(x, bp["down_conv"].astype(dtype), stride)
                identity, nbs["down_bn"] = bn(
                    identity, bp["down_bn"], bs["down_bn"], training
                )
            x = jax.nn.relu(y + identity)
            out_stage.append(nbs)
        new_stats[f"stage{s}"] = out_stage

    feats = jnp.mean(x, axis=(1, 2))  # global average pool
    if not with_head:
        return feats, new_stats
    h = params["head"]
    y = jnp.dot(feats, h["fc1"]["kernel"].astype(dtype)) + h["fc1"]["bias"].astype(dtype)
    y = jax.nn.relu(y)
    y = jnp.dot(y, h["fc2"]["kernel"].astype(dtype)) + h["fc2"]["bias"].astype(dtype)
    return y, new_stats
