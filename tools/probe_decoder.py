"""Per-op decoder ledger at the headline shape (VERDICT r3 #3).

The round-3 decomposition pinned the VideoMAE-B decoder at ~110 of the
171 ms step; flash attention covers its attention, but the width-384
dense/LN/GELU work (the other ~60%) had no per-op accounting.  This
probe times every decoder component at [B, 1568, 384] with the
corrected in-jit-repetition harness (tools/_benchlib.py) and prints a
ledger against per-op rooflines (v5e: 197 TF/s bf16 MXU, ~819 GB/s HBM),
so PERFORMANCE.md can carry decoder accounting at the encoder's rigor.

Usage: python tools/probe_decoder.py [batch_per_chip] [reps]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _benchlib import timed  # noqa: E402

PEAK_TF = 197e12
HBM_BPS = 819e9


def _roof(flops: float, bytes_: float) -> float:
    """Achievable ms for an op: max of MXU-bound and HBM-bound time."""
    return max(flops / PEAK_TF, bytes_ / HBM_BPS) * 1e3


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    from bvc_tpu.models import videomae
    from bvc_tpu.models.vit import _dense, layer_norm, run_blocks
    from bvc_tpu.ops.gelu import gelu
    from bvc_tpu.ops.attention import multi_head_attention
    from bvc_tpu.utils.config import ModelConfig

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    # the tunnel's sync readback costs ~55 ms per timing loop; at reps=8
    # that is a ~7 ms/rep floor that swamps sub-ms ops — 64 reps pushes
    # it under 1 ms (the 'null' row below measures it directly)
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cfg = ModelConfig()
    N, D, H = cfg.seq_len, cfg.decoder_hidden_size, cfg.decoder_num_heads
    d = D // H
    depth = cfg.decoder_depth
    params = videomae.init_params(jax.random.PRNGKey(0), cfg)
    dec = jax.device_put(
        jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16),
                               params["decoder"]))
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16))
    qkv = jax.device_put(
        jnp.asarray(rng.standard_normal((B, N, H, d)), jnp.bfloat16))
    print(f"B={B} N={N} D={D} heads={H} depth={depth} reps={reps}")

    # full-stack rows unroll reps x depth x fwd+bwd straight-line — cap
    # their in-jit repetition to keep compiles tractable; their work is
    # 10-100x the floor anyway
    big_reps = max(8, reps // 8)
    rows = []

    def row(name, ms, flops, bytes_):
        ms -= rows[0][1] if rows and rows[0][0] == "null (floor)" else 0.0
        roof = _roof(flops, bytes_)
        rows.append((name, ms, roof, flops, bytes_))
        eff = roof / ms * 100 if ms > 0 else 0
        tf = flops / (ms * 1e-3) / 1e12 if ms > 0 else 0
        print(f"{name:28s} {ms:8.2f} ms  roof {roof:7.2f} ms  "
              f"({eff:5.1f}% of roof, {tf:6.1f} TF/s)")

    bf2 = 2  # bf16 bytes
    BN = B * N

    # ---- harness floor: a near-free op; its reading is the per-rep
    # dispatch/sync cost, subtracted from every later row ----
    t = timed(lambda p, v: v * jnp.bfloat16(1.0001), dec, x, reps=reps)
    rows.append(("null (floor)", t, 0.0, 0, 0))
    print(f"{'null (floor)':28s} {t:8.2f} ms  (subtracted from all rows)")

    # ---- full stack ----
    t = timed(lambda p, v: run_blocks(p, v, H, 1e-12, unroll=True),
              dec, x, reps=big_reps)
    # per-block flops (fwd): qkv + proj + fc1 + fc2 + attn matmuls
    f_dense_blk = 2 * BN * D * (3 * D + D + 4 * D + 4 * D)
    f_attn_blk = 2 * 2 * B * H * N * N * d
    flops_fwd = depth * (f_dense_blk + f_attn_blk)
    row("decoder fwd (4 blocks)", t, flops_fwd, 0)

    def fwd_loss(p, v):
        out = run_blocks(p, v, H, 1e-12, unroll=True)
        return jnp.sum(out.astype(jnp.float32))

    # return the WHOLE (value, grads) pytree: timed() consumes every
    # leaf, so the backward cannot be dead-code-eliminated (the [0]-only
    # variant measured fwd+bwd < fwd — the r2 harness trap)
    t = timed(lambda p, v: jax.value_and_grad(fwd_loss)(p, v), dec, x,
              reps=big_reps)
    row("decoder fwd+bwd", t, 3 * flops_fwd, 0)

    # ---- attention alone (flash + xla), one layer's shape ----
    for impl in ("flash", "xla"):
        t = timed(
            lambda _, q: multi_head_attention(q, qkv, qkv, impl=impl),
            None, qkv, reps=reps)
        row(f"attn fwd [{impl}] x1", t, f_attn_blk,
            4 * B * N * H * d * bf2)

        def attn_loss(_, q, impl=impl):
            return jnp.sum(
                multi_head_attention(q, qkv, qkv, impl=impl)
                .astype(jnp.float32))

        t = timed(
            lambda _, q: jax.value_and_grad(attn_loss, argnums=1)(None, q),
            None, qkv, reps=reps)
        row(f"attn fwd+bwd [{impl}] x1", t, 3 * f_attn_blk,
            8 * B * N * H * d * bf2)

    # ---- dense/VPU parts, one layer each ----
    l0 = jax.tree_util.tree_map(lambda p: p[0], dec)
    t = timed(lambda p, v: layer_norm(v, p["ln1"], 1e-12), l0, x, reps=reps)
    row("layer_norm x1", t, 0, 2 * BN * D * bf2)

    t = timed(lambda p, v: _dense(v, p["attn"]["qkv"], jnp.bfloat16),
              l0, x, reps=reps)
    row("qkv dense (384->1152) x1", t, 2 * BN * D * 3 * D,
        (BN * D + BN * 3 * D) * bf2)

    t = timed(lambda p, v: _dense(v, p["attn"]["proj"], jnp.bfloat16),
              l0, x, reps=reps)
    row("proj dense (384->384) x1", t, 2 * BN * D * D, 2 * BN * D * bf2)

    t = timed(lambda p, v: _dense(v, p["mlp"]["fc1"], jnp.bfloat16),
              l0, x, reps=reps)
    row("fc1 dense (384->1536) x1", t, 2 * BN * D * 4 * D,
        (BN * D + BN * 4 * D) * bf2)

    t = timed(
        lambda p, v: gelu(_dense(v, p["mlp"]["fc1"], jnp.bfloat16)),
        l0, x, reps=reps)
    row("fc1+gelu x1", t, 2 * BN * D * 4 * D,
        (BN * D + BN * 4 * D) * bf2)

    wide = jax.device_put(
        jnp.asarray(rng.standard_normal((B, N, 4 * D)), jnp.bfloat16))
    t = timed(lambda p, v: _dense(v, p["mlp"]["fc2"], jnp.bfloat16),
              l0, wide, reps=reps)
    row("fc2 dense (1536->384) x1", t, 2 * BN * 4 * D * D,
        (BN * 4 * D + BN * D) * bf2)

    t = timed(lambda p, v: gelu(v), l0, wide, reps=reps)
    row("gelu alone (B,N,1536) x1", t, 0, 2 * BN * 4 * D * bf2)

    # exact-erf comparison row (the pre-round-4 default, kept to show
    # what the polynomial buys at this shape)
    t = timed(lambda p, v: jax.nn.gelu(v, approximate=False), l0, wide,
              reps=reps)
    row("gelu EXACT-ERF x1", t, 0, 2 * BN * 4 * D * bf2)

    # ---- no-attention block stack (difference isolates attention) ----
    def block_noattn(p, v):
        h = layer_norm(v, p["ln1"], 1e-12)
        q3 = _dense(h, p["attn"]["qkv"], jnp.bfloat16)
        # keep the dense FLOPs, skip the attention kernel
        attn_out = q3.reshape(B, N, 3, H, d)[:, :, 2].reshape(B, N, D)
        v = v + _dense(attn_out, p["attn"]["proj"], jnp.bfloat16)
        h = layer_norm(v, p["ln2"], 1e-12)
        h = _dense(h, p["mlp"]["fc1"], jnp.bfloat16)
        h = gelu(h)
        return v + _dense(h, p["mlp"]["fc2"], jnp.bfloat16)

    def stack_noattn(p, v):
        for i in range(depth):
            v = block_noattn(jax.tree_util.tree_map(lambda l: l[i], p), v)
        return v

    t = timed(stack_noattn, dec, x, reps=big_reps)
    row("decoder fwd NO-ATTN", t, depth * f_dense_blk, 0)

    def noattn_loss(p, v):
        return jnp.sum(stack_noattn(p, v).astype(jnp.float32))

    t = timed(lambda p, v: jax.value_and_grad(noattn_loss)(p, v), dec, x,
              reps=big_reps)
    row("decoder fwd+bwd NO-ATTN", t, 3 * depth * f_dense_blk, 0)

    # ---- ledger summary ----
    print("\nledger (sum of one-layer parts x depth vs whole):")
    parts = {n: ms for n, ms, *_ in rows}
    dense_sum = depth * (
        2 * parts["layer_norm x1"] + parts["qkv dense (384->1152) x1"]
        + parts["proj dense (384->384) x1"] + parts["fc1+gelu x1"]
        + parts["fc2 dense (1536->384) x1"]
    )
    attn_sum = depth * parts["attn fwd [flash] x1"]
    print(f"  dense+VPU parts sum (fwd): {dense_sum:7.2f} ms")
    print(f"  flash attn x{depth}  (fwd): {attn_sum:7.2f} ms")
    print(f"  parts total        (fwd): {dense_sum + attn_sum:7.2f} ms")
    print(f"  whole decoder      (fwd): {parts['decoder fwd (4 blocks)']:7.2f} ms")


if __name__ == "__main__":
    main()
