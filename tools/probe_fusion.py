"""Decoder block-boundary fusion A/Bs (VERDICT r4 task 2).

The round-4 ledger (PERFORMANCE.md "Round-4 decoder accounting") pinned
the decoder's remaining gap at block BOUNDARIES: the qkv ``[B,N,3,H,d]``
slice materialisation, the 3 per-tensor transposes into the flash
kernel's ``[B,h,N,d]`` layout, the output transpose back, and the
residual/LN fusion breaks.  This probe measures those costs directly and
A/Bs candidate fixes at the headline decoder shape ``[48, 1568, 384]``
(6 heads, d=64):

1. ``baseline``      — current ``block_apply`` stack (fwd, fwd+bwd).
2. ``qkv-boundary``  — the slice+scale+transpose chain alone (what the
   flash prep costs per layer).
3. ``proj-boundary`` — transpose+reshape+proj vs a direct
   ``einsum('bhnd,hdD->bnD')`` from the kernel-output layout.
4. ``one-transpose`` — restructured block: ONE ``[B,N,3,H,d] →
   [3,B,H,N,d]`` transpose of the packed tensor, flash called on the
   pre-transposed q/k/v (``_flash`` directly), proj via einsum — i.e.
   variants (a)+(c) of the VERDICT task without a new kernel.

Usage: python tools/probe_fusion.py [batch] [reps] [mode]
  mode: all | fwd | bwd  (``bwd``: the two fwd+bwd rows + parity only —
  the compile-heavy rows the first full run timed out before)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _benchlib import timed  # noqa: E402


def main():
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    from bvc_tpu.models import videomae
    from bvc_tpu.models.vit import _dense, layer_norm, run_blocks
    from bvc_tpu.ops.flash_attention import _flash
    from bvc_tpu.ops.gelu import gelu
    from bvc_tpu.utils.config import ModelConfig

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    mode = sys.argv[3] if len(sys.argv) > 3 else "all"
    cfg = ModelConfig()
    N, D, H = cfg.seq_len, cfg.decoder_hidden_size, cfg.decoder_num_heads
    d = D // H
    depth = cfg.decoder_depth
    scale = d ** -0.5
    params = videomae.init_params(jax.random.PRNGKey(0), cfg)
    dec = jax.device_put(
        jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16),
                               params["decoder"]))
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16))
    qkv3 = jax.device_put(
        jnp.asarray(rng.standard_normal((B, N, 3 * D)), jnp.bfloat16))
    bhnd = jax.device_put(
        jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.bfloat16))
    print(f"B={B} N={N} D={D} heads={H} depth={depth} reps={reps} mode={mode}")
    big_reps = max(8, reps // 4)

    rows = {}

    def row(name, ms):
        ms -= rows.get("null (floor)", 0.0)
        rows[name] = ms
        print(f"{name:34s} {ms:8.2f} ms", flush=True)

    floor = timed(lambda p, v: v * jnp.bfloat16(1.0001), dec, x, reps=reps)
    rows["null (floor)"] = floor
    print(f"{'null (floor)':34s} {floor:8.2f} ms  (subtracted)", flush=True)

    def base_loss(p, v):
        return jnp.sum(
            run_blocks(p, v, H, 1e-12, unroll=True).astype(jnp.float32))

    # ---- the one-transpose restructured block (variants a+c) ----
    def proj_via_einsum(p, a):
        kern = p["attn"]["proj"]["kernel"].astype(jnp.bfloat16)
        out = jnp.einsum("bhnd,hdD->bnD", a, kern.reshape(H, d, D),
                         preferred_element_type=jnp.bfloat16)
        return out + p["attn"]["proj"]["bias"].astype(jnp.bfloat16)

    def block_one_t(p, v):
        h = layer_norm(v, p["ln1"], 1e-12)
        q3 = _dense(h, p["attn"]["qkv"], jnp.bfloat16)
        r = q3.reshape(B, N, 3, H, d).transpose(2, 0, 3, 1, 4)
        qt = r[0] * jnp.bfloat16(scale)
        o = _flash(qt, r[1], r[2], 784, N, 784, 784, None, False)
        v = v + proj_via_einsum(p, o)
        h = layer_norm(v, p["ln2"], 1e-12)
        h = gelu(_dense(h, p["mlp"]["fc1"], jnp.bfloat16))
        return v + _dense(h, p["mlp"]["fc2"], jnp.bfloat16)

    def stack_one_t(p, v):
        for i in range(depth):
            v = block_one_t(jax.tree_util.tree_map(lambda l: l[i], p), v)
        return v

    def one_t_loss(p, v):
        return jnp.sum(stack_one_t(p, v).astype(jnp.float32))

    if mode in ("all", "fwd"):
        row("baseline stack fwd",
            timed(lambda p, v: run_blocks(p, v, H, 1e-12, unroll=True),
                  dec, x, reps=big_reps))

        def qkv_boundary(_, q3):
            r = q3.reshape(B, N, 3, H, d)
            q, k, v = r[:, :, 0], r[:, :, 1], r[:, :, 2]
            qt = (q * scale).astype(q.dtype).transpose(0, 2, 1, 3)
            return qt, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)

        row("qkv slice+scale+3transposes x1",
            timed(qkv_boundary, None, qkv3, reps=reps))

        def one_transpose(_, q3):
            r = q3.reshape(B, N, 3, H, d).transpose(2, 0, 3, 1, 4)
            return r[0] * jnp.bfloat16(scale), r[1], r[2]

        row("qkv ONE packed transpose x1",
            timed(one_transpose, None, qkv3, reps=reps))

        l0 = jax.tree_util.tree_map(lambda p: p[0], dec)

        def proj_via_transpose(p, a):
            out = a.transpose(0, 2, 1, 3).reshape(B, N, D)
            return _dense(out, p["attn"]["proj"], jnp.bfloat16)

        row("proj transpose+reshape+dense x1",
            timed(proj_via_transpose, l0, bhnd, reps=reps))
        row("proj direct einsum x1",
            timed(proj_via_einsum, l0, bhnd, reps=reps))
        row("one-transpose stack fwd",
            timed(stack_one_t, dec, x, reps=big_reps))

    if mode in ("all", "bwd"):
        row("baseline stack fwd+bwd",
            timed(lambda p, v: jax.value_and_grad(base_loss)(p, v), dec, x,
                  reps=big_reps))
        row("one-transpose stack fwd+bwd",
            timed(lambda p, v: jax.value_and_grad(one_t_loss)(p, v), dec, x,
                  reps=big_reps))

        # parity check (same math, different layout route)
        a = run_blocks(dec, x, H, 1e-12, unroll=True)
        b = stack_one_t(dec, x)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
        print(f"one-transpose max|diff| vs baseline: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
