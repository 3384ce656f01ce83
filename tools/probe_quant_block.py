"""Where does the isolated 1.46x W8A8 dense win go in the full block?

tools/probe_int8.py measured the quantized dense at 1.46x a bf16 dense
in isolation, yet the end-to-end int8 embed measured ~2% SLOWER than
bf16 (bench_extract A/B).  Hypothesis: in the full block the bf16
dense's neighbours (LN, GELU, residual, dequant epilogue) fuse into the
matmul; the dynamic-quant abs-max reduction is a fusion barrier that
forces extra HBM round trips worth more than the MXU rate doubling.

Times, at the extraction shape [B, 1568, 768]:
  - each of the 4 dense shapes, bf16 vs qdense (isolated — should
    reproduce probe_int8's ratio),
  - one full transformer block, bf16 params vs quantized params,
  - the 12-layer scanned encoder stack, both ways.

Usage: python tools/probe_quant_block.py [B] [reps]
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

    from bvc_tpu.models.vit import _dense, block_apply, init_blocks, run_blocks
    from bvc_tpu.ops.quant import quantize_blocks

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    N, D, H = 1568, 768, 12
    rng = np.random.default_rng(0)

    stacked = init_blocks(jax.random.PRNGKey(0), depth=12, dim=D)
    qstacked = quantize_blocks(stacked)
    l0 = jax.tree_util.tree_map(lambda a: a[0], stacked)
    ql0 = jax.tree_util.tree_map(lambda a: a[0], qstacked)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, N, D)), jnp.bfloat16))
    wide = jax.device_put(jnp.asarray(
        rng.standard_normal((B, N, 4 * D)), jnp.bfloat16))

    floor = timed(lambda p, v: v * jnp.bfloat16(1.0001), None, x, reps=reps)
    print(f"B={B} N={N} D={D} reps={reps} floor={floor:.2f} ms", flush=True)

    def row(name, t):
        print(f"{name:40s} {t - floor:7.2f} ms", flush=True)
        return t - floor

    for key, path, inp in (
        ("qkv  (768->2304)", ("attn", "qkv"), x),
        ("proj (768->768)", ("attn", "proj"), x),
        ("fc1  (768->3072)", ("mlp", "fc1"), x),
        ("fc2  (3072->768)", ("mlp", "fc2"), wide),
    ):
        p16 = l0[path[0]][path[1]]
        p8 = ql0[path[0]][path[1]]
        t16 = row(f"dense {key} bf16",
                  timed(lambda p, v: _dense(v, p16, jnp.bfloat16),
                        None, inp, reps=reps))
        t8 = row(f"dense {key} W8A8",
                 timed(lambda p, v: _dense(v, p8, jnp.bfloat16),
                       None, inp, reps=reps))
        print(f"  -> ratio {t16 / t8:.2f}x", flush=True)

    tb16 = row("block bf16", timed(
        lambda p, v: block_apply(p, v, H), l0, x, reps=reps))
    tb8 = row("block W8A8", timed(
        lambda p, v: block_apply(p, v, H), ql0, x, reps=reps))
    print(f"  -> block ratio {tb16 / tb8:.2f}x", flush=True)

    ts16 = row("stack(12) bf16 scan", timed(
        lambda p, v: run_blocks(p, v, H), stacked, x, reps=max(reps // 4, 4)))
    ts8 = row("stack(12) W8A8 scan", timed(
        lambda p, v: run_blocks(p, v, H), qstacked, x,
        reps=max(reps // 4, 4)))
    print(f"  -> stack ratio {ts16 / ts8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
