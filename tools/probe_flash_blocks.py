"""Flash-attention block-size sweep at the decoder shape for a given
batch (defaults were tuned at bs 32 — PERFORMANCE.md; the headline bench
runs bs 48).

Usage: python tools/probe_flash_blocks.py [batch] [reps]
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

    from bvc_tpu.ops.flash_attention import flash_attention

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    N, H, d = 1568, 6, 64
    rng = np.random.default_rng(0)
    q = jax.device_put(jnp.asarray(
        rng.standard_normal((B, N, H, d)), jnp.bfloat16))

    # harness floor
    floor = timed(lambda _, x: x * jnp.bfloat16(1.0001), None, q, reps=reps)
    print(f"B={B} N={N} floor={floor:.2f} ms/rep")

    # divisors of 1568 = 2^5 * 7^2 in the useful range
    cands = (196, 224, 392, 784, 1568)
    results = []
    for bq in cands:
        for bk in cands:
            def fwd(_, x, bq=bq, bk=bk):
                return flash_attention(x, q, q, block_q=bq, block_k=bk,
                                       bwd_block_q=bq, bwd_block_k=bk)

            def fb(_, x, bq=bq, bk=bk):
                def loss(y):
                    return jnp.sum(flash_attention(
                        y, q, q, block_q=bq, block_k=bk,
                        bwd_block_q=bq, bwd_block_k=bk
                    ).astype(jnp.float32))

                return jax.value_and_grad(loss)(x)

            try:
                t_f = timed(fwd, None, q, reps=reps) - floor
                t_fb = timed(fb, None, q, reps=reps) - floor
            except Exception as e:
                print(f"bq={bq:5d} bk={bk:5d}  FAILED: {str(e)[:80]}")
                continue
            results.append((t_fb, t_f, bq, bk))
            print(f"bq={bq:5d} bk={bk:5d}  fwd {t_f:6.2f} ms  "
                  f"fwd+bwd {t_fb:6.2f} ms", flush=True)
    results.sort()
    best = results[0]
    print(f"\nbest fwd+bwd: bq={best[2]} bk={best[3]} -> {best[0]:.2f} ms "
          f"(fwd {best[1]:.2f}); current default bq=784 bk=784")


if __name__ == "__main__":
    main()
