"""Re-probe the flash-vs-XLA crossover at the JEPA attention shapes.

The auto rule routes unmasked n < 512 to XLA; that threshold was
measured before the round-4 flash work (full-KV backward blocks,
polynomial GELU changed surrounding fusion pressure).  The JEPA step's
biggest piece is the no-grad target encoder at [B, 392, 12, 64]
(bf16-logit XLA today); the context encoder backward runs [B, 169]
unmasked.  If flash now wins at 392, the routing threshold is stale.

Usage: python tools/probe_attn_392.py [B] [reps]
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

    from bvc_tpu.ops.attention import multi_head_attention

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    H, d = 12, 64
    rng = np.random.default_rng(0)

    for N, modes, with_bwd in (
        (392, ("xla", "xla_bf16", "flash"), False),   # target encoder fwd
        (169, ("xla", "flash"), True),                # context encoder fwd+bwd
        (392, ("xla", "flash"), True),                # 392 with grad, for the map
    ):
        q = jax.device_put(jnp.asarray(
            rng.standard_normal((B, N, H, d)), jnp.bfloat16))
        floor = timed(lambda _, x: x * jnp.bfloat16(1.0001), None, q,
                      reps=reps)
        print(f"\nN={N} B={B} bwd={with_bwd} floor={floor:.2f} ms", flush=True)
        for mode in modes:
            if with_bwd:
                def fn(_, x, mode=mode):
                    def loss(y):
                        return jnp.sum(multi_head_attention(
                            y, x, x, impl=mode).astype(jnp.float32))

                    return jax.value_and_grad(loss)(x)
            else:
                def fn(_, x, mode=mode):
                    return multi_head_attention(x, x, x, impl=mode)

            try:
                t = timed(fn, None, q, reps=reps) - floor
                print(f"  {mode:10s} {t:7.2f} ms", flush=True)
            except Exception as e:
                print(f"  {mode:10s} FAILED: {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
