"""Process-level runtime knobs shared by all entry points."""

from __future__ import annotations

import os


def setup_runtime(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (and any other
    process-wide knobs).  Safe to call multiple times; must run before
    the first compilation to be effective.

    Cuts the 1-2 min ViT-B compile out of every repeat CLI/bench
    invocation — important here because the remote-attached TPU also pays
    a multi-minute tunnel warmup per process.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(
        "BVC_COMPILE_CACHE", os.path.expanduser("~/.cache/bvc_tpu_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
