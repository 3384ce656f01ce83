"""Process-level runtime knobs shared by all entry points."""

from __future__ import annotations

import hashlib
import os


def host_fingerprint() -> str:
    """Short tag identifying this host's CPU ISA surface.

    XLA's persistent compilation cache does NOT key CPU AOT executables on
    the compile machine's features; loading an entry compiled on a host
    with a different feature set logs ``cpu_aot_loader ... could lead to
    execution errors such as SIGILL`` (observed on the virtual-CPU-mesh
    CLI path when ``~/.cache`` outlived the VM image — the run survived,
    but only because the divergent features happened to be tuning flags).
    Partitioning the cache directory by this fingerprint makes cross-host
    entries unreachable instead of latent SIGILLs.
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line.split(":", 1)[1]
                    break
    except OSError:
        import platform as _platform

        flags = _platform.machine() + _platform.processor()
    digest = hashlib.sha256(" ".join(sorted(flags.split())).encode()).hexdigest()
    return digest[:12]


def setup_runtime(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (and any other
    process-wide knobs).  Safe to call multiple times; must run before
    the first compilation to be effective.

    Cuts the 1-2 min ViT-B compile out of every repeat CLI/bench
    invocation — important here because the remote-attached TPU also pays
    a multi-minute tunnel warmup per process.
    """
    import jax

    # The axon TPU plugin ignores the JAX_PLATFORMS *env var* in this
    # image; the config knob is authoritative.  Honoring the env var here
    # makes documented CPU-mesh CLI runs work as written, e.g.
    # ``XLA_FLAGS=--xla_force_host_platform_device_count=8
    # JAX_PLATFORMS=cpu python -m bvc_tpu.cli.pretrain_videomae --mesh
    # data=2,seq=4 ...`` (SCALING.md).  Must run before backend init.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    cache_dir = cache_dir or os.environ.get(
        "BVC_COMPILE_CACHE", os.path.expanduser("~/.cache/bvc_tpu_xla")
    )
    # Per-host partition: see host_fingerprint() — a cache that outlives
    # the VM image must not serve CPU executables built for another ISA.
    cache_dir = os.path.join(cache_dir, host_fingerprint())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
