"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX analogue of the reference's gloo-CPU fallback
(``benchmarks/compute_embeddings_simclr.py:127,341-343``) — the only way the
reference could run without GPUs.  Here every test sees 8 XLA host devices so
multi-chip sharding logic is exercised for real (SURVEY.md §4).

Must set the env vars before jax is imported anywhere.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image; the
# config knob is authoritative.  Must run before any backend is touched.
jax.config.update("jax_platforms", "cpu")
# Tests compare against exact numpy references; keep f32 matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache keeps repeat suite runs fast — partitioned
# per host ISA like setup_runtime (utils/runtime.py host_fingerprint):
# XLA's CPU AOT loader does not validate machine features, so entries
# left by a different host/flag set risk SIGILL instead of a recompile.
from bvc_tpu.utils.runtime import host_fingerprint  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/bvc_jax_cache/{host_fingerprint()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


_HEAVY_MARKS = ("slow", "parity", "multihost")


def pytest_collection_modifyitems(items):
    """Auto-tier: anything not slow/parity/multihost is `fast`.

    `pytest -m fast` is the <5 min smoke tier (VERDICT r4 task 7); the
    heavyweight torch-subprocess (`parity`), 2-process (`multihost`) and
    `slow` legs run in the full suite only.
    """
    for item in items:
        if not any(item.get_closest_marker(m) for m in _HEAVY_MARKS):
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def frame_corpus(tmp_path_factory):
    """A tiny synthetic JPG frame corpus shaped like the HOMEview layout:
    ``root/<subjdir>/<frame>.jpg``.  Two subjects, 60 frames each, 32x32."""
    from PIL import Image

    root = tmp_path_factory.mktemp("jpg_root")
    rng = np.random.default_rng(42)
    # two g0 subjects + one g1 subject (for curriculum stage chaining)
    for subj in ["008MS", "009SS", "026AR"]:
        d = root / subj
        d.mkdir()
        for i in range(60):
            arr = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"frame_{i:05d}.jpg", quality=90)
    return str(root)
