"""Regression tests for the driver-facing entry points.

Round 1's only red check was ``dryrun_multichip`` crashing in the
driver's environment (MULTICHIP_r01.json: it assumed someone else had
provisioned the virtual 8-CPU mesh).  The glue is exactly the kind of
code a normal test suite never touches — so it gets its own tests here:

- ``entry()`` must return a jittable forward step (the driver
  compile-checks it single-chip);
- ``dryrun_multichip(n)`` must self-provision an ``n``-device virtual
  CPU mesh in a fresh subprocess and run both the DPxTP and FSDP passes,
  even when the calling process has already initialized a backend.
"""

import sys
from pathlib import Path

import jax
import pytest


def _load_entry_module():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__

    return __graft_entry__


class TestEntry:
    def test_entry_traces_and_lowers(self):
        g = _load_entry_module()
        fn, args = g.entry()
        # eval_shape proves the function traces with static shapes;
        # lower() proves it is jittable (no full compile — keeps CI fast)
        out = jax.eval_shape(fn, *args)
        assert out.shape == ()
        jax.jit(fn).lower(*args)


class TestDryrunMultichip:
    @pytest.mark.slow
    def test_self_provisions_virtual_mesh(self, capfd):
        g = _load_entry_module()
        # The parent process (this test run) already initialized a CPU
        # backend with 8 virtual devices — the subprocess re-exec must
        # still work and print both sharding-mode lines.
        g.dryrun_multichip(4)
        out = capfd.readouterr().out
        assert "mode=tp" in out and "loss=" in out
        assert "mode=fsdp" in out
        assert "mode=zero1" in out
        # all passes reported finite losses (at n=4: tp, fsdp, zero1,
        # jepa, seq-parallel, simclr, extraction, pipeline, pipe x accum;
        # the seq x tp pass needs n % 8 == 0 and is skipped)
        assert out.count("dryrun_multichip ok") == 9
        assert "mode=pipeline" in out
        assert "mode=pipeline grad_accum=2" in out
        assert "family=jepa" in out
        assert "mode=seq-parallel" in out
        assert "family=simclr negatives=per_replica" in out
        assert "extraction rows=10" in out
