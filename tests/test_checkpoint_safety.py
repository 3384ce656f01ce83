"""Checkpoint crash-safety (VERDICT r2 #4): a save that dies mid-write
must leave the PREVIOUS checkpoint loadable, never a corrupt one.

The multi-host FSDP all-host save cycle itself is exercised in
``test_multihost.py``; here the tmp-then-swap protocol is verified in
one process.
"""

import numpy as np
import pytest

from bvc_tpu.training.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    load_meta,
    save_checkpoint,
)


def _tree(val: float):
    return {"model_state_dict": {"w": np.full((4, 4), val, np.float32)},
            "epoch": np.int32(1)}


class TestCrashSafety:
    def test_failed_save_keeps_previous_checkpoint(self, tmp_path, monkeypatch):
        ck = tmp_path / "model_x.ckpt"
        save_checkpoint(ck, _tree(1.0), meta={"epoch": 1})

        import orbax.checkpoint as ocp

        def boom(self, *a, **k):
            raise RuntimeError("simulated mid-save death")

        monkeypatch.setattr(ocp.StandardCheckpointer, "save", boom)
        with pytest.raises(RuntimeError, match="mid-save"):
            save_checkpoint(ck, _tree(2.0), meta={"epoch": 2})
        monkeypatch.undo()

        # the old checkpoint is intact — both state and meta
        restored = load_checkpoint(ck)
        np.testing.assert_array_equal(
            restored["model_state_dict"]["w"], np.full((4, 4), 1.0, np.float32)
        )
        assert load_meta(ck)["epoch"] == 1

    def test_stale_tmp_dir_does_not_break_next_save(self, tmp_path):
        ck = tmp_path / "model_x.ckpt"
        # leftovers from a killed save
        stale = tmp_path / "model_x.ckpt.new"
        (stale / "state").mkdir(parents=True)
        (stale / "state" / "junk").write_text("partial")

        save_checkpoint(ck, _tree(3.0), meta={"epoch": 3})
        restored = load_checkpoint(ck)
        np.testing.assert_array_equal(
            restored["model_state_dict"]["w"], np.full((4, 4), 3.0, np.float32)
        )
        assert not stale.exists()  # consumed by the swap

    def test_death_inside_swap_is_recoverable(self, tmp_path):
        # simulate dying between path.rename(.old) and tmp.rename(path):
        # nothing at `path`, but .old (previous) and .new (completed new
        # save) both intact
        ck = tmp_path / "model_x.ckpt"
        save_checkpoint(ck, _tree(1.0), meta={"epoch": 1})
        save_checkpoint(tmp_path / "scratch.ckpt", _tree(2.0), meta={"epoch": 2})
        (tmp_path / "scratch.ckpt").rename(tmp_path / "model_x.ckpt.new")
        ck.rename(tmp_path / "model_x.ckpt.old")

        # resume-time: the survivors are visible and loadable (newest wins)
        assert checkpoint_exists(ck)
        restored = load_checkpoint(ck)
        np.testing.assert_array_equal(
            restored["model_state_dict"]["w"], np.full((4, 4), 2.0, np.float32))
        assert load_meta(ck)["epoch"] == 2

        # next save finishes the interrupted swap and then overwrites
        save_checkpoint(ck, _tree(3.0), meta={"epoch": 3})
        assert load_meta(ck)["epoch"] == 3
        assert not (tmp_path / "model_x.ckpt.new").exists()
        assert not (tmp_path / "model_x.ckpt.old").exists()

    def test_death_after_swap_before_old_cleanup(self, tmp_path):
        # .old left behind after a completed swap must not shadow the
        # real checkpoint and is cleaned by the next save
        ck = tmp_path / "model_x.ckpt"
        save_checkpoint(ck, _tree(5.0), meta={"epoch": 5})
        save_checkpoint(tmp_path / "scratch.ckpt", _tree(4.0), meta={"epoch": 4})
        (tmp_path / "scratch.ckpt").rename(tmp_path / "model_x.ckpt.old")
        restored = load_checkpoint(ck)  # the real one wins
        np.testing.assert_array_equal(
            restored["model_state_dict"]["w"], np.full((4, 4), 5.0, np.float32))
        save_checkpoint(ck, _tree(6.0), meta={"epoch": 6})
        assert not (tmp_path / "model_x.ckpt.old").exists()
        assert load_meta(ck)["epoch"] == 6

    def test_overwrite_swaps_atomically(self, tmp_path):
        ck = tmp_path / "model_x.ckpt"
        save_checkpoint(ck, _tree(1.0), meta={"epoch": 1})
        save_checkpoint(ck, _tree(2.0), meta={"epoch": 2})
        restored = load_checkpoint(ck)
        np.testing.assert_array_equal(
            restored["model_state_dict"]["w"], np.full((4, 4), 2.0, np.float32)
        )
        assert load_meta(ck)["epoch"] == 2
        assert not (tmp_path / "model_x.ckpt.new").exists()
