"""Async checkpoint writer: snapshot isolation, equivalence with the
synchronous path, error propagation, and save serialization.

The reference has no analogue — every ``torch.save`` blocks the job
(``pretraining/generative/pretrain_videomae.py:367-372``); this feature
overlaps serialization with training (bvc_tpu/training/async_checkpoint.py).
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bvc_tpu.training.async_checkpoint import AsyncCheckpointWriter
from bvc_tpu.training.checkpoint import load_checkpoint, load_meta, save_checkpoint


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "model_state_dict": {
            "w": jnp.asarray(rng.normal(size=(8, 8)), jnp.float32),
            "b": jnp.asarray(rng.normal(size=(8,)), jnp.float32),
        },
        "epoch": np.int32(3),
    }


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestAsyncCheckpointWriter:
    def test_matches_synchronous_save(self, tmp_path):
        tree = _tree()
        sync_p = tmp_path / "model_sync.ckpt"
        async_p = tmp_path / "model_async.ckpt"
        save_checkpoint(sync_p, tree, meta={"run_id": "r"})
        w = AsyncCheckpointWriter()
        w.save(async_p, tree, meta={"run_id": "r"})
        w.wait()
        _assert_tree_equal(load_checkpoint(sync_p), load_checkpoint(async_p))
        assert load_meta(async_p)["run_id"] == "r"

    def test_snapshot_isolation(self, tmp_path):
        """Mutating (or deleting) the live state after save() returns must
        not affect what lands on disk — the training loop donates its
        state buffers to the very next step."""
        tree = _tree()
        want = jax.device_get(tree)
        p = tmp_path / "model_iso.ckpt"
        w = AsyncCheckpointWriter()
        w.save(p, tree)
        # clobber the live arrays immediately (simulates donation/reuse)
        tree["model_state_dict"]["w"] = jnp.zeros((8, 8), jnp.float32)
        tree["model_state_dict"]["b"] = None
        del tree["epoch"]
        w.wait()
        got = load_checkpoint(p)
        _assert_tree_equal(got, want)

    def test_write_error_propagates_at_wait(self, tmp_path, monkeypatch):
        import bvc_tpu.training.async_checkpoint as ac

        def boom(*a, **k):
            raise OSError("disk full")

        monkeypatch.setattr(ac, "save_checkpoint", boom)
        w = AsyncCheckpointWriter()
        w.save(tmp_path / "model_err.ckpt", _tree())
        with pytest.raises(OSError, match="disk full"):
            w.wait()
        # error is cleared once raised; the writer is reusable
        w.wait()

    def test_write_error_propagates_at_next_save(self, tmp_path, monkeypatch):
        import bvc_tpu.training.async_checkpoint as ac

        real = ac.save_checkpoint
        calls = {"n": 0}

        def flaky(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise OSError("disk full")
            return real(*a, **k)

        monkeypatch.setattr(ac, "save_checkpoint", flaky)
        w = AsyncCheckpointWriter()
        w.save(tmp_path / "model_e1.ckpt", _tree())
        time.sleep(0.05)
        with pytest.raises(OSError, match="disk full"):
            w.save(tmp_path / "model_e2.ckpt", _tree())

    def test_overlapping_saves_serialize(self, tmp_path, monkeypatch):
        """A second save() must not start writing before the first write
        finished (last-writer-wins on the same path needs ordering)."""
        import bvc_tpu.training.async_checkpoint as ac

        real = ac.save_checkpoint
        order = []
        gate = threading.Event()

        def slow(path, tree, meta=None):
            order.append(("start", int(tree["tag"])))
            if int(tree["tag"]) == 1:
                gate.wait(timeout=5)
            real(path, tree, meta)
            order.append(("end", int(tree["tag"])))

        monkeypatch.setattr(ac, "save_checkpoint", slow)
        p = tmp_path / "model_ser.ckpt"
        w = AsyncCheckpointWriter()
        w.save(p, {"tag": np.int32(1)})
        assert w.in_flight
        release = threading.Timer(0.1, gate.set)
        release.start()
        w.save(p, {"tag": np.int32(2)})  # blocks until write 1 done
        w.wait()
        release.join()
        assert order == [("start", 1), ("end", 1), ("start", 2), ("end", 2)]
        assert int(load_checkpoint(p)["tag"]) == 2

    def test_trainer_end_to_end(self, tmp_path, frame_corpus):
        """The VideoMAE trainer with async_save=y produces a complete,
        loadable checkpoint with the reference metadata contract."""
        from bvc_tpu.training.trainer_videomae import run_pretraining
        from bvc_tpu.utils.config import TrainConfig

        cfg = TrainConfig(run_id="async_1_g0_default_0_0",
                          savedir=str(tmp_path), n_epoch=2,
                          max_epoch_iters=1, seed=0, log_freq=1)
        cfg.async_save = True
        cfg.save_every_epoch = True
        cfg.data.jpg_root = frame_corpus
        cfg.data.train_group = "g0"
        cfg.data.num_frames = 4
        cfg.data.tubelet_size = 2
        cfg.data.image_size = 32
        cfg.data.n_trainsamples = 16
        cfg.data.batch_size = 1
        cfg.data.num_workers = 0
        cfg.data.segment_minutes = 0.02
        cfg.data.keep_val = False
        cfg.model.image_size = 32
        cfg.model.patch_size = 8
        cfg.model.num_frames = 4
        cfg.model.tubelet_size = 2
        cfg.model.hidden_size = 32
        cfg.model.depth = 2
        cfg.model.num_heads = 4
        cfg.model.decoder_hidden_size = 16
        cfg.model.decoder_depth = 1
        cfg.model.decoder_num_heads = 2
        cfg.model.dtype = "float32"
        cfg.mask.mask_ratio = 0.75
        cfg.optim.lr = 0.01
        out = run_pretraining(cfg)
        restored = load_checkpoint(out["checkpoint"])
        assert "model_state_dict" in restored and "opt" in restored
        meta = load_meta(out["checkpoint"])
        assert meta["epoch"] == 2
        assert meta["run_id"] == cfg.run_id
