import numpy as np
import pytest

from bvc_tpu.utils import AverageMeter, CSVLogger, RunId, TrainConfig
from bvc_tpu.utils.logging import grad_logger


class TestRunId:
    def test_roundtrip(self):
        rid = RunId("dev", 2, "g1", "default", 1, 246)
        assert str(rid) == "dev_2_g1_default_1_246"
        assert RunId.parse(str(rid)) == rid

    def test_from_checkpoint_path(self):
        rid = RunId.from_checkpoint_path("/x/model_adev_1_g2_default_0_246.pth.tar")
        assert rid == RunId("adev", 1, "g2", "default", 0, 246)
        rid2 = RunId.from_checkpoint_path("model_dev_3_g2_static_2_101.ckpt")
        assert rid2.condition == "static" and rid2.stage == 3

    def test_degenerate_untrained(self):
        rid = RunId.parse("na")
        assert rid.curriculum == "untrained" and rid.train_group == "na"

    def test_train_groups_seen_matches_notebook(self):
        assert RunId("dev", 1, "g0", "d", 0, 0).train_groups_seen() == "g0"
        assert RunId("dev", 3, "g2", "d", 0, 0).train_groups_seen() == "g0g1g2"
        assert RunId("adev", 2, "g1", "d", 0, 0).train_groups_seen() == "g2g1"
        assert RunId("rnd", 2, "gr", "d", 0, 0).train_groups_seen() == "na"


class TestCSVLogger:
    def test_schema_and_rows(self, tmp_path):
        path = tmp_path / "log.csv"
        log = CSVLogger(str(path), ("%d", "epoch"), ("%.5f", "loss"), ("%.4e", "grad"))
        log.log(1, 0.123456, 3.14e-5)
        log.log(2, np.float32(0.5), 1e-9)
        lines = path.read_text().strip().split("\n")
        assert lines[0] == "epoch,loss,grad"
        assert lines[1] == "1,0.12346,3.1400e-05"
        assert lines[2].startswith("2,0.50000,")


class TestAverageMeter:
    def test_running_stats(self):
        m = AverageMeter()
        for v in [1.0, 2.0, 3.0]:
            m.update(v)
        assert m.avg == pytest.approx(2.0)
        assert m.max == 3.0 and m.min == 1.0 and m.count == 3

    def test_weighted(self):
        m = AverageMeter()
        m.update(1.0, n=3)
        m.update(5.0, n=1)
        assert m.avg == pytest.approx(2.0)


class TestGradLogger:
    def test_norms_from_pytree(self):
        grads = {
            "a": {"kernel": np.ones((4, 4)), "bias": np.ones((4,))},
            "b": {"kernel": np.full((2, 2), 3.0)},
        }
        stats = grad_logger(grads)
        assert stats.first_layer == pytest.approx(4.0)  # ||ones(4,4)||
        assert stats.last_layer == pytest.approx(6.0)  # ||3*ones(2,2)||
        assert stats.mean == pytest.approx(5.0)

    def test_probes(self):
        grads = {"q": np.ones((2, 2))}
        stats = grad_logger(grads, probes={"enc_first_layer": lambda g: np.linalg.norm(g["q"])})
        assert stats.enc_first_layer == pytest.approx(2.0)


class TestTrainConfig:
    def test_yaml_roundtrip(self, tmp_path):
        cfg = TrainConfig(run_id="dev_1_g0_default_0_0", seed=3)
        cfg.optim.lr = 0.03
        cfg.data.augs = "cg"
        p = tmp_path / "params.yaml"
        cfg.dump_yaml(p)
        import yaml

        loaded = TrainConfig.from_dict(yaml.safe_load(p.read_text()))
        assert loaded.optim.lr == 0.03
        assert loaded.data.augs == "cg"
        assert loaded.mask.enc_mask_scale == (0.85, 1.0)

    def test_derived_shapes(self):
        cfg = TrainConfig()
        assert cfg.model.seq_len == 8 * 14 * 14  # 1568 tokens (SURVEY §5)
        assert cfg.data.segment_size == 54000


class TestRuntimeCachePartition:
    """The persistent XLA cache must be partitioned per host ISA: XLA's
    CPU AOT loader does not validate machine features and a cache that
    outlives the VM image can SIGILL the process mid-run (see
    utils/runtime.py host_fingerprint)."""

    def test_fingerprint_stable_and_short(self):
        from bvc_tpu.utils.runtime import host_fingerprint

        a, b = host_fingerprint(), host_fingerprint()
        assert a == b
        assert len(a) == 12
        int(a, 16)  # hex digest slice

    @pytest.fixture
    def restore_cache_config(self):
        import jax

        prev = jax.config.jax_compilation_cache_dir
        prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
        yield
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)

    def test_setup_appends_fingerprint(self, tmp_path, restore_cache_config):
        import jax

        from bvc_tpu.utils.runtime import host_fingerprint, setup_runtime

        setup_runtime(str(tmp_path / "cache"))
        got = jax.config.jax_compilation_cache_dir
        assert got == str(tmp_path / "cache" / host_fingerprint())

    def test_env_base_dir_is_partitioned(self, tmp_path, monkeypatch,
                                         restore_cache_config):
        import jax

        from bvc_tpu.utils.runtime import host_fingerprint, setup_runtime

        monkeypatch.setenv("BVC_COMPILE_CACHE", str(tmp_path / "envcache"))
        setup_runtime()
        got = jax.config.jax_compilation_cache_dir
        assert got == str(tmp_path / "envcache" / host_fingerprint())


class TestStepTraceWindow:
    def test_traces_a_window_of_steps(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from bvc_tpu.utils.profiling import StepTraceWindow

        f = jax.jit(lambda x: x * 2.0)
        x = jnp.ones((8,))
        w = StepTraceWindow(str(tmp_path / "trace"), start=1, n=2)
        for _ in range(5):
            w.step()
            x = f(x)
        w.close()
        files = list((tmp_path / "trace").rglob("*"))
        assert files, "profiler trace produced no files"

    def test_disabled_is_noop(self, tmp_path):
        from bvc_tpu.utils.profiling import StepTraceWindow

        w = StepTraceWindow("")
        for _ in range(3):
            w.step()
        w.close()  # no raise, nothing written

    def test_close_mid_window(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from bvc_tpu.utils.profiling import StepTraceWindow

        f = jax.jit(lambda x: x + 1.0)
        w = StepTraceWindow(str(tmp_path / "t2"), start=0, n=100)
        w.step()
        f(jnp.ones(())).block_until_ready()
        w.close()  # loop ended before the window did — must stop cleanly
        assert list((tmp_path / "t2").rglob("*"))
