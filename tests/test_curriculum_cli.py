"""run_curriculum CLI: override parsing and preset materialisation."""

import dataclasses

import pytest

from bvc_tpu.cli.run_curriculum import build_parser
from bvc_tpu.curriculum.presets import FAMILY_PRESETS


class TestOverrideParsing:
    def test_override_creates_patched_preset(self):
        # mirror the CLI's override materialisation logic
        args = build_parser().parse_args([
            "-jpg_root", "/d", "-savedir", "/s",
            "--preset", "generative",
            "--override", "n_epoch=1,max_epoch_iters=3,n_trainsamples=64,batch_size=2",
        ])
        overrides = {}
        for part in args.override.split(","):
            k, v = part.split("=")
            overrides[k.strip()] = type(getattr(FAMILY_PRESETS[args.preset], k.strip()))(v)
        patched = dataclasses.replace(FAMILY_PRESETS[args.preset], **overrides)
        assert patched.n_epoch == 1
        assert patched.max_epoch_iters == 3
        assert patched.n_trainsamples == 64
        assert patched.batch_size == 2
        # untouched fields keep the slurm-script values
        assert patched.lr == 0.1 and patched.num_frames == 16

    def test_bad_override_key_raises(self):
        with pytest.raises(AttributeError):
            getattr(FAMILY_PRESETS["generative"], "nonexistent_field")

    def test_segment_minutes_flag(self):
        args = build_parser().parse_args(
            ["-jpg_root", "/d", "-savedir", "/s", "--segment_minutes", "0.1"])
        assert args.segment_minutes == 0.1
