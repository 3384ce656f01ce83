"""run_curriculum CLI: override parsing and preset materialisation."""

import pytest

from bvc_tpu.cli.run_curriculum import build_parser
from bvc_tpu.curriculum.presets import FAMILY_PRESETS, apply_overrides


class TestOverrideParsing:
    def test_override_creates_patched_preset(self):
        patched = apply_overrides(
            FAMILY_PRESETS["generative"],
            "n_epoch=1,max_epoch_iters=3,n_trainsamples=64,batch_size=2",
        )
        assert patched.n_epoch == 1
        assert patched.max_epoch_iters == 3
        assert patched.n_trainsamples == 64
        assert patched.batch_size == 2
        # untouched fields keep the slurm-script values
        assert patched.lr == 0.1 and patched.num_frames == 16
        # the registry itself is untouched
        assert FAMILY_PRESETS["generative"].n_epoch == 5

    def test_bool_override_coercion(self):
        p_on = apply_overrides(FAMILY_PRESETS["predictive"], "allow_overlap=true")
        p_off = apply_overrides(FAMILY_PRESETS["predictive"], "allow_overlap=False")
        assert p_on.allow_overlap is True
        assert p_off.allow_overlap is False
        with pytest.raises(ValueError):
            apply_overrides(FAMILY_PRESETS["predictive"], "allow_overlap=maybe")

    def test_bad_override_key_raises(self):
        with pytest.raises(AttributeError):
            apply_overrides(FAMILY_PRESETS["generative"], "nonexistent_field=1")

    def test_segment_minutes_flag(self):
        args = build_parser().parse_args(
            ["-jpg_root", "/d", "-savedir", "/s", "--segment_minutes", "0.1"])
        assert args.segment_minutes == 0.1


class TestEmitScript:
    def test_emits_runnable_script_per_preset(self, tmp_path):
        import subprocess

        from bvc_tpu.cli.run_curriculum import main

        for preset in ("generative", "predictive", "contrastive"):
            out = tmp_path / f"{preset}.sh"
            main(["-jpg_root", "/data/hv", "-savedir", "/out",
                  "--preset", preset, "--curriculum", "dev", "--seed", "101",
                  "--extract", "ssv2=/data/ssv2",
                  "--emit_script", str(out)])
            text = out.read_text()
            # bash-parseable
            rc = subprocess.run(["bash", "-n", str(out)]).returncode
            assert rc == 0, preset
            # three stages with the run-id contract and checkpoint threading
            for stage, group in ((1, "g0"), (2, "g1"), (3, "g2")):
                fold = (101 + stage) % 3
                assert f"dev_{stage}_{group}_default_{fold}_101" in text
            assert text.count('INIT="$SAVEDIR/model_') == 3
            assert "compute_embeddings -ds_task ssv2" in text

    def test_sbatch_header_opt_in(self, tmp_path):
        # reference slurm_dev_def.bash:1-14 analogue; plain scripts carry
        # no scheduler header
        import subprocess

        from bvc_tpu.cli.run_curriculum import main

        out = tmp_path / "with_sbatch.sh"
        main(["-jpg_root", "/data/hv", "-savedir", "/out",
              "--preset", "generative", "--curriculum", "dev",
              "--seed", "7", "--sbatch", "y", "--emit_script", str(out)])
        text = out.read_text()
        assert text.startswith("#!/bin/bash\n#SBATCH --job-name=job_7_dev_generative")
        for line in ("#SBATCH --nodes=1", "#SBATCH --cpus-per-task=40",
                     "#SBATCH --time=1-05:00:00", "#SBATCH --mail-type=FAIL"):
            assert line in text
        assert subprocess.run(["bash", "-n", str(out)]).returncode == 0

        plain = tmp_path / "plain.sh"
        main(["-jpg_root", "/data/hv", "-savedir", "/out",
              "--preset", "generative", "--curriculum", "dev",
              "--seed", "7", "--emit_script", str(plain)])
        assert "#SBATCH" not in plain.read_text()

    def test_stage_overrides_reach_the_script(self, tmp_path):
        # contrastive per-stage lr schedule 1e-2 -> 1e-3 -> 1e-4
        from bvc_tpu.curriculum.driver import emit_script

        text = emit_script("dev", "contrastive", 0)
        assert "--lr 0.01" in text and "--lr 0.001" in text and "--lr 0.0001" in text

    def test_condition_frame_overrides_reach_the_script(self):
        # MatchedSpatioTemporal forces num_frames=1/tubelet=1
        # (CONDITION_FRAME_OVERRIDES) — the emitted flags must match what
        # a live run with the same condition would train
        from bvc_tpu.curriculum.driver import emit_script

        text = emit_script("dev", "complexity_control", 0,
                           condition="MatchedSpatioTemporal",
                           control_data_root="/pkls")
        assert "--num_frames 1 " in text and "--tubelet_size 1" in text
        assert "--tubelet_size 16" not in text
        # pickled control seqlists are mandatory for Matched* conditions;
        # the env var is defaulted in the header so set -u can't trip
        assert '--control_data_root "$CONTROL_ROOT"' in text
        assert "CONTROL_ROOT=${CONTROL_ROOT:-/pkls}" in text
        default = emit_script("dev", "complexity_control", 0)
        assert "--num_frames 1 " not in default
        assert "--control_data_root" not in default

    def test_extraction_flags_follow_condition_overrides(self):
        # the extraction sweep must build the model at the TRAINED dims
        from bvc_tpu.curriculum.driver import emit_script

        text = emit_script("dev", "complexity_control", 0,
                           condition="MatchedSpatioTemporal",
                           extract={"ssv2": "/data/ssv2"})
        ex = [l for l in text.splitlines() if "compute_embeddings" in l][0]
        assert "--num_frames 1 " in ex + " " and "--tubelet_size 1" in ex

    def test_static_condition_emits_control_root(self):
        from bvc_tpu.curriculum.driver import emit_script

        text = emit_script("dev", "generative", 0, condition="static")
        assert '--control_data_root "$CONTROL_ROOT"' in text
        assert "CONTROL_ROOT=${CONTROL_ROOT:-}" in text

    def test_cli_override_reaches_the_script(self, tmp_path):
        from bvc_tpu.cli.run_curriculum import main

        out = tmp_path / "smoke.sh"
        main(["-jpg_root", "/d", "-savedir", "/o", "--preset", "generative",
              "--override", "n_epoch=1,batch_size=2",
              "--emit_script", str(out)])
        text = out.read_text()
        assert "--n_epoch 1" in text and "--batch_size 2" in text

    def test_extraction_emits_sampling_and_architecture_flags(self, tmp_path):
        # the live run threads frame_rate / extract batch size /
        # architecture into _run_extraction; the emitted script must
        # carry the same values or it samples benchmarks differently
        from bvc_tpu.cli.run_curriculum import main

        out = tmp_path / "x.sh"
        main(["-jpg_root", "/d", "-savedir", "/o", "--preset", "contrastive",
              "--frame_rate", "6", "--extract_batch_size", "16",
              "--extract", "ssv2=/data/ssv2",
              "--emit_script", str(out)])
        ex = [l for l in out.read_text().splitlines()
              if "compute_embeddings" in l][0]
        assert "--frame_rate 6 " in ex and "--batch_size 16" in ex
        assert "--architecture resnet18" in ex
        assert "--seed 0" in ex

    def test_emitted_extraction_architecture_parses_per_family(self):
        # every family's emitted --architecture value must round-trip
        # through the compute_embeddings parser to the trained dims
        from bvc_tpu.cli.compute_embeddings import (
            build_parser, model_config_from_args)
        from bvc_tpu.curriculum.driver import emit_script

        for preset, family in (("generative", "videomae"),
                               ("predictive", "jepa"),
                               ("contrastive", "simclr")):
            text = emit_script("dev", preset, 0,
                               extract={"ssv2": "/data/ssv2"})
            ex = [l for l in text.splitlines()
                  if "compute_embeddings" in l][0]
            toks = ex.replace('"', "").split()
            args = build_parser().parse_args(toks[toks.index("-ds_task"):])
            cfg = model_config_from_args(args)
            assert cfg.family == family
            if family == "jepa":
                assert cfg.architecture == "vit_base"
            elif family == "simclr":
                assert cfg.architecture == "resnet18"

    def test_header_names_registry_preset_and_reference_dir(self, tmp_path):
        from bvc_tpu.cli.run_curriculum import main

        out = tmp_path / "h.sh"
        main(["-jpg_root", "/d", "-savedir", "/o", "--preset", "contrastive",
              "--emit_script", str(out)])
        head = out.read_text().splitlines()[:3]
        assert "preset contrastive" in head[1]
        assert "slurmscripts/contrastive/slurm_dev_def.bash" in head[2]
        # predictive_unt lives in predictive/slurm_unt_def.bash
        from bvc_tpu.curriculum.driver import emit_script

        text = emit_script("dev", "predictive_unt", 0,
                           preset_name="predictive_unt")
        assert "slurmscripts/predictive/slurm_unt_def.bash" in text


class TestEmitScriptQuoting:
    def test_paths_with_spaces_emit_quoted_assignments(self, tmp_path):
        """Unquoted `JPG_ROOT=/data/home view` would run `view` as a
        command under set -euo pipefail; literal paths must be quoted
        (while $VAR defaults stay expandable)."""
        import subprocess

        from bvc_tpu.curriculum.driver import emit_script

        text = emit_script(
            "dev", "generative", 0,
            jpg_root="/data/home view", savedir="/out dir's",
            init_checkpoint_path="/ckpts/with space.ckpt",
        )
        assert "JPG_ROOT='/data/home view'" in text
        out = tmp_path / "q.sh"
        out.write_text(text)
        assert subprocess.run(["bash", "-n", str(out)]).returncode == 0
        # the assignments themselves execute cleanly (run just the header)
        header = "\n".join(text.splitlines()[:8]) + "\necho OK\n"
        r = subprocess.run(["bash", "-c", header], capture_output=True,
                           text=True)
        assert r.returncode == 0 and "OK" in r.stdout, r.stderr

    def test_env_var_defaults_still_expand(self):
        from bvc_tpu.curriculum.driver import emit_script

        text = emit_script("dev", "generative", 0)  # default $JPG_ROOT form
        assert "JPG_ROOT=${JPG_ROOT:-$JPG_ROOT}" in text
