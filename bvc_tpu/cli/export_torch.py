"""CLI: export an Orbax checkpoint as a reference-loadable torch
``model_{run_id}.pth.tar``.

The reference threads checkpoints between its scripts and notebooks by
this filename contract (``slurmscripts/generative/slurm_dev_def.bash:102-103``)
and dict layout (``generative/pretrain_videomae.py:72-85``; JEPA
three-model variant ``predictive/pretrain_jepa.py:126-142``; SimCLR
``contrastive/pretrain_simclr.py:93-105``).  This entry point lets
reference notebooks and evaluation code consume checkpoints trained here.

The optimizer state is exported as ``None``: optax and torch optimizer
state dicts are not interconvertible, and the reference only reads
``opt`` when chaining stages — which this framework does natively.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from bvc_tpu.cli.compute_embeddings import model_config_from_args
from bvc_tpu.training.checkpoint import load_checkpoint, load_meta
from bvc_tpu.evalbench.extract import run_id_from_checkpoint


def build_parser():
    p = argparse.ArgumentParser(
        description="Export an Orbax checkpoint to a reference torch .pth.tar")
    p.add_argument("-checkpoint_path", type=str, required=True,
                   help="model_{run_id}.ckpt directory")
    p.add_argument("-out", type=str, default="",
                   help="output .pth.tar (default: model_{run_id}.pth.tar "
                        "next to the input)")
    p.add_argument("--family", type=str, default="videomae",
                   help="videomae|jepa|simclr")
    p.add_argument("--architecture", type=str, default="base")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--tubelet_size", type=int, default=2)
    p.add_argument("--pred_emb_dim", type=int, default=384)
    return p


def export(args) -> str:
    import numpy as np
    import torch

    cfg = model_config_from_args(args)
    if args.family == "jepa":
        cfg.pred_emb_dim = args.pred_emb_dim
    restored = load_checkpoint(args.checkpoint_path)
    meta = load_meta(args.checkpoint_path)
    common = {
        "epoch": meta.get("epoch", 0),
        "batch_size": meta.get("batch_size", 0),
        "world_size": meta.get("world_size", 1),
        "lr": meta.get("lr", 0.0),
    }

    def tens(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}

    if args.family == "videomae":
        from bvc_tpu.models.torch_interop import videomae_to_hf_state_dict

        save_dict = {
            "model_state_dict": tens(
                videomae_to_hf_state_dict(restored["model_state_dict"], cfg)
            ),
            "opt": None,
            "train_loss": meta.get("train_loss", 0.0),
            "val_loss": meta.get("val_loss", 0.0),
            **common,
        }
    elif args.family == "jepa":
        from bvc_tpu.models.torch_interop import (
            jepa_encoder_to_reference,
            jepa_predictor_to_reference,
        )

        save_dict = {
            "encoder": tens(jepa_encoder_to_reference(restored["encoder"], cfg)),
            "predictor": tens(
                jepa_predictor_to_reference(restored["predictor"], cfg)
            ),
            "target_encoder": tens(
                jepa_encoder_to_reference(restored["target_encoder"], cfg)
            ),
            "opt": None,
            "scaler": None,
            "loss": meta.get("loss", 0.0),
            **common,
        }
    elif args.family == "simclr":
        from bvc_tpu.models.torch_interop import resnet_to_torch_state_dict

        save_dict = {
            "model_state_dict": tens(
                resnet_to_torch_state_dict(
                    restored["model_state_dict"], restored["batch_stats"],
                    cfg.architecture,
                )
            ),
            "opt": None,
            "train_loss": meta.get("train_loss", 0.0),
            **common,
        }
    else:
        raise ValueError(f"unknown family {args.family!r}")

    out = args.out or str(
        Path(args.checkpoint_path).parent
        / f"model_{run_id_from_checkpoint(args.checkpoint_path)}.pth.tar"
    )
    torch.save(save_dict, out)
    return out


def main(argv=None):
    args = build_parser().parse_args(argv)
    out = export(args)
    print(json.dumps({"out": out, "family": args.family}))


if __name__ == "__main__":
    main()
