"""CLI: export a checkpoint's embedding function as a serving artifact.

``python -m bvc_tpu.cli.export_serving -init_checkpoint_path model_X.ckpt
-out /artifacts/X --family videomae [--quantize int8]``

Beyond the reference (whose deployment story is "ship the repo and
rebuild the torch module around the .pth.tar",
``benchmarks/compute_embeddings_videomae.py:60-101``): the artifact
directory (serialized StableHLO module + frozen params + meta.json,
:mod:`bvc_tpu.serving.export`) replays the extraction forward on any
JAX runtime without bvc_tpu model code.
"""

from __future__ import annotations

import argparse
import json


def build_parser():
    p = argparse.ArgumentParser(
        description="Export an embedding-serving artifact (StableHLO)")
    p.add_argument("-init_checkpoint_path", type=str, required=True,
                   help="checkpoint to freeze ('na' = random init, the "
                        "untrained-baseline analogue)")
    p.add_argument("-out", type=str, required=True,
                   help="artifact directory to write")
    p.add_argument("--family", type=str, default="videomae",
                   help="videomae|jepa|simclr")
    p.add_argument("--architecture", type=str, default="base")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--tubelet_size", type=int, default=2)
    p.add_argument("--quantize", type=str, default="none",
                   help="'int8': freeze the W8A8 expansion-matmul "
                        "weights into the artifact (ViT families)")
    p.add_argument("--batch", type=int, default=0,
                   help="0 = batch-polymorphic artifact (default); N "
                        "pins the batch dimension")
    p.add_argument("--platforms", type=str, default="",
                   help="comma list, e.g. 'cpu' or 'tpu,cpu'; empty = "
                        "the current backend (note: tracing on TPU "
                        "routes long-sequence attention to Pallas flash "
                        "kernels, which only run on TPU)")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from bvc_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax

    from bvc_tpu.cli.compute_embeddings import model_config_from_args
    from bvc_tpu.serving.export import export_embed, save_artifact

    model_cfg = model_config_from_args(args)
    if args.init_checkpoint_path == "na":
        if args.family == "videomae":
            from bvc_tpu.models import videomae

            params = videomae.init_params(jax.random.PRNGKey(args.seed),
                                          model_cfg)
        elif args.family == "jepa":
            from bvc_tpu.models import jepa

            params = jepa.init_encoder_params(jax.random.PRNGKey(args.seed),
                                              model_cfg)
        else:
            from bvc_tpu.models import resnet

            p, stats = resnet.init_params(jax.random.PRNGKey(args.seed),
                                          model_cfg.architecture)
            params = {"params": p, "stats": stats}
    else:
        from bvc_tpu.evalbench.extract import load_family_params

        params = load_family_params(args.family, args.init_checkpoint_path)

    platforms = ([s.strip() for s in args.platforms.split(",") if s.strip()]
                 or None)
    exported, leaves, meta = export_embed(
        args.family, params, model_cfg, quantize=args.quantize,
        batch=args.batch or None, platforms=platforms)
    meta["checkpoint"] = args.init_checkpoint_path
    path = save_artifact(args.out, exported, leaves, meta)
    print(json.dumps({"artifact": path, **{k: meta[k] for k in
                                           ("family", "feature_dim",
                                            "quantize", "batch",
                                            "platforms")}}))


if __name__ == "__main__":
    main()
