"""bvc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities
of ssheybani/baby-vision-curriculum ("Curriculum Learning with Infant
Egocentric Videos", NeurIPS 2023).

The reference is a CUDA/PyTorch research codebase (see /root/repo/SURVEY.md);
this package is a ground-up TPU-first redesign:

- single-controller SPMD over a ``jax.sharding.Mesh`` instead of
  DDP/NCCL process groups (reference ``pretraining/*/ddputils.py``),
- one jitted train step per objective with in-step mask sampling via
  ``jax.random`` instead of per-sample numpy masks in the host loop
  (reference ``pretraining/generative/pretrain_videomae.py:292-298``),
- pure-functional models with explicit parameter pytrees, bf16 compute /
  f32 state, static shapes throughout,
- a host-side, per-process-sharded input pipeline with async device
  prefetch (reference hides decode in torch DataLoader workers),
- the curriculum as a first-class Python driver (reference encodes it in
  ``slurmscripts/*.bash``).

Layer map (mirrors SURVEY.md §1, unified instead of copy-pasted per trainer):

- ``parallel/``   L0 distributed runtime: mesh, shardings, collectives
- ``data/``       L1 data layer: index math, transforms, datasets, loader
- ``masks/``      L2 masking: tube/random, multi-block (JEPA) collator
- ``models/``     L3 models: ViT video/image, VideoMAE, predictor, ResNet
- ``ops/``        hot ops: attention (Pallas flash attn), patchify
- ``objectives/`` losses: norm-pix MSE, smooth-L1, NT-Xent
- ``training/``   L4 train loops: jitted steps, optim, EMA, checkpoints
- ``evalbench/``  L4 eval: embedding extraction, probes, evaluators
- ``curriculum/`` L5 orchestration: stage driver replacing slurmscripts
- ``utils/``      cross-cutting: config, run-id codec, logging, profiling
"""

__version__ = "0.3.0"
