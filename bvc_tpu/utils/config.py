"""Typed configuration for the whole framework.

The reference scatters its configuration across ~20 argparse flags per entry
point plus hard-coded constants that silently override them (e.g.
``mask_ratio=0.9`` re-set at ``pretraining/generative/pretrain_videomae.py:240``,
``num_workers=6`` at ``:204``, ``image_size=224`` at ``pretrain_jepa.py:184``,
tau=0.1 at ``pretrain_simclr.py:284``).  Here every knob lives in one typed
config; the CLI layer (bvc_tpu/cli) maps the reference's flags onto it and the
curriculum driver (bvc_tpu/curriculum) fills per-stage overrides.

Also hosts the run-id codec.  The reference's run-id format
``${curr}_${stage}_${train_group}_${condition}_${fold}_${seed}`` is a
load-bearing artifact contract: checkpoints are named ``model_{run_id}`` and
the evaluation notebook parses metadata back out of the filename
(``notebooks/EvaluateEmbeddings.ipynb`` cell 9, ``parse_fname``).  We preserve
it exactly.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any


# --------------------------------------------------------------------------
# Run-id codec
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class RunId:
    """Codec for the ``{curr}_{stage}_{group}_{condition}_{fold}_{seed}`` contract.

    Mirrors ``parse_fname`` in the reference notebook (cell 9) and the
    ``run_id=`` assembly in e.g. ``slurmscripts/generative/slurm_dev_def.bash:99``.
    """

    curriculum: str  # 'dev' | 'adev' | 'rnd' | 'adult' | ... (free-form)
    stage: int
    train_group: str  # 'g0' | 'g1' | 'g2' | 'g3' | 'gr' | 'na'
    condition: str  # 'default' | 'shuffle' | 'static' | 'MatchedSpatial' | ...
    fold: int
    seed: int

    def __str__(self) -> str:
        return "_".join(
            [
                self.curriculum,
                str(self.stage),
                self.train_group,
                self.condition,
                str(self.fold),
                str(self.seed),
            ]
        )

    @staticmethod
    def parse(run_id: str) -> "RunId":
        parts = run_id.split("_")
        if len(parts) < 6:
            # Degenerate ids (e.g. untrained baselines named with 'na') parse
            # the way the notebook's parse_fname treats them.
            return RunId("untrained", 0, "na", "na", 0, 0)
        # condition may itself contain no '_' in the reference corpus; the
        # first two and last two fields are unambiguous.
        curr, stage = parts[0], int(parts[1])
        fold, seed = int(parts[-2]), int(parts[-1])
        group = parts[2]
        condition = "_".join(parts[3:-2])
        return RunId(curr, stage, group, condition, fold, seed)

    @staticmethod
    def from_checkpoint_path(fp: str | Path) -> "RunId":
        """Invert the ``model_{run_id}`` checkpoint naming.

        Reference: ``benchmarks/compute_embeddings_videomae.py:129-131``
        (``get_run_id``).
        """
        name = Path(fp).name
        for prefix in ("model_",):
            if name.startswith(prefix):
                name = name[len(prefix):]
        for suffix in (".pth.tar", ".ckpt", ".msgpack", ".npz"):
            if name.endswith(suffix):
                name = name[: -len(suffix)]
        return RunId.parse(name)

    def train_groups_seen(self) -> str:
        """Cumulative groups after this stage, as the notebook reports them.

        ``get_traingroups`` (notebook cell 9): dev → 'g0g1g2'[:2*stage],
        adev → 'g2g1g0'[:2*stage], otherwise 'na'.
        """
        if self.curriculum == "dev":
            return "g0g1g2"[: 2 * self.stage]
        if self.curriculum == "adev":
            return "g2g1g0"[: 2 * self.stage]
        return "na"


# --------------------------------------------------------------------------
# Component configs
# --------------------------------------------------------------------------


@dataclass
class DataConfig:
    """Input-pipeline knobs (reference CLI flags + homeview constants)."""

    jpg_root: str = ""
    train_group: str = "g0"
    ds_rate: int = 1
    fold: int = 0
    num_folds: int = 3  # 'max_folds' at generative/homeview.py:33
    condition: str = "default"
    n_trainsamples: int = 81000
    num_frames: int = 16
    tubelet_size: int = 2
    image_size: int = 224
    interval: int = 0  # pair sampling gap (predictive/contrastive)
    augs: str = "n"  # subset of 'cjbgo'
    crop_scale: tuple[float, float] = (1.0, 1.0)
    keep_val: bool = False  # keep_val=='y' → val_ratio 0.1, else 0
    batch_size: int = 16  # per-device batch
    shuffle: bool = True
    seed: int = 0
    num_workers: int = 6  # host decode threads
    prefetch: int = 2  # device prefetch depth
    # ship uint8 frames and normalize inside the jitted step (less H2D)
    feed_uint8: bool = True
    # Frames per contiguous fold segment: 30 min * 60 s * 30 fps / ds_rate
    # (generative/homeview.py:158).
    segment_minutes: float = 30.0
    native_fps: float = 30.0
    # Matched-complexity control data root ('controls.py:44-49')
    control_data_root: str = ""
    # Packed-corpus root (bvc_tpu/data/packed.py): plain transforms read
    # pre-resized uint8 memmaps instead of decoding JPEGs per step
    pack_root: str = ""

    @property
    def segment_size(self) -> int:
        return int(self.segment_minutes * 60 * self.native_fps / self.ds_rate)


@dataclass
class ModelConfig:
    """Architecture knobs shared across the three model families."""

    family: str = "videomae"  # 'videomae' | 'jepa' | 'simclr'
    architecture: str = "base"  # vit size key or resnet name
    image_size: int = 224
    patch_size: int = 16
    num_frames: int = 16
    tubelet_size: int = 2
    in_channels: int = 3
    # encoder
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    # decoder (VideoMAE) / predictor (JEPA)
    decoder_hidden_size: int = 384
    decoder_depth: int = 4
    decoder_num_heads: int = 6
    pred_depth: int = 6
    pred_emb_dim: int = 384
    norm_pix_loss: bool = True
    use_mean_pooling: bool = True
    init_std: float = 0.02
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    # compute
    dtype: str = "bfloat16"  # activation/compute dtype
    remat: bool = False  # jax.checkpoint each block
    # Store the JEPA target encoder's attention logits in bf16 (f32
    # softmax math).  The reference runs this no-grad pass under torch
    # autocast-bf16 (pretrain_jepa.py:405-409), which quantizes its qk
    # logits at the same point; False keeps full-f32 logits.  The train
    # step disables it in f32 compute mode (dtype != 'bfloat16' means
    # "no autocast"), matching autocast_scores below.
    target_score_bf16: bool = True
    # bf16-stored attention logits on the JEPA GRADIENT paths (context
    # encoder + predictor); active only in bf16 compute mode.  The
    # reference's whole forward runs under torch autocast-bf16
    # (pretrain_jepa.py:405-409), so its scores — and the grads flowing
    # through them — are bf16-quantized at exactly this point.  Measured
    # on v5e: JEPA bs 64 230.0 → 247.1 clips/s with the step-20 loss
    # identical to 5 decimals (tools/probe_r3.py jepa_ac).  The VideoMAE
    # encoder deliberately does NOT route through this (measured a ~1%
    # loss at its 160-token shape, see models/videomae.py); its decoder
    # uses VMEM-resident flash scores.  False restores full-f32
    # gradient-path scores (pre-round-3 numerics).
    autocast_scores: bool = True

    @property
    def tokens_per_frame(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_time_steps(self) -> int:
        return self.num_frames // self.tubelet_size

    @property
    def seq_len(self) -> int:
        return self.num_time_steps * self.tokens_per_frame


@dataclass
class MaskConfig:
    """Masking knobs for both mask families (SURVEY.md §2.3)."""

    # VideoMAE tube / random masking
    sampler: str = "tube"  # 'tube' | 'random'
    mask_ratio: float = 0.9
    # JEPA multi-block collator
    enc_mask_scale: tuple[float, float] = (0.85, 1.0)
    pred_mask_scale: tuple[float, float] = (0.15, 0.2)
    aspect_ratio: tuple[float, float] = (0.75, 1.5)
    num_enc_masks: int = 1
    num_pred_masks: int = 4
    min_keep: int = 10
    allow_overlap: bool = False


@dataclass
class OptimConfig:
    name: str = "sgd"  # 'sgd' | 'adamw' | 'adam'
    lr: float = 0.1
    weight_decay: float = 0.0
    momentum: float = 0.9
    nesterov: bool = True
    adam_b1: float = 0.9
    adam_b2: float = 0.95
    # JEPA weight-decay exclusion for biases & 1-D params
    # (predictive/helper.py:128-141)
    exclude_bias_and_norm_from_wd: bool = False
    # EMA ramp for the JEPA target encoder (pretrain_jepa.py:309-311)
    ema: tuple[float, float] = (0.996, 1.0)
    ema_fallback: float = 0.998
    # SimCLR negative scope: 'global' (all chips) or 'per_replica'
    # (reference per-rank parity — SURVEY.md §2.5)
    contrastive_negatives: str = "global"
    # SimCLR BatchNorm statistics: 'global' (SyncBN, the SPMD default)
    # or 'per_replica' (reference DDP per-rank BN parity)
    bn_stats: str = "global"
    # LR schedule. The reference imports I-JEPA's WarmupCosineSchedule /
    # CosineWDSchedule but ships them disabled (scheduler=None,
    # predictive/helper.py:148-161); 'none' keeps that constant-lr
    # behavior.  'warmup_cosine' enables the commented-out design:
    # linear warmup start_lr→lr over warmup_epochs, then cosine decay
    # lr→final_lr over ipe_scale*n_epoch epochs of steps.
    schedule: str = "none"  # 'none' | 'warmup_cosine'
    warmup_epochs: float = 0.0
    start_lr: float = 0.0
    final_lr: float = 0.0
    # cosine weight-decay schedule weight_decay→final_wd over the same
    # horizon (CosineWDSchedule); None disables (constant wd)
    final_wd: float | None = None
    ipe_scale: float = 1.25
    # >1: split each batch into this many sequential microbatches and
    # average their gradients before the single optimizer step — same
    # effective batch at ~k× lower activation memory (videomae/jepa only;
    # InfoNCE couples the batch so SimCLR refuses it)
    grad_accum_steps: int = 1


@dataclass
class TrainConfig:
    run_id: str = ""
    savedir: str = ""
    init_checkpoint_path: str = "na"
    # mid-stage preemption recovery (beyond the reference, whose resume
    # granularity is the curriculum stage — SURVEY.md §5): checkpoint each
    # epoch and pick up from our own model_{run_id}.ckpt when present
    save_every_epoch: bool = False
    # overlap checkpoint serialization with training (single-host):
    # snapshot to host synchronously, write on a background thread
    # (bvc_tpu.training.async_checkpoint)
    async_save: bool = False
    resume: bool = False
    n_epoch: int = 1
    max_epoch_iters: int = 0  # 0 → as many as the data allows
    seed: int = 0
    log_freq: int = 10
    # opt-in fuller grad_logger stats table (device-side avg/min/max over
    # per-layer grad norms; surfaces in the INFO log line, CSV unchanged)
    log_grad_stats: bool = False
    # capture one jax.profiler trace (steps 1-3 of the run) to this dir;
    # "" disables — the XLA-timeline upgrade of the reference's gpu_timer
    profile_dir: str = ""
    script: str = ""
    # parallelism
    mesh_shape: dict[str, int] = field(default_factory=dict)  # {} → all 'data'
    param_sharding: str = "replicated"  # 'replicated' | 'fsdp' | 'tp'
    # GPipe microbatches per step when the mesh has a 'pipe' axis
    # (parallel/pipeline.py; bubble = (P−1)/(M+P−1) per pipelined stack)
    pipe_microbatches: int = 4
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    mask: MaskConfig = field(default_factory=MaskConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def dump_yaml(self, path: str | Path) -> None:
        """Provenance dump, reference ``pretrain_jepa.py:206-209``
        (``params_{run_id}.yaml``)."""
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "TrainConfig":
        def build(cls, sub):
            kwargs = {}
            for f_ in dataclasses.fields(cls):
                if f_.name not in sub:
                    continue
                v = sub[f_.name]
                if dataclasses.is_dataclass(f_.type) or f_.name in (
                    "data",
                    "model",
                    "mask",
                    "optim",
                ):
                    v = build(
                        {
                            "data": DataConfig,
                            "model": ModelConfig,
                            "mask": MaskConfig,
                            "optim": OptimConfig,
                        }[f_.name],
                        v,
                    )
                elif isinstance(v, list):
                    v = tuple(v)
                kwargs[f_.name] = v
            return cls(**kwargs)

        return build(TrainConfig, d)
