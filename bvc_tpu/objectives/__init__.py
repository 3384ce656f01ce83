from bvc_tpu.objectives.contrastive import info_nce_loss, interleaved_pair_masks  # noqa: F401
