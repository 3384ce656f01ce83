from bvc_tpu.masks.tube import tube_mask, random_mask, mask_partition  # noqa: F401
