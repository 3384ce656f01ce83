from bvc_tpu.ops.patchify import tubelet_patchify, patchify_pixels  # noqa: F401
from bvc_tpu.ops.attention import multi_head_attention  # noqa: F401
