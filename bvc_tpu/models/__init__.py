from bvc_tpu.models import posenc  # noqa: F401
from bvc_tpu.models import vit  # noqa: F401
