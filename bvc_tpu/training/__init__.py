from bvc_tpu.training.optim import make_optimizer  # noqa: F401
from bvc_tpu.training.state import TrainState  # noqa: F401
