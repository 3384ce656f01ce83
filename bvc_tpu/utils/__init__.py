from bvc_tpu.utils.config import (  # noqa: F401
    RunId,
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    MaskConfig,
)
from bvc_tpu.utils.logging import (  # noqa: F401
    CSVLogger,
    AverageMeter,
    get_logger,
    main_process_only_print,
)
from bvc_tpu.utils.profiling import StepTimer, device_memory_stats  # noqa: F401
