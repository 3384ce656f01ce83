from bvc_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    distributed_init,
    DATA_AXIS,
    MODEL_AXIS,
)
from bvc_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    replicated_sharding,
    param_shardings,
    shard_batch,
    host_local_batch_slice,
)
from bvc_tpu.parallel.collectives import (  # noqa: F401
    all_gather_objects,
    sync_hosts,
)
