from deeplio_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from deeplio_tpu.parallel import multihost
from deeplio_tpu.parallel.multihost import (
    is_primary,
    make_global_batch,
    maybe_initialize,
)
