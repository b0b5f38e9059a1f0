"""Device-mesh / sharding helpers (GSPMD data parallelism)."""

from mobileposer_tpu.parallel.distributed import (  # noqa: F401
    global_batch_from_host_slices,
    host_local_batch_slice,
    initialize_distributed,
)
from mobileposer_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    pad_batch_to_multiple,
    replicate_params,
    replicated,
    shard_batch,
    shard_stream_state,
)
