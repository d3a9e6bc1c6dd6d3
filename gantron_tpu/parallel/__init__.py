from gantron_tpu.parallel.distributed import barrier
from gantron_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                       pad_batch_rows, replicate_sharding,
                                       shard_batch, shard_state)

__all__ = ["barrier", "make_mesh", "batch_sharding", "pad_batch_rows",
           "replicate_sharding", "shard_batch", "shard_state"]
