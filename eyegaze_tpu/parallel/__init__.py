"""Device-mesh parallelism: data-parallel sharding over ICI."""

from eyegaze_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    data_parallel_jit,
)
