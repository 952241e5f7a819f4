"""Device-mesh parallelism: DP batch sharding + Megatron-style TP over ICI."""

from eyegaze_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    data_parallel_jit,
)
from eyegaze_tpu.parallel.sharding import (
    TP_RULES,
    make_mesh_2d,
    parse_mesh_spec,
    partition_spec_for,
    shard_tp,
)
