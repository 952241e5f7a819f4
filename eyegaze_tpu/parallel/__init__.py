"""Device-mesh parallelism: DP batch sharding + Megatron-style TP over ICI.

Scope decision (SURVEY.md §5.8 — the reference is single-GPU, so every axis
here is beyond-parity headroom): DP is the primary scale-out (models are
5-90M params; throughput grows with chips at fixed per-chip batch), TP is
the latency axis for the ViT-B family (86M params, big dense matmuls).
Deliberately ABSENT: pipeline parallelism (no model here comes within two
orders of magnitude of one chip's HBM — PP's bubble overhead buys nothing),
sequence parallelism (max sequence is ART's 1024 tokens, whose attention
already runs as a Pallas flash kernel without materializing scores), and
expert parallelism (no MoE layers exist in the model zoo).
"""

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
from eyegaze_tpu.parallel.multihost import (
    global_batch_size,
    host_local_to_global,
    initialize_multihost,
    process_shard_bounds,
)
