"""Multi-process (multi-host) data parallelism: the SPMD contract.

SURVEY.md §5.8 names "host-local data loading per process" as part of the
designed communication layer; everything else in ``parallel/`` is
single-process (one Python process sees every device of the mesh).  This
module adds the multi-controller path JAX uses on real multi-host pods:

- every host runs the SAME program (``jax.distributed.initialize`` wires the
  coordinator), and ``jax.devices()`` then spans the whole pod while
  ``jax.local_devices()`` is this host's chips;
- each process loads ONLY its shard of every global batch (host-local
  loading — no host ever materializes the global batch), and
  ``jax.make_array_from_process_local_data`` assembles the logical global
  array from the per-process pieces without any cross-host data movement:
  the batch axis sharding already places each host's examples on its own
  local devices, so the "assembly" is pure metadata;
- the jitted train step is UNCHANGED: XLA sees one global program over the
  global mesh and inserts the gradient all-reduce over ICI/DCN exactly as in
  the single-process virtual-mesh tests.

TESTED-HERE CAVEAT: this environment exposes one process (and one real TPU
chip behind a relay), so the multi-process path can only be CONTRACT-tested
single-process — ``tests/test_parallel.py::test_multihost_*`` pins the
sharding specs, the batch math, and the process_count==1 degenerate
equivalence with ``shard_batch``.  The ``jax.distributed.initialize`` call
itself (coordinator handshake, >1 process) is exercised only on a real
multi-host deployment; the arguments mirror jax's documented env-var
auto-detection (TPU pods populate them from the metadata server).

Reference scope note: the reference is single-GPU/single-process
(SURVEY.md §5.8 — no torch.distributed anywhere); this whole axis is
beyond-parity headroom, designed so the flagship trainers scale to a pod
with ``--multihost`` and zero model-code changes.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Join the multi-process runtime; returns (process_index, process_count).

    Call BEFORE any other jax API touches the backend (backend init pins the
    process topology).  With no arguments, jax auto-detects the coordinator
    from the environment (TPU pod metadata / ``JAX_COORDINATOR_ADDRESS`` et
    al.); explicit arguments override, matching
    ``jax.distributed.initialize``'s own contract.  Idempotent: a second
    call (or a single-process environment where initialize raises because
    nothing is configured) degrades to the current (index, count) so the
    same trainer script runs unchanged on one host.
    """
    import os

    configured = coordinator_address is not None or any(
        os.environ.get(k) for k in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"))
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        if configured:
            # A coordinator WAS configured: any failure to join — bad
            # address, handshake timeout, or calling after backend init —
            # must abort loudly instead of silently degrading to N
            # independent single-process trainings writing conflicting
            # checkpoints (round-5 review finding).  Only a repeat call
            # ("already initialized") is benign.
            if "already initialized" not in msg:
                raise
        else:
            # Nothing configured to join: benign when jax says there is no
            # coordinator (ValueError), the backend is already up in this
            # single-controller process, or initialize was already called.
            benign = (isinstance(e, ValueError)
                      or "already initialized" in msg
                      or "must be called before" in msg)
            if not benign:
                raise
        # jax.process_* stays authoritative either way.
    return jax.process_index(), jax.process_count()


def process_shard_bounds(
    n: int, process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Tuple[int, int]:
    """[start, stop) of THIS process's contiguous slice of n examples.

    Host-local loading contract: every process loads exactly
    ``n // process_count`` examples (n must divide evenly — trainer scripts
    drop the remainder up front, mirroring their drop-last batch policy), so
    each global batch decomposes into equal per-host pieces and
    ``host_local_to_global`` needs no padding logic.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if n % pc:
        raise ValueError(
            f"n={n} examples do not divide process_count={pc}; trim to a "
            f"multiple first (drop-last contract)")
    per = n // pc
    return pi * per, (pi + 1) * per


def host_local_to_global(batch: Any, mesh: Mesh,
                         axis_name: str = "data") -> Any:
    """Assemble per-process batch shards into global batch-sharded arrays.

    Each leaf of ``batch`` is this process's host-local slice (leading axis
    = global_batch / process_count).  The result is a pytree of global
    ``jax.Array``s whose leading axis is sharded over the mesh's
    ``axis_name`` — byte-identical to what ``shard_batch`` produces in the
    single-process case (pinned by test_multihost_single_process_equivalence)
    but built WITHOUT any host holding the global batch.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)


def global_batch_size(local_batch_size: int) -> int:
    """Global batch implied by a per-host batch (SPMD batch math)."""
    return local_batch_size * jax.process_count()


def fetch_local_shard(x: jax.Array) -> np.ndarray:
    """This host's rows of a batch-sharded global array, in batch order.

    ``np.asarray`` on a multi-host global array raises (non-addressable
    shards); the host-visible piece is the concatenation of the addressable
    shards, ordered by their batch-axis offsets.  Shards are DEDUPLICATED
    by batch-axis offset: under a 2-D (data, model) mesh a ``P("data")``
    array is replicated along the model axis, so each batch slice appears
    once per model-axis device — concatenating them verbatim duplicated
    every row (round-5 review finding, reproduced under dp4,tp2).
    Single-process on a 1-D mesh this is exactly ``np.asarray(x)`` (pinned
    by the contract test).
    """
    seen = set()
    picked = []
    for s in x.addressable_shards:
        start = s.index[0].start or 0 if x.ndim else 0
        if start not in seen:
            seen.add(start)
            picked.append((start, s))
    picked.sort(key=lambda t: t[0])
    return np.concatenate([np.asarray(s.data) for _, s in picked], axis=0)


def all_processes_concat(x: np.ndarray) -> np.ndarray:
    """Concatenate every process's host-local rows (process order).

    The eval pattern on a pod: each host computes logits for ITS shard of
    the val set, then gathers so every host scores the identical full set
    (``jax.experimental.multihost_utils.process_allgather`` — the documented
    production idiom).  Identity when single-process.
    """
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(x)
    return np.asarray(gathered).reshape((-1,) + x.shape[1:])
