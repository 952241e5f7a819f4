"""Mesh setup + data-parallel sharding.

The reference is single-GPU/single-process (SURVEY.md §5.8 — no
torch.distributed anywhere); the models here are 5-90M params, so the right
scale-out axis is pure DATA parallelism: a 1-D ``jax.sharding.Mesh`` over the
batch axis, parameters replicated, gradients all-reduced by XLA over ICI.
``data_parallel_jit`` wraps a train step with in/out shardings so the same
code runs on 1 chip, a v5e pod slice, or the 8-device virtual CPU mesh used
in tests — no NCCL/MPI translation, just sharding annotations.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device_put a pytree of host arrays with batch-axis sharding."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_jit(step_fn: Callable, donate_argnums: Sequence[int] = (0,)):
    """jit a (state, batch, ...) -> (state, aux) step for data parallelism.

    Computation follows sharding: put the state on the mesh replicated
    (``replicate``) and the batch sharded on its leading axis
    (``shard_batch``); XLA propagates the shardings through the step and
    inserts the gradient all-reduce over ICI automatically — no explicit
    psum/collective code needed.
    """
    return jax.jit(step_fn, donate_argnums=tuple(donate_argnums))
