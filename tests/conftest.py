"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Keeps the test suite hardware-independent while still exercising the
multi-chip sharding paths (tests/test_parallel.py).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent compile cache under the CPU test lane: XLA:CPU AOT cache
# entries record the COMPILING machine's features, and an entry written by
# the relay host "could lead to execution errors such as SIGILL" when
# loaded here (observed 2026-08-21 in the virtual-mesh dryrun).  CPU
# compiles are local and fast — the cache only pays for TPU relay compiles.
os.environ.setdefault("EYEGAZE_COMPILE_CACHE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon site hook sets jax.config.jax_platforms at interpreter start,
# which overrides the env var — force CPU through the config API too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
