"""Equivalence tests for the Pallas IBS kernel (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eyegaze_tpu.ops.connectivity import _pairwise_phase_metrics
from eyegaze_tpu.ops.pallas_kernels import pairwise_phase_metrics


@pytest.fixture(scope="module")
def inputs():
    r = np.random.default_rng(0)
    b, c, t = 3, 8, 256
    ph1 = r.uniform(-np.pi, np.pi, (b, c, t)).astype(np.float32)
    ph2 = r.uniform(-np.pi, np.pi, (b, c, t)).astype(np.float32)
    pw1 = r.random((b, c, t)).astype(np.float32)
    pw2 = r.random((b, c, t)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (ph1, ph2, pw1, pw2))


def test_pallas_matches_fallback(inputs):
    ph1, ph2, pw1, pw2 = inputs
    pli_p, wpli_p, pdiff_p = pairwise_phase_metrics(ph1, ph2, pw1, pw2,
                                                    interpret=True)
    pli_f, wpli_f, pdiff_f = _pairwise_phase_metrics(ph1, ph2, pw1, pw2,
                                                     eps=1e-8, row_chunk=4)
    np.testing.assert_allclose(np.asarray(pli_p), np.asarray(pli_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wpli_p), np.asarray(wpli_f),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pdiff_p), np.asarray(pdiff_f),
                               rtol=1e-5, atol=1e-5)
