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


def test_widened_plv_kernel_matches_matmul_plv(inputs):
    """The widened 5-output kernel's PLV (cos/sin of the dphi tile) must match
    the production 4-matmul PLV formulation (VERDICT r2 #6 experiment)."""
    from eyegaze_tpu.ops.connectivity import _plv_matrix
    from eyegaze_tpu.ops.pallas_kernels import pairwise_phase_plv_metrics

    ph1, ph2, pw1, pw2 = inputs
    plv_k, pli_k, wpli_k, pdiff_k = pairwise_phase_plv_metrics(
        ph1, ph2, pw1, pw2, interpret=True)
    c1, s1 = jnp.cos(ph1), jnp.sin(ph1)
    c2, s2 = jnp.cos(ph2), jnp.sin(ph2)
    plv_m = _plv_matrix(c1, s1, c2, s2)
    np.testing.assert_allclose(np.asarray(plv_k), np.asarray(plv_m),
                               rtol=1e-4, atol=1e-5)
    pli_f, wpli_f, pdiff_f = _pairwise_phase_metrics(ph1, ph2, pw1, pw2,
                                                     eps=1e-8, row_chunk=4)
    np.testing.assert_allclose(np.asarray(pli_k), np.asarray(pli_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wpli_k), np.asarray(wpli_f),
                               rtol=1e-4, atol=1e-5)
