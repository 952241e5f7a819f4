"""Golden parity tests for the offline feature-extraction connectivity."""

import numpy as np
import pytest

import jax.numpy as jnp

from eyegaze_tpu.ops.features import (
    FEATURE_BANDS_5,
    band_energy,
    inter_connectivity,
    intra_connectivity,
)
from tests.golden import feature_port as ref

C, T, FS = 4, 768, 250.0


@pytest.fixture(scope="module")
def eeg_pair():
    r = np.random.default_rng(9)
    e1 = r.normal(size=(C, T)).astype(np.float32)
    e2 = r.normal(size=(C, T)).astype(np.float32)
    t = np.arange(T) / FS
    for f in (5.0, 10.0, 20.0, 35.0):
        osc = np.sin(2 * np.pi * f * t).astype(np.float32)
        e1 += 0.4 * osc
        e2 += 0.4 * np.roll(osc, 5)
    return e1, e2


def test_inter_connectivity_parity(eeg_pair):
    e1, e2 = eeg_pair
    got = np.asarray(inter_connectivity(jnp.asarray(e1), jnp.asarray(e2), FS, row_chunk=4))
    want = ref.inter_connectivity(e1.astype(np.float64), e2.astype(np.float64), FS)
    assert got.shape == (7, 5, C, C)
    # PLI (idx 3) takes sign() of sin(dphi); when channels share an
    # oscillation, sin(dphi) hovers near zero for long stretches and ANY two
    # float implementations disagree by ~2/T per flipped sample (verified:
    # the float32 vs float64 literal ports differ by the same magnitude).
    # The metric is discontinuous there — tolerance reflects that, not a bug.
    for mi in range(7):
        tol = 1e-1 if mi == 3 else 2e-3
        np.testing.assert_allclose(
            got[mi], want[mi], rtol=tol, atol=tol, err_msg=f"metric {mi}",
        )


def test_intra_connectivity_parity(eeg_pair):
    e1, _ = eeg_pair
    got = np.asarray(intra_connectivity(jnp.asarray(e1), FS, row_chunk=4))
    want = ref.intra_connectivity(e1.astype(np.float64), FS)
    assert got.shape == (7, 5, C, C)
    for mi in range(7):
        tol = 1e-1 if mi == 3 else 2e-3  # see PLI note in the inter test
        np.testing.assert_allclose(got[mi], want[mi], rtol=tol, atol=tol,
                                   err_msg=f"metric {mi}")
    # Intra diagonal sanity: pearson/PLV self-connectivity is exactly 1.
    np.testing.assert_allclose(np.diagonal(got[0], axis1=-2, axis2=-1), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.diagonal(got[2], axis1=-2, axis2=-1), 1.0, atol=1e-3)


def test_band_energy(eeg_pair):
    e1, _ = eeg_pair
    be = np.asarray(band_energy(jnp.asarray(e1), FS))
    assert be.shape == (C, 5)
    assert (be >= 0).all()
    # 10 Hz component boosts alpha (8-12) over delta.
    t = np.arange(T) / FS
    alpha_sig = np.tile(np.sin(2 * np.pi * 10 * t), (C, 1)).astype(np.float32)
    be2 = np.asarray(band_energy(jnp.asarray(alpha_sig), FS))
    assert (be2[:, 2] > be2[:, 0]).all()
