"""Golden parity tests: vectorized TPU connectivity vs literal NumPy port."""

import numpy as np
import pytest

import jax.numpy as jnp

from eyegaze_tpu.ops import connectivity_matrices, connectivity_scalars, feature_indices_for
from tests.golden import reference_port as ref

B, C, T = 2, 8, 256
FS = 256.0


@pytest.fixture(scope="module")
def eeg_pair():
    r = np.random.default_rng(0)
    e1 = r.normal(size=(B, C, T)).astype(np.float32)
    e2 = r.normal(size=(B, C, T)).astype(np.float32)
    # Add shared oscillations so phase metrics aren't pure noise.
    t = np.arange(T) / FS
    for f in (6.0, 10.0, 22.0):
        osc = np.sin(2 * np.pi * f * t)
        e1 += 0.5 * osc
        e2 += 0.5 * np.roll(osc, 3)
    return e1, e2


def test_matrix_parity(eeg_pair):
    e1, e2 = eeg_pair
    got = np.asarray(
        connectivity_matrices(jnp.asarray(e1), jnp.asarray(e2), FS, row_chunk=4)
    )
    want = ref.connectivity_matrices(e1.astype(np.float64), e2.astype(np.float64))
    assert got.shape == (B, 6, 7, C, C)
    # Feature-wise tolerance: float32 FFT/matmul accumulation gives ~5e-4 max
    # error vs the float64 golden (phase error is amplified where the analytic
    # amplitude is near zero); 1e-3 is the documented parity tolerance.
    for f in range(7):
        np.testing.assert_allclose(
            got[:, :, f], want[:, :, f], rtol=1e-3, atol=1e-3,
            err_msg=f"feature {f} mismatch",
        )


def test_matrix_value_ranges(eeg_pair):
    e1, e2 = eeg_pair
    m = np.asarray(connectivity_matrices(jnp.asarray(e1), jnp.asarray(e2), FS, row_chunk=4))
    plv, pli, wpli, coh = m[:, :, 0], m[:, :, 1], m[:, :, 2], m[:, :, 3]
    assert (plv >= -1e-4).all() and (plv <= 1 + 1e-3).all()
    assert (pli >= -1e-4).all() and (pli <= 1 + 1e-3).all()
    assert (wpli >= -1e-4).all() and (wpli <= 1 + 1e-3).all()
    assert (coh >= -1e-4).all() and (coh <= 1 + 1e-3).all()
    corr = m[:, :, (4, 6)]
    assert (np.abs(corr) <= 1 + 1e-3).all()


def test_feature_subsets(eeg_pair):
    e1, e2 = eeg_pair
    full = np.asarray(connectivity_matrices(jnp.asarray(e1), jnp.asarray(e2), FS, row_chunk=4))
    phase = np.asarray(
        connectivity_matrices(jnp.asarray(e1), jnp.asarray(e2), FS, feature_type="phase", row_chunk=4)
    )
    amp = np.asarray(
        connectivity_matrices(jnp.asarray(e1), jnp.asarray(e2), FS, feature_type="amplitude", row_chunk=4)
    )
    assert phase.shape[2] == 4 and amp.shape[2] == 3
    np.testing.assert_allclose(phase, full[:, :, list(feature_indices_for("phase"))])
    np.testing.assert_allclose(amp, full[:, :, list(feature_indices_for("amplitude"))])


def test_scalar_parity(eeg_pair):
    e1, e2 = eeg_pair
    got = np.asarray(connectivity_scalars(jnp.asarray(e1), jnp.asarray(e2), FS))
    want = ref.connectivity_scalars(e1.astype(np.float64), e2.astype(np.float64))
    assert got.shape == (B, 28)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_plv_self_is_one():
    """PLV of a signal with itself (same band) must be exactly 1 on the diagonal."""
    r = np.random.default_rng(1)
    e = r.normal(size=(1, 4, 128)).astype(np.float32)
    m = np.asarray(connectivity_matrices(jnp.asarray(e), jnp.asarray(e), FS, row_chunk=4))
    diag_plv = np.diagonal(m[:, :, 0], axis1=-2, axis2=-1)
    np.testing.assert_allclose(diag_plv, 1.0, atol=1e-3)
