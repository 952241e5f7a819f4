"""Parity tests for FFT bandpass, Hilbert phase, STFT and Welch PSD."""

import numpy as np
import pytest
import scipy.signal as sps

import jax.numpy as jnp

from eyegaze_tpu.ops import (
    analytic_band_parts,
    bandpass_fft,
    instantaneous_phase,
    stft,
    stft_magnitude,
    welch_psd,
)
from eyegaze_tpu.ops.spectral import BAND_DEFS_6
from tests.golden import reference_port as ref

FS = 256.0


@pytest.fixture(scope="module")
def sig():
    r = np.random.default_rng(3)
    return r.normal(size=(2, 4, 512)).astype(np.float32)


def test_bandpass_fft_parity(sig):
    got = np.asarray(bandpass_fft(jnp.asarray(sig), 8.0, 13.0, FS))
    want = ref.bandpass_filter_fft(sig.astype(np.float64), 8.0, 13.0, FS)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_hilbert_phase_parity(sig):
    band = ref.bandpass_filter_fft(sig.astype(np.float64), 4.0, 8.0, FS)
    got = np.asarray(instantaneous_phase(jnp.asarray(band.astype(np.float32))))
    want = ref.compute_phase(band)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_analytic_fuses_bandpass_and_hilbert(sig):
    """band part == bandpass; arctan2(quad, band) == hilbert phase of bandpass."""
    band_all, quad_all = analytic_band_parts(jnp.asarray(sig), FS, BAND_DEFS_6)
    band_all, quad_all = np.asarray(band_all), np.asarray(quad_all)
    for bi, (_, lo, hi) in enumerate(BAND_DEFS_6):
        band = ref.bandpass_filter_fft(sig.astype(np.float64), lo, hi, FS)
        np.testing.assert_allclose(band_all[bi], band, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.arctan2(quad_all[bi], band_all[bi]), ref.compute_phase(band),
            rtol=1e-3, atol=2e-3,
        )


def test_matmul_backend_equivalence(sig, monkeypatch):
    """The MXU matmul-DFT backend must match the fft backend bit-for-tolerance."""
    import eyegaze_tpu.ops.spectral as sp

    b_f, q_f = analytic_band_parts(jnp.asarray(sig), FS, BAND_DEFS_6)
    mag_f = stft_magnitude(jnp.asarray(sig[0]), 128, 64)
    _, psd_f = welch_psd(jnp.asarray(sig), FS, nperseg=128)
    bp_f = bandpass_fft(jnp.asarray(sig), 8.0, 13.0, FS)
    monkeypatch.setenv("EYEGAZE_DFT_BACKEND", "matmul")
    assert sp.dft_backend() == "matmul"
    b_m, q_m = analytic_band_parts(jnp.asarray(sig), FS, BAND_DEFS_6)
    mag_m = stft_magnitude(jnp.asarray(sig[0]), 128, 64)
    _, psd_m = welch_psd(jnp.asarray(sig), FS, nperseg=128)
    bp_m = bandpass_fft(jnp.asarray(sig), 8.0, 13.0, FS)
    np.testing.assert_allclose(np.asarray(b_m), np.asarray(b_f), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(q_m), np.asarray(q_f), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(mag_m), np.asarray(mag_f), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(psd_m), np.asarray(psd_f), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bp_m), np.asarray(bp_f), rtol=1e-3, atol=1e-3)


def test_connectivity_matmul_backend_parity(monkeypatch):
    """Connectivity under the matmul backend matches the golden port."""
    from eyegaze_tpu.ops import connectivity_matrices

    monkeypatch.setenv("EYEGAZE_DFT_BACKEND", "matmul")
    r = np.random.default_rng(21)
    e1 = r.normal(size=(1, 4, 128)).astype(np.float32)
    e2 = r.normal(size=(1, 4, 128)).astype(np.float32)
    got = np.asarray(connectivity_matrices(jnp.asarray(e1), jnp.asarray(e2), FS, row_chunk=4))
    want = ref.connectivity_matrices(e1.astype(np.float64), e2.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_stft_matches_torch_convention():
    r = np.random.default_rng(5)
    x = r.normal(size=(3, 1024)).astype(np.float32)
    got = np.abs(np.asarray(stft(jnp.asarray(x), n_fft=128, hop_length=64)))
    want = ref.torch_stft_magnitude(x.astype(np.float64), n_fft=128, hop=64)
    assert got.shape == (3, 65, 17)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_stft_against_torch_if_available():
    torch = pytest.importorskip("torch")
    r = np.random.default_rng(6)
    x = r.normal(size=(2, 1024)).astype(np.float32)
    got = np.abs(np.asarray(stft(jnp.asarray(x), 128, 64)))
    ts = torch.stft(
        torch.from_numpy(x), n_fft=128, hop_length=64,
        window=torch.hann_window(128), return_complex=True, center=True,
    )
    want = ts.abs().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_welch_psd_scipy_parity():
    r = np.random.default_rng(7)
    x = r.normal(size=(4, 1024)).astype(np.float32)
    f_got, p_got = welch_psd(jnp.asarray(x), FS, nperseg=256)
    f_want, p_want = sps.welch(x.astype(np.float64), fs=FS, nperseg=256, noverlap=128)
    np.testing.assert_allclose(np.asarray(f_got), f_want)
    np.testing.assert_allclose(np.asarray(p_got), p_want, rtol=1e-3, atol=1e-6)


def test_factored_band_synthesis_matches_dense():
    """banded_analytic_parts (shared rDFT + narrow per-band synthesis) must
    equal the dense (n, n) band/Hilbert matrix route exactly (same FFT-mask
    semantics, ~5x fewer FLOPs)."""
    from eyegaze_tpu.ops import dft

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 4, 512)).astype(np.float32))
    filt, hilb, _ = dft.band_matrices(512, FS, BAND_DEFS_6)
    band_d = jnp.einsum("...t,ktu->k...u", x, filt)
    quad_d = jnp.einsum("...t,ktu->k...u", x, hilb)
    band_f, quad_f = dft.banded_analytic_parts(x, 512, FS, BAND_DEFS_6)
    np.testing.assert_allclose(np.asarray(band_f), np.asarray(band_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(quad_f), np.asarray(quad_d),
                               rtol=1e-4, atol=1e-4)


def test_banded_analytic_parts_empty_band_matches_dense():
    """A band with no rfft bins must return zeros (dense-mask semantics),
    not raise IndexError (round-3 advisor fix)."""
    import numpy as np

    from eyegaze_tpu.ops import dft

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64)).astype(np.float32))
    # 64 samples @ 64 Hz -> 1 Hz bins; (1.2, 1.8) contains no bin.
    bands = (("empty", 1.2, 1.8), ("ok", 4.0, 8.0))
    band, quad = dft.banded_analytic_parts(x, 64, 64.0, bands)
    assert band.shape == (2, 2, 64)
    np.testing.assert_array_equal(np.asarray(band[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(quad[0]), 0.0)
    assert float(jnp.abs(band[1]).max()) > 0
