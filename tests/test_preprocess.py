"""Parity tests for the on-device preprocessing pipeline vs scipy/numpy."""

import numpy as np
import pytest
import scipy.signal as sps

import jax.numpy as jnp

from eyegaze_tpu.ops import (
    bandpass_filtfilt_fir,
    common_average_reference,
    preprocess_eeg,
    sliding_windows,
    zscore,
)
from eyegaze_tpu.ops.entropy import spatial_entropy, spectral_entropy

FS = 250.0


@pytest.fixture(scope="module")
def eeg():
    r = np.random.default_rng(11)
    return r.normal(size=(3, 8, 1000)).astype(np.float32)


def test_filtfilt_scipy_parity(eeg):
    got = np.asarray(bandpass_filtfilt_fir(jnp.asarray(eeg), 0.5, 50.0, FS, order=4))
    b, a = sps.butter(4, [0.5 / (FS / 2), min(50.0 / (FS / 2), 0.99)], btype="band")
    want = sps.filtfilt(b, a, eeg.astype(np.float64), axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_filtfilt_pscan_parity(eeg):
    """Parallel (associative-scan) filtfilt vs scipy: same recursion, f32
    prefix-product conditioning costs ~2.4e-3 max-relative (documented in
    ops/preprocess.py); assert inside that envelope and well-correlated."""
    from eyegaze_tpu.ops.preprocess import bandpass_filtfilt_pscan

    got = np.asarray(bandpass_filtfilt_pscan(jnp.asarray(eeg), 0.5, 50.0, FS, order=4))
    b, a = sps.butter(4, [0.5 / (FS / 2), min(50.0 / (FS / 2), 0.99)], btype="band")
    want = sps.filtfilt(b, a, eeg.astype(np.float64), axis=-1)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 5e-3
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.99999


def test_filtfilt_blocked_parity(eeg):
    """Block-parallel (MXU-matmul) filtfilt vs scipy: exact recurrence solved
    per 128-sample block with f64-precomputed A-power constants — expected
    tighter than the pscan path's f32 prefix products."""
    from eyegaze_tpu.ops.preprocess import (
        bandpass_filtfilt_blocked,
        bandpass_filtfilt_pscan,
    )

    got = np.asarray(bandpass_filtfilt_blocked(jnp.asarray(eeg), 0.5, 50.0, FS, order=4))
    b, a = sps.butter(4, [0.5 / (FS / 2), min(50.0 / (FS / 2), 0.99)], btype="band")
    want = sps.filtfilt(b, a, eeg.astype(np.float64), axis=-1)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 5e-3
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.99999
    # Odd lengths exercise the end-padding path.
    odd = jnp.asarray(eeg[..., :-7])
    got_odd = np.asarray(bandpass_filtfilt_blocked(odd, 0.5, 50.0, FS, order=4))
    want_odd = sps.filtfilt(b, a, np.asarray(odd, np.float64), axis=-1)
    assert np.abs(got_odd - want_odd).max() / np.abs(want_odd).max() < 5e-3


def test_car(eeg):
    got = np.asarray(common_average_reference(jnp.asarray(eeg)))
    want = eeg - eeg.mean(axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert np.abs(got.mean(axis=1)).max() < 1e-5


def test_zscore_biased_std(eeg):
    got = np.asarray(zscore(jnp.asarray(eeg)))
    mean = eeg.mean(axis=-1, keepdims=True)
    std = eeg.std(axis=-1, keepdims=True)  # ddof=0, reference parity
    want = (eeg - mean) / (std + 1e-8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sliding_windows():
    x = np.arange(2 * 3 * 100, dtype=np.float32).reshape(2, 3, 100)
    w = np.asarray(sliding_windows(jnp.asarray(x), window_size=32, stride=16))
    assert w.shape == (2, (100 - 32) // 16 + 1, 3, 32)
    np.testing.assert_array_equal(w[:, 0], x[:, :, :32])
    np.testing.assert_array_equal(w[:, 1], x[:, :, 16:48])
    np.testing.assert_array_equal(w[:, -1], x[:, :, 64:96])


def test_full_pipeline_runs(eeg):
    out = np.asarray(preprocess_eeg(jnp.asarray(eeg), FS))
    assert out.shape == eeg.shape
    # After z-score each channel has ~zero mean, ~unit std.
    assert np.abs(out.mean(axis=-1)).max() < 1e-4
    np.testing.assert_allclose(out.std(axis=-1), 1.0, atol=1e-2)


def test_spatial_entropy_ordering():
    """Uniform heatmap must have higher entropy than a focused one."""
    uniform = np.ones((224, 224), np.float32)
    focused = np.zeros((224, 224), np.float32)
    focused[100:124, 100:124] = 1.0
    h_u = float(spatial_entropy(jnp.asarray(uniform), normalize_input=False))
    h_f = float(spatial_entropy(jnp.asarray(focused)))
    assert h_u > h_f
    # Uniform distribution entropy = log2(N).
    np.testing.assert_allclose(h_u, np.log2(224 * 224), rtol=1e-3)


def test_spectral_entropy_ordering():
    """White noise has higher spectral entropy than a pure sine."""
    r = np.random.default_rng(13)
    noise = r.normal(size=(4, 1024)).astype(np.float32)
    t = np.arange(1024) / FS
    sine = np.tile(np.sin(2 * np.pi * 10 * t), (4, 1)).astype(np.float32)
    h_n = np.asarray(spectral_entropy(jnp.asarray(noise), FS))
    h_s = np.asarray(spectral_entropy(jnp.asarray(sine), FS))
    assert (h_n > h_s).all()


def test_spectral_entropy_scipy_parity():
    """Full parity vs the reference calculator chain (scipy filtfilt+welch+entropy)."""
    from scipy.stats import entropy as scipy_entropy

    r = np.random.default_rng(17)
    x = r.normal(size=(4, 1024)).astype(np.float32)
    got = np.asarray(spectral_entropy(jnp.asarray(x), FS, nperseg=256))

    b, a = sps.butter(4, [0.5 / (FS / 2), 50.0 / (FS / 2)], btype="band")
    filt = sps.filtfilt(b, a, x.astype(np.float64), axis=-1)
    want = np.zeros(4)
    for c in range(4):
        _, psd = sps.welch(filt[c], fs=FS, nperseg=256, noverlap=128)
        p = np.abs(psd) + 1e-10
        want[c] = scipy_entropy(p / p.sum(), base=2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("lo,hi,fs,t", [(0.5, 50.0, 256.0, 3250),
                                        (0.5, 45.0, 256.0, 1024)])
def test_filtfilt_blocked_tpu_precision_bands(lo, hi, fs, t):
    """Regression: bands whose A^128 carry matrix is near-defective (low edge
    0.5 Hz at fs=256/512) EXPLODED on TPU when the carry-scan matmul and the
    zero-input einsum ran at the backend-default bf16 precision (observed
    1e26 at T=3250, NaN entropy over the full-scale rehearsal CSVs).  All
    matmuls touching the carries now pin matmul_precision(); assert
    boundedness + scipy parity at the exact failing configurations."""
    from eyegaze_tpu.ops.preprocess import bandpass_filtfilt_blocked

    r = np.random.default_rng(5)
    x = r.normal(size=(2, 4, t)).astype(np.float32)
    got = np.asarray(bandpass_filtfilt_blocked(jnp.asarray(x), lo, hi, fs, order=4))
    b, a = sps.butter(4, [lo / (fs / 2), min(hi / (fs / 2), 0.99)], btype="band")
    want = sps.filtfilt(b, a, x.astype(np.float64), axis=-1)
    assert np.abs(got).max() < 10.0  # the unstable path hit ~1e26 here
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-3
