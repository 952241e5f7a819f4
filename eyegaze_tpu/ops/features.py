"""Offline feature extraction: the 7x5-band intra/inter connectivity block.

TPU-native rebuild of ``2_Preprocessing/scripts/extract_eeg_features.py``
(:120-760) — a DIFFERENT metric family from the model-side
``ops.connectivity`` (the reference implements connectivity twice; both are
reproduced and cross-checked in tests):

- bands: delta(0.5-4) theta(4-7) alpha(8-12) beta(12-28) gamma(28-50);
- bandpass: Butterworth order-4 **filtfilt** (not an FFT mask);
- analytic signal: scipy.signal.hilbert (FFT Hilbert of the filtered signal);
- metrics (order): pearson, power_corr (of the AMPLITUDE envelope), PLV,
  PLI = |mean sign(sin dphi)|, wPLI = |mean sin dphi| / (mean |sin dphi|+eps),
  segment-averaged spectral coherence (nperseg=256, non-overlapping,
  symmetric Hann), phase_diff = circular mean angle (atan2 of mean sin/cos).

Vectorized shape notes: with cos/sin of phases as C/S matrices,
mean_t sin(dphi_ij) = (S1@C2' - C1@S2')/T and mean_t cos(dphi_ij) =
(C1@C2' + S1@S2')/T — so PLV, wPLI's numerator and the circular phase mean
are all MXU matmuls; only PLI and wPLI's denominator need broadcast sign/abs
reduces.  Everything is real arithmetic (TPU-safe), batched over leading dims
via vmap.

Output layout: (7 metrics, 5 bands, C, C) per trial (:672-760 parity).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eyegaze_tpu.ops import dft
from eyegaze_tpu.ops.dft import matmul_precision
from eyegaze_tpu.ops.preprocess import bandpass_filtfilt_blocked
from eyegaze_tpu.ops.spectral import dft_backend, welch_psd

FEATURE_BANDS_5 = (
    ("delta", 0.5, 4.0),
    ("theta", 4.0, 7.0),
    ("alpha", 8.0, 12.0),
    ("beta", 12.0, 28.0),
    ("gamma", 28.0, 50.0),
)
METRIC_NAMES = ("pearson", "power_corr", "plv", "pli", "wpli", "coherence", "phase_diff")


def _hilbert_quadrature(x: jnp.ndarray) -> jnp.ndarray:
    """Hilbert transform of a real signal along the last axis (imag part of
    scipy.signal.hilbert)."""
    n = x.shape[-1]
    if dft_backend() == "fft":
        spec = jnp.fft.rfft(x, axis=-1)
        g = np.ones(n // 2 + 1, np.float32)
        g[0] = 0.0
        if n % 2 == 0:
            g[-1] = 0.0
        return jnp.fft.irfft(spec * jnp.asarray(g) * (-1j), n=n, axis=-1)
    _, hilb, _ = dft.band_matrices(n, 2.0, (("full", 0.0, 1.1),))
    return jnp.einsum("...t,tu->...u", x, hilb[0], preferred_element_type=jnp.float32, precision=matmul_precision())


def _zscore_biased(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    std = jnp.sqrt(jnp.mean((x - mean) ** 2, axis=-1, keepdims=True))
    return (x - mean) / (std + eps)


def _pearson(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(C, T) x (C, T) -> (C, C) Pearson with biased std (np.std parity)."""
    za = _zscore_biased(a)
    zb = _zscore_biased(b)
    return jnp.einsum("it,jt->ij", za, zb, preferred_element_type=jnp.float32, precision=matmul_precision()) / a.shape[-1]


def _phase_trig(band: jnp.ndarray, quad: jnp.ndarray):
    """cos/sin of the instantaneous phase via exact amplitude ratios."""
    r = jnp.sqrt(band**2 + quad**2)
    safe = r > 0
    c = jnp.where(safe, band / jnp.where(safe, r, 1.0), 1.0)
    s = jnp.where(safe, quad / jnp.where(safe, r, 1.0), 0.0)
    return c, s


@functools.lru_cache(maxsize=8)
def _hanning_sym(n: int) -> np.ndarray:
    # np.hanning is the SYMMETRIC window (unlike torch's periodic default).
    return np.hanning(n).astype(np.float32)


def _segment_spectra(x: jnp.ndarray, nperseg: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Non-overlapping windowed segment DFTs: (C, T) -> (C, S, F) re/im."""
    c, t = x.shape
    n_seg = t // nperseg
    seg = x[:, : n_seg * nperseg].reshape(c, n_seg, nperseg)
    seg = seg * jnp.asarray(_hanning_sym(nperseg))
    if dft_backend() == "fft":
        spec = jnp.fft.rfft(seg, axis=-1)
        return jnp.real(spec), jnp.imag(spec)
    cmat, smat = dft.rdft_matrices(nperseg)
    re = jnp.einsum("cst,tf->csf", seg, cmat, preferred_element_type=jnp.float32, precision=matmul_precision())
    im = jnp.einsum("cst,tf->csf", seg, smat, preferred_element_type=jnp.float32, precision=matmul_precision())
    return re, im


def _coherence(a: jnp.ndarray, b: jnp.ndarray, nperseg: int, eps: float = 1e-8) -> jnp.ndarray:
    """Segment-averaged magnitude-squared coherence (extract_eeg_features.py
    :409-463 / :590-649), (C, T) x (C, T) -> (C, C)."""
    # Clamp to the signal length (scipy welch's nperseg clamp, mirrored by
    # band_energy) — otherwise a trial shorter than nperseg yields zero
    # segments and a silently all-NaN coherence plane.
    nperseg = min(nperseg, a.shape[-1])
    re_a, im_a = _segment_spectra(a, nperseg)
    re_b, im_b = _segment_spectra(b, nperseg)
    n_seg = re_a.shape[1]
    paa = jnp.mean(re_a**2 + im_a**2, axis=1)  # (C, F)
    pbb = jnp.mean(re_b**2 + im_b**2, axis=1)
    # Pab = mean_s X_a conj(X_b): real/imag parts via segment einsums.
    pab_re = jnp.einsum("isf,jsf->ijf", re_a, re_b, preferred_element_type=jnp.float32, precision=matmul_precision())
    pab_re = pab_re + jnp.einsum("isf,jsf->ijf", im_a, im_b, preferred_element_type=jnp.float32, precision=matmul_precision())
    pab_im = jnp.einsum("isf,jsf->ijf", im_a, re_b, preferred_element_type=jnp.float32, precision=matmul_precision())
    pab_im = pab_im - jnp.einsum("isf,jsf->ijf", re_a, im_b, preferred_element_type=jnp.float32, precision=matmul_precision())
    pab_re = pab_re / n_seg
    pab_im = pab_im / n_seg
    coh = (pab_re**2 + pab_im**2) / (paa[:, None, :] * pbb[None, :, :] + eps)
    return jnp.mean(coh, axis=-1)


def _band_metrics(
    band1: jnp.ndarray,
    band2: jnp.ndarray,
    fs: float,
    nperseg: int,
    row_chunk: int,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """All 7 metrics between two (C, T) band signals -> (7, C, C).

    With band1 is band2 this is the intra variant (self-connectivity).
    """
    c, t = band1.shape
    quad1 = _hilbert_quadrature(band1)
    quad2 = _hilbert_quadrature(band2)
    amp1 = jnp.sqrt(band1**2 + quad1**2)
    amp2 = jnp.sqrt(band2**2 + quad2**2)
    c1, s1 = _phase_trig(band1, quad1)
    c2, s2 = _phase_trig(band2, quad2)

    pearson = _pearson(band1, band2)
    power_corr = _pearson(amp1, amp2)

    dot = lambda x, y: jnp.einsum("it,jt->ij", x, y, preferred_element_type=jnp.float32, precision=matmul_precision())
    mean_cos = (dot(c1, c2) + dot(s1, s2)) / t  # mean_t cos(dphi_ij)
    mean_sin = (dot(s1, c2) - dot(c1, s2)) / t  # mean_t sin(dphi_ij)
    plv = jnp.sqrt(mean_cos**2 + mean_sin**2)
    phase_diff = jnp.arctan2(mean_sin, mean_cos)  # circular mean angle
    # wPLI: |x|*sign(x) == x, so the numerator collapses to |mean sin(dphi)|.
    wpli_num = jnp.abs(mean_sin)

    # PLI and wPLI denominator need sign/abs of sin(dphi) per (i, j, t):
    # chunked broadcast-reduce to bound the transient to (chunk, C, T).
    assert c % row_chunk == 0, f"row_chunk must divide C ({c})"

    def chunk_fn(args):
        s1c, c1c = args  # (r, T)
        sin_d = s1c[:, None, :] * c2[None, :, :] - c1c[:, None, :] * s2[None, :, :]
        pli_c = jnp.abs(jnp.mean(jnp.sign(sin_d), axis=-1))
        abs_sin_c = jnp.mean(jnp.abs(sin_d), axis=-1)
        return pli_c, abs_sin_c

    n_chunks = c // row_chunk
    pli_parts, abs_parts = jax.lax.map(
        chunk_fn,
        (s1.reshape(n_chunks, row_chunk, t), c1.reshape(n_chunks, row_chunk, t)),
    )
    pli = pli_parts.reshape(c, c)
    wpli = wpli_num / (abs_parts.reshape(c, c) + eps)

    coherence = _coherence(band1, band2, nperseg)
    return jnp.stack([pearson, power_corr, plv, pli, wpli, coherence, phase_diff])


def inter_connectivity(
    eeg1: jnp.ndarray,
    eeg2: jnp.ndarray,
    sampling_rate: float = 250.0,
    bands: Sequence = FEATURE_BANDS_5,
    nperseg: int = 256,
    row_chunk: int = 8,
) -> jnp.ndarray:
    """Inter-brain connectivity for one trial: (C, T) x2 -> (7, 5, C, C)."""
    def per_band(args):
        lo, hi = args
        b1 = bandpass_filtfilt_blocked(eeg1, lo, hi, sampling_rate)
        b2 = bandpass_filtfilt_blocked(eeg2, lo, hi, sampling_rate)
        return _band_metrics(b1, b2, sampling_rate, nperseg, row_chunk)

    # Band edges are static -> unrolled python loop (each band has its own
    # static filtfilt coefficients).
    mats = [per_band((lo, hi)) for (_, lo, hi) in bands]
    return jnp.stack(mats, axis=1)  # (7, 5, C, C)


def intra_connectivity(
    eeg: jnp.ndarray,
    sampling_rate: float = 250.0,
    bands: Sequence = FEATURE_BANDS_5,
    nperseg: int = 256,
    row_chunk: int = 8,
) -> jnp.ndarray:
    """Intra-brain connectivity for one player: (C, T) -> (7, 5, C, C)."""
    mats = []
    for (_, lo, hi) in bands:
        b = bandpass_filtfilt_blocked(eeg, lo, hi, sampling_rate)
        mats.append(_band_metrics(b, b, sampling_rate, nperseg, row_chunk))
    return jnp.stack(mats, axis=1)


def band_energy(
    eeg: jnp.ndarray,
    sampling_rate: float = 250.0,
    bands: Sequence = FEATURE_BANDS_5,
    nperseg: int = 256,
) -> jnp.ndarray:
    """Mean Welch PSD per band: (..., C, T) -> (..., C, num_bands)."""
    nperseg = min(nperseg, eeg.shape[-1])
    _, psd = welch_psd(eeg, sampling_rate, nperseg=nperseg)
    # Static frequency axis (jit-safe; welch_psd's return is traced under jit).
    freqs = np.fft.rfftfreq(nperseg, d=1.0 / sampling_rate)
    outs = []
    for (_, lo, hi) in bands:
        mask = (freqs >= lo) & (freqs <= hi)
        if mask.sum() > 0:
            outs.append(jnp.mean(psd[..., mask], axis=-1))
        else:
            outs.append(jnp.zeros(psd.shape[:-1]))
    return jnp.stack(outs, axis=-1)
