"""Matmul-based real DFT ops — the MXU spectral backend.

The axon TPU backend exposes no FFT kernels at all (rfft/irfft/fft/ifft and
all complex arithmetic are UNIMPLEMENTED — probed empirically), and on TPU a
dense DFT-as-matmul is the idiomatic formulation anyway: for the signal sizes
here (T=1024 EEG windows, 128-sample STFT frames) the extra FLOPs of an
O(n^2) transform are noise against the MXU's throughput, the matrices are
constants XLA hoists into HBM once, and everything stays in real f32/bf16 —
no complex dtype anywhere on the device.

Three families of cached constant matrices:
- ``rdft_matrices(n)``: (n, F) cos/sin so rfft(x) = x@C + i*(x@S), F=n//2+1;
- ``band_matrices(n, fs, bands)``: per band k a filter matrix B_k and a
  Hilbert matrix H_k (both (n, n) real) such that x@B_k is the FFT-mask
  band-filtered signal (parity with dual_eeg_transformer.py:527-560) and
  x@H_k is its Hilbert transform — so the analytic signal is
  (x@B_k) + i*(x@H_k) without ever materializing a complex array;
- masked power spectra come free from one rdft: P_band = (re^2+im^2)*mask.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def matmul_precision():
    """Precision for accuracy-critical DFT/connectivity matmuls.

    TPU matmuls default to bf16 inputs, which degrades connectivity features
    to ~2% error (measured vs the f64 golden).  Measured on v5e: HIGHEST
    gives <1e-5 max error, HIGH (bf16_3x) gives 3e-5; end-to-end throughput
    was statistically indistinguishable between them across runs (relay
    timing variance dominates), so HIGHEST is the default.
    EYEGAZE_MATMUL_PRECISION=highest|high|default overrides.
    """
    env = os.environ.get("EYEGAZE_MATMUL_PRECISION", "highest")
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
    }.get(env, jax.lax.Precision.DEFAULT)


@functools.lru_cache(maxsize=16)
def _rdft_np(n: int) -> Tuple[np.ndarray, np.ndarray]:
    t = np.arange(n)[:, None].astype(np.float64)
    f = np.arange(n // 2 + 1)[None, :].astype(np.float64)
    ang = -2.0 * np.pi * t * f / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def rdft_matrices(n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    c, s = _rdft_np(n)
    return jnp.asarray(c), jnp.asarray(s)


def rdft(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real DFT via two matmuls: returns (re, im), each (..., n//2+1).

    Equal to (rfft(x).real, rfft(x).imag).
    """
    n = x.shape[-1]
    c, s = rdft_matrices(n)
    re = jnp.einsum("...t,tf->...f", x, c, preferred_element_type=jnp.float32, precision=matmul_precision())
    im = jnp.einsum("...t,tf->...f", x, s, preferred_element_type=jnp.float32, precision=matmul_precision())
    return re, im


@functools.lru_cache(maxsize=8)
def _band_mats_np(n: int, fs: float, bands: tuple) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(nb, n, n) filter mats, (nb, n, n) Hilbert mats, (nb, F) masks."""
    freqs = np.fft.rfftfreq(n, d=1.0 / fs)
    nb = len(bands)
    fdim = n // 2 + 1
    # rfft of basis vectors: R[t] = rfft(e_t), so rfft(x) = x @ R.
    basis = np.fft.rfft(np.eye(n), axis=-1)  # (n, F) complex
    # Interior-bin gain for the Hilbert quadrature component.
    g = np.ones(fdim)
    g[0] = 0.0
    if n % 2 == 0:
        g[-1] = 0.0
    filt = np.zeros((nb, n, n), np.float32)
    hilb = np.zeros((nb, n, n), np.float32)
    masks = np.zeros((nb, fdim), np.float32)
    for k, (_, lo, hi) in enumerate(bands):
        m = ((freqs >= lo) & (freqs <= hi)).astype(np.float64)
        masks[k] = m.astype(np.float32)
        filt[k] = np.fft.irfft(basis * m, n=n, axis=-1).astype(np.float32)
        # Hilbert(y) has half-spectrum -i * Y_f on interior bins.
        hilb[k] = np.fft.irfft(basis * (m * g) * (-1j), n=n, axis=-1).astype(np.float32)
    return filt, hilb, masks


def band_matrices(n: int, fs: float, bands: Sequence) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    bands_key = tuple((str(b[0]), float(b[1]), float(b[2])) for b in bands)
    filt, hilb, masks = _band_mats_np(n, float(fs), bands_key)
    return jnp.asarray(filt), jnp.asarray(hilb), jnp.asarray(masks)


def band_analytic_parts(
    x: jnp.ndarray, filt: jnp.ndarray, hilb: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Band-filtered signal + its Hilbert quadrature for ONE band.

    x: (..., n); filt/hilb: (n, n).  Returns (band, quad), each (..., n).
    Pure MXU work.
    """
    band = jnp.einsum("...t,tu->...u", x, filt, preferred_element_type=jnp.float32, precision=matmul_precision())
    quad = jnp.einsum("...t,tu->...u", x, hilb, preferred_element_type=jnp.float32, precision=matmul_precision())
    return band, quad


@functools.lru_cache(maxsize=16)
def _frame_dft_np(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed frame DFT matrices: (n_fft, F) cos/sin with periodic Hann
    baked in, so spec = frames @ C + i*(frames @ S)."""
    c, s = _rdft_np(n_fft)
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    return (win[:, None] * c).astype(np.float32), (win[:, None] * s).astype(np.float32)


def windowed_frame_dft(frames: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., n_frames, n_fft) -> (re, im) each (..., n_frames, F); the Hann
    window is folded into the constant matrices."""
    n_fft = frames.shape[-1]
    c, s = _frame_dft_np(n_fft)
    re = jnp.einsum("...t,tf->...f", frames, jnp.asarray(c), preferred_element_type=jnp.float32, precision=matmul_precision())
    im = jnp.einsum("...t,tf->...f", frames, jnp.asarray(s), preferred_element_type=jnp.float32, precision=matmul_precision())
    return re, im
