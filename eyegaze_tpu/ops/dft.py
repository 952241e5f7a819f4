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
    env = os.environ.get("EYEGAZE_MATMUL_PRECISION", "highest").lower()
    table = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }
    if env not in table:
        # A typo must not silently select bf16 — that is the exact accuracy
        # failure this env var exists to prevent.
        raise ValueError(
            f"EYEGAZE_MATMUL_PRECISION={env!r} is not one of "
            f"{sorted(table)}")
    return table[env]


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


@functools.lru_cache(maxsize=8)
def _band_synthesis_np(n: int, fs: float, bands: tuple):
    """Factored band-analysis constants: per band k, the rfft bin indices
    ``idx_k`` inside [lo, hi] and a synthesis matrix W_k (2*F_k, 2*n) such
    that with re/im the full rDFT of x and X_k = [re[idx_k], im[idx_k]],

        X_k @ W_k = [band_k(x), hilbert(band_k(x))]   (concatenated on time)

    — exactly irfft(mask*spec) and irfft(mask*g*spec*(-i)) restricted to the
    band's nonzero bins.  Versus the dense (n, n) ``band_matrices`` route
    this cuts the analytic-signal FLOPs ~5x at T=1024 (one shared forward
    rDFT + narrow per-band synthesis instead of 2 dense matmuls per band).
    """
    freqs = np.fft.rfftfreq(n, d=1.0 / fs)
    fdim = n // 2 + 1
    # One-sided reconstruction gain: double interior bins.
    c = np.full(fdim, 2.0)
    c[0] = 1.0
    if n % 2 == 0:
        c[-1] = 1.0
    # Quadrature interior-bin indicator (0 at DC / Nyquist).
    g = np.ones(fdim)
    g[0] = 0.0
    if n % 2 == 0:
        g[-1] = 0.0
    u = np.arange(n)[None, :].astype(np.float64)
    out = []
    for _, lo, hi in bands:
        idx = np.nonzero((freqs >= lo) & (freqs <= hi))[0]
        fk = idx[:, None].astype(np.float64)
        theta = 2.0 * np.pi * fk * u / n  # (F_k, n)
        cos_t, sin_t = np.cos(theta), np.sin(theta)
        w = (c[idx] / n)[:, None]
        wg = (c[idx] * g[idx] / n)[:, None]
        # band = re@(w*cos) - im@(w*sin); quad = re@(wg*sin) + im@(wg*cos)
        top = np.concatenate([w * cos_t, wg * sin_t], axis=1)  # re row-block
        bot = np.concatenate([-w * sin_t, wg * cos_t], axis=1)  # im row-block
        out.append((idx, np.concatenate([top, bot], axis=0).astype(np.float32)))
    return out


def banded_analytic_parts(
    x: jnp.ndarray, n: int, fs: float, bands: Sequence
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic-signal parts for all bands via the factored rDFT route.

    x: (..., n).  Returns (band, quad), each (nb, ..., n) float32 — equal to
    the dense ``band_matrices`` path (same FFT-mask semantics,
    dual_eeg_transformer.py:527-591) at ~1/5 the FLOPs: one shared forward
    rDFT, then per band one narrow synthesis matmul over the band's nonzero
    bins.  Each band's bins form a CONTIGUOUS rfft range, so the inputs are
    static slices — measured on v5e: slicing + skinny matmuls beat both the
    dense route and a padded gather-batched GEMM (gathers cost more than the
    skinny matmuls' MXU underfill saves).
    """
    bands_key = tuple((str(b[0]), float(b[1]), float(b[2])) for b in bands)
    re, im = rdft(x)
    syn = _band_synthesis_np(n, float(fs), bands_key)
    band_out, quad_out = [], []
    for idx, w in syn:
        if idx.size == 0:
            # Band contains no rfft bins (narrow band / coarse resolution):
            # the FFT-mask filter is identically zero, matching the dense
            # band_matrices route's all-zero mask.
            zeros = jnp.zeros(x.shape, jnp.float32)
            band_out.append(zeros)
            quad_out.append(zeros)
            continue
        lo, hi = int(idx[0]), int(idx[-1]) + 1  # contiguous range
        xk = jnp.concatenate([re[..., lo:hi], im[..., lo:hi]], axis=-1)
        bq = jnp.einsum("...f,fu->...u", xk, jnp.asarray(w),
                        preferred_element_type=jnp.float32,
                        precision=matmul_precision())
        band_out.append(bq[..., :n])
        quad_out.append(bq[..., n:])
    return jnp.stack(band_out, axis=0), jnp.stack(quad_out, axis=0)


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
