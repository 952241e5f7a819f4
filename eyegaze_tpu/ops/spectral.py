"""Spectral ops: bandpass, Hilbert/analytic signal, STFT, Welch PSD.

Two interchangeable device backends, selected by ``dft_backend()``:

- ``'fft'`` — jnp.fft kernels (CPU/GPU and TPU backends that implement FFT);
- ``'matmul'`` — real-arithmetic DFT matmuls (``ops.dft``), the MXU path.
  This is the production path on TPU: the axon backend implements neither
  FFT nor complex arithmetic, and at these sizes (T=1024, 128-pt STFT
  frames) constant-matrix DFTs ride the MXU at full throughput with zero
  complex dtypes.  Override with EYEGAZE_DFT_BACKEND=fft|matmul.

Numerical contract (parity-tested in tests/test_spectral.py against a literal
NumPy port of the reference semantics):

- ``bandpass_fft`` reproduces the rfft-mask-irfft filter of
  ``3_Models/backbones/dual_eeg_transformer.py:527-560`` (inclusive band
  edges on rfftfreq bins).
- ``analytic_band_parts`` fuses bandpass + FFT-Hilbert
  (``dual_eeg_transformer.py:562-591``): for each band it returns the
  band-filtered signal and its Hilbert quadrature — i.e. the real and
  imaginary parts of the analytic signal — so instantaneous phase is
  ``arctan2(quad, band)`` with no complex math.
- ``stft`` matches ``torch.stft(center=True, pad_mode='reflect',
  window=hann_window(n_fft), onesided=True)`` (dual_eeg_transformer.py:102-109).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from eyegaze_tpu.ops import dft

# Band definitions (Hz).  4-band set: legacy scalar IBSTokenGenerator
# (dual_eeg_transformer.py:201-206); 6-band set: IBSConnectivityMatrixGenerator
# (dual_eeg_transformer.py:500-507).
BAND_DEFS_4 = (
    ("theta", 4.0, 8.0),
    ("alpha", 8.0, 13.0),
    ("beta", 13.0, 30.0),
    ("gamma", 30.0, 45.0),
)
BAND_DEFS_6 = (
    ("broadband", 0.5, 45.0),
    ("delta", 0.5, 4.0),
    ("theta", 4.0, 8.0),
    ("alpha", 8.0, 13.0),
    ("beta", 13.0, 30.0),
    ("gamma", 30.0, 45.0),
)

_FFT_BACKENDS = ("cpu", "gpu", "cuda", "rocm")


def dft_backend() -> str:
    """'fft' or 'matmul'; auto-selects matmul on TPU-family backends."""
    env = os.environ.get("EYEGAZE_DFT_BACKEND", "auto")
    if env in ("fft", "matmul"):
        return env
    return "fft" if jax.default_backend() in _FFT_BACKENDS else "matmul"


@functools.lru_cache(maxsize=64)
def _rfft_band_mask_np(n: int, sampling_rate: float, low: float, high: float) -> np.ndarray:
    freqs = np.fft.rfftfreq(n, d=1.0 / sampling_rate)
    return ((freqs >= low) & (freqs <= high)).astype(np.float32)


def rfft_band_mask(n: int, sampling_rate: float, low: float, high: float) -> jnp.ndarray:
    """Inclusive band mask over rfft bins, shape (n//2 + 1,)."""
    return jnp.asarray(_rfft_band_mask_np(n, float(sampling_rate), float(low), float(high)))


def band_masks(n: int, sampling_rate: float, bands) -> jnp.ndarray:
    """Stack of rfft band masks, shape (num_bands, n//2 + 1)."""
    return jnp.stack(
        [rfft_band_mask(n, sampling_rate, lo, hi) for (_, lo, hi) in bands], axis=0
    )


def band_masks_np(n: int, sampling_rate: float, bands) -> np.ndarray:
    """Numpy stack of rfft band masks — for STATIC bin-range decisions
    (slicing to the union of nonzero band bins) made at trace time."""
    return np.stack(
        [_rfft_band_mask_np(n, float(sampling_rate), float(lo), float(hi))
         for (_, lo, hi) in bands], axis=0)


@functools.lru_cache(maxsize=16)
def _hilbert_gain_np(n: int) -> np.ndarray:
    """Interior-bin doubling gain over rfft bins: h[0]=1, h[nyq]=1, else 2."""
    h = np.full(n // 2 + 1, 2.0, dtype=np.float32)
    h[0] = 1.0
    if n % 2 == 0:
        h[-1] = 1.0
    return h


def hilbert_gain(n: int) -> jnp.ndarray:
    return jnp.asarray(_hilbert_gain_np(n))


@functools.lru_cache(maxsize=16)
def _quad_gain_np(n: int) -> np.ndarray:
    """Interior-bin indicator (0 at DC and Nyquist) for the quadrature part."""
    g = np.ones(n // 2 + 1, dtype=np.float32)
    g[0] = 0.0
    if n % 2 == 0:
        g[-1] = 0.0
    return g


def bandpass_fft(x: jnp.ndarray, low: float, high: float, sampling_rate: float) -> jnp.ndarray:
    """FFT-mask bandpass of a real signal along the last axis."""
    n = x.shape[-1]
    if dft_backend() == "fft":
        mask = rfft_band_mask(n, sampling_rate, low, high)
        return jnp.fft.irfft(jnp.fft.rfft(x, axis=-1) * mask, n=n, axis=-1).astype(x.dtype)
    filt, _, _ = dft.band_matrices(n, sampling_rate, (("b", low, high),))
    return jnp.einsum("...t,tu->...u", x, filt[0], preferred_element_type=jnp.float32,
                     precision=dft.matmul_precision()).astype(
        x.dtype
    )


def analytic_band_parts(
    x: jnp.ndarray, sampling_rate: float, bands
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic-signal parts of the band-filtered input for all bands.

    Args:
        x: real signal, (..., T).
    Returns:
        (band, quad): each (num_bands, ..., T) float32.  band is the
        FFT-mask-filtered signal; quad its Hilbert transform.  Phase is
        arctan2(quad, band); power is band**2.
    """
    n = x.shape[-1]
    if dft_backend() == "fft":
        masks = band_masks(n, sampling_rate, bands)  # (nb, F)
        spec = jnp.fft.rfft(x, axis=-1)  # (..., F) complex
        g = jnp.asarray(_quad_gain_np(n))
        shape = (len(bands),) + (1,) * (x.ndim - 1) + (-1,)
        band = jnp.fft.irfft(spec[None] * masks.reshape(shape), n=n, axis=-1)
        quad = jnp.fft.irfft(spec[None] * (masks * g).reshape(shape) * (-1j), n=n, axis=-1)
        return band.astype(jnp.float32), quad.astype(jnp.float32)
    # Factored route: one shared forward rDFT, then narrow per-band synthesis
    # matmuls over the band's nonzero bins — ~5x fewer FLOPs than the dense
    # (n, n) band/Hilbert matrices at T=1024 (see dft.banded_analytic_parts).
    return dft.banded_analytic_parts(x, n, sampling_rate, bands)


def power_spectrum(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(re, im) of the one-sided DFT of x along the last axis (no window)."""
    if dft_backend() == "fft":
        spec = jnp.fft.rfft(x, axis=-1)
        return jnp.real(spec), jnp.imag(spec)
    return dft.rdft(x)


def instantaneous_phase(x: jnp.ndarray) -> jnp.ndarray:
    """FFT-Hilbert instantaneous phase (dual_eeg_transformer.py:562-591)."""
    n = x.shape[-1]
    band, quad = analytic_band_parts(x, 1.0, (("full", 0.0, 1.0),))
    return jnp.arctan2(quad[0], band[0])


@functools.lru_cache(maxsize=16)
def _hann_window_np(n: int) -> np.ndarray:
    # torch.hann_window default is periodic: 0.5*(1-cos(2*pi*k/N)).
    k = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * k / n))).astype(np.float32)


def hann_window(n: int) -> jnp.ndarray:
    return jnp.asarray(_hann_window_np(n))


def _frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Frame the last axis into overlapping windows: (..., T) -> (..., n_frames, frame_length)."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    idx = np.arange(frame_length)[None, :] + hop * np.arange(n_frames)[:, None]
    return x[..., idx]


def _stft_frames(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    pad = n_fft // 2
    pad_spec = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    xp = jnp.pad(x, pad_spec, mode="reflect")
    return _frame(xp, n_fft, hop_length)  # (..., n_frames, n_fft)


def stft(x: jnp.ndarray, n_fft: int = 128, hop_length: int = 64) -> jnp.ndarray:
    """torch.stft-compatible complex STFT (fft backend only; tests/analysis)."""
    frames = _stft_frames(x, n_fft, hop_length) * hann_window(n_fft)
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.swapaxes(spec, -1, -2)  # (..., F, n_frames)


def _stft_frames_reshape(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Center-padded overlapping frames WITHOUT a gather.

    When ``hop`` divides ``n_fft`` (r = n_fft//hop overlapping shifts), the
    frame tensor is r shifted views of a hop-folded reshape, concatenated —
    pure reshape/slice ops, bit-identical to the gather framing (verified on
    v5e) and cheaper: integer-array indexing compiles to a real gather.
    """
    pad = n_fft // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    t = xp.shape[-1]
    r = n_fft // hop
    n_hops = t // hop
    hops = xp[..., : n_hops * hop].reshape(xp.shape[:-1] + (n_hops, hop))
    n_frames = 1 + (t - n_fft) // hop
    parts = [hops[..., j : j + n_frames, :] for j in range(r)]
    return jnp.concatenate(parts, axis=-1)  # (..., n_frames, n_fft)


def stft_magnitude(x: jnp.ndarray, n_fft: int = 128, hop_length: int = 64) -> jnp.ndarray:
    """|STFT| with backend dispatch: (..., F, n_frames) real."""
    if dft_backend() == "fft":
        return jnp.abs(stft(x, n_fft, hop_length))
    if n_fft % hop_length == 0:
        frames = _stft_frames_reshape(x, n_fft, hop_length)
    else:
        frames = _stft_frames(x, n_fft, hop_length)
    re, im = dft.windowed_frame_dft(frames)  # window folded into the matrices
    return jnp.swapaxes(jnp.sqrt(re**2 + im**2), -1, -2)


def stft_log_magnitude(
    x: jnp.ndarray,
    n_fft: int = 128,
    hop_length: int = 64,
    freq_bins: int = 64,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """log(|STFT| + eps) truncated to the first ``freq_bins`` bins
    (SpectrogramTokenGenerator preprocessing, dual_eeg_transformer.py:100-118)."""
    mag = stft_magnitude(x, n_fft, hop_length)[..., :freq_bins, :]
    return jnp.log(mag + eps)


def welch_psd(
    x: jnp.ndarray,
    sampling_rate: float,
    nperseg: int = 256,
    noverlap: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Welch PSD along the last axis (scipy.signal.welch parity: Hann window,
    per-segment constant detrend, density scaling, mean average).

    Returns (freqs (F,), psd (..., F)).
    """
    nperseg = min(nperseg, x.shape[-1])
    if noverlap is None:
        noverlap = nperseg // 2
    hop = nperseg - noverlap
    win = hann_window(nperseg)
    frames = _frame(x, nperseg, hop)  # (..., n_seg, nperseg)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if dft_backend() == "fft":
        spec = jnp.fft.rfft(frames * win, axis=-1)
        power = jnp.abs(spec) ** 2
    else:
        re, im = dft.windowed_frame_dft(frames)
        power = re**2 + im**2
    scale = 1.0 / (sampling_rate * jnp.sum(win**2))
    psd = power * scale
    # One-sided correction: double all bins except DC and Nyquist (even nperseg).
    f = psd.shape[-1]
    corr = np.full(f, 2.0, dtype=np.float32)
    corr[0] = 1.0
    if nperseg % 2 == 0:
        corr[-1] = 1.0
    psd = jnp.mean(psd * jnp.asarray(corr), axis=-2)
    freqs = jnp.asarray(np.fft.rfftfreq(nperseg, d=1.0 / sampling_rate).astype(np.float32))
    return freqs, psd
