"""On-device EEG preprocessing: bandpass -> CAR -> z-score -> windowing.

TPU-native replacement for ``2_Preprocessing/scripts/preprocess_eeg_windows.py``
(:96-206).  The whole pipeline is one jit-compiled, vmap-batched function over
trials, instead of per-trial scipy calls.

Butterworth ``filtfilt`` parity: IIR filtering is sequential along time, but
on TPU we run it as a ``lax.scan`` whose per-step work is a huge elementwise
vector over (trials x channels) lanes, so the scan is bandwidth-bound, not
latency-bound.  ``bandpass_filtfilt`` reproduces ``scipy.signal.filtfilt``'s
default behavior (odd padding, padlen = 3 * max(len(a), len(b)), lfilter_zi
initial conditions) to float32 tolerance — parity-tested against scipy in
tests/test_preprocess.py.  An FFT-mask filter (``ops.spectral.bandpass_fft``)
is the cheaper alternative used inside the models.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _butter_sos(order: int, low: float, high: float, fs: float):
    """Butterworth bandpass as second-order sections + sosfilt_zi (host).

    SOS cascade is required for float32 stability: the direct-form (b, a)
    representation of an order-4 bandpass with normalized low cutoff ~0.004
    is catastrophically ill-conditioned in f32.
    """
    from scipy import signal as sps

    nyq = fs / 2.0
    lo = low / nyq
    hi = min(high / nyq, 0.99)
    sos = sps.butter(order, [lo, hi], btype="band", output="sos")
    zi = sps.sosfilt_zi(sos)  # (n_sections, 2)
    return np.asarray(sos, np.float64), np.asarray(zi, np.float64)


def fir_bandpass_coeffs(order: int, low: float, high: float, fs: float):
    """Expose (sos, zi) for a Butterworth band."""
    return _butter_sos(order, low, high, fs)


def _make_sosfilt(sos: np.ndarray, zi: np.ndarray):
    """Jittable SOS cascade along the last axis with given static coeffs.

    Matches scipy.signal.sosfilt with zi scaled by the first input sample
    (scipy filtfilt/sosfiltfilt method='pad' initial-condition convention).
    """
    sos = jnp.asarray(sos, jnp.float32)  # (ns, 6)
    zi = jnp.asarray(zi, jnp.float32)  # (ns, 2)
    n_sections = sos.shape[0]

    def run(x: jnp.ndarray) -> jnp.ndarray:
        x0 = x[..., :1]
        xs = jnp.moveaxis(x, -1, 0)  # (T, ...)

        def step(carry, xt):
            # carry: (ns, ..., 2) states; xt flows through the cascade.
            states = carry
            new_states = []
            for s in range(n_sections):
                b0, b1, b2, _, a1, a2 = sos[s]
                z = states[s]
                yt = b0 * xt + z[..., 0]
                z0n = b1 * xt + z[..., 1] - a1 * yt
                z1n = b2 * xt - a2 * yt
                new_states.append(jnp.stack([z0n, z1n], axis=-1))
                xt = yt
            return jnp.stack(new_states, axis=0), xt

        init = jnp.stack(
            [zi[s] * x0 for s in range(n_sections)], axis=0
        )  # (ns, ..., 2): zi broadcast-scaled by the first sample
        _, ys = jax.lax.scan(step, init, xs)
        return jnp.moveaxis(ys, 0, -1)

    return run


def bandpass_filtfilt_fir(
    x: jnp.ndarray,
    low: float = 0.5,
    high: float = 50.0,
    sampling_rate: float = 250.0,
    order: int = 4,
) -> jnp.ndarray:
    """Zero-phase Butterworth bandpass, scipy.signal.filtfilt parity.

    Forward-backward SOS cascade with odd edge padding
    (padlen = 3 * max(len(a), len(b)) like scipy filtfilt's default) and
    sosfilt_zi initial conditions.  x: (..., T) float32.
    Matches preprocess_eeg_windows.py:96-129 defaults to ~1e-3.
    """
    sos, zi = _butter_sos(order, float(low), float(high), float(sampling_rate))
    padlen = 3 * (2 * order + 1)
    t = x.shape[-1]
    if t <= padlen:
        raise ValueError(f"signal length {t} must exceed padlen {padlen}")
    sosfilt = _make_sosfilt(sos, zi)
    # Odd extension at both ends (scipy padtype='odd').
    left = 2.0 * x[..., :1] - x[..., padlen:0:-1]
    right = 2.0 * x[..., -1:] - x[..., -2 : -padlen - 2 : -1]
    ext = jnp.concatenate([left, x, right], axis=-1)
    y = sosfilt(ext)
    y = jnp.flip(y, axis=-1)
    y = sosfilt(y)
    y = jnp.flip(y, axis=-1)
    return y[..., padlen : padlen + t]


# Back-compat alias used by ops/__init__.
bandpass_filtfilt = bandpass_filtfilt_fir


def common_average_reference(x: jnp.ndarray, channel_axis: int = -2) -> jnp.ndarray:
    """Subtract the across-channel mean at each timepoint (CAR)."""
    return x - jnp.mean(x, axis=channel_axis, keepdims=True)


def zscore(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """Per-channel z-score: (x - mean) / (biased std + eps).

    Matches preprocess_eeg_windows.py:137-141 (np.std, ddof=0).
    """
    mean = jnp.mean(x, axis=axis, keepdims=True)
    std = jnp.sqrt(jnp.mean((x - mean) ** 2, axis=axis, keepdims=True))
    return (x - mean) / (std + eps)


def sliding_windows(x: jnp.ndarray, window_size: int = 1024, stride: int = 512) -> jnp.ndarray:
    """Static sliding windows over the last axis.

    x: (..., C, T) -> (..., num_windows, C, window_size) where
    num_windows = (T - window_size) // stride + 1.  Pure index math —
    the gather compiles to strided slices.
    """
    t = x.shape[-1]
    if t < window_size:
        raise ValueError(f"T={t} < window_size={window_size}")
    n = (t - window_size) // stride + 1
    idx = np.arange(window_size)[None, :] + stride * np.arange(n)[:, None]  # (n, W)
    out = x[..., idx]  # (..., C, n, W)
    return jnp.moveaxis(out, -2, -3)


def preprocess_eeg(
    x: jnp.ndarray,
    sampling_rate: float = 250.0,
    low: float = 0.5,
    high: float = 50.0,
    order: int = 4,
) -> jnp.ndarray:
    """Full pipeline: Butterworth filtfilt -> CAR -> per-channel z-score.

    x: (..., C, T).  Matches preprocess_eeg_windows.py:146-169.
    """
    x = bandpass_filtfilt_fir(x, low, high, sampling_rate, order)
    x = common_average_reference(x)
    return zscore(x, axis=-1)
