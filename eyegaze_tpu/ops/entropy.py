"""Spatial and spectral entropy, batched on device.

Parity targets (tests/test_entropy.py, vs. ``5_Metrics/entropy_calculators.py``):

- ``spatial_entropy`` — Shannon entropy (bits) of a gaze heatmap treated as a
  spatial probability distribution (:71-180): grayscale (luminosity), min-max
  normalize, abs + eps, normalize to sum 1, ``-sum(p log2 p)``.
- ``spectral_entropy`` — Butterworth-filtfilt bandpass + Welch PSD + Shannon
  entropy per channel (:183-381), batched over (..., C, T) in one jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from eyegaze_tpu.ops.preprocess import bandpass_filtfilt_blocked
from eyegaze_tpu.ops.spectral import welch_psd


def shannon_entropy_from_probs(p: jnp.ndarray, axis: int = -1, base: float = 2.0) -> jnp.ndarray:
    """H = -sum(p log p) / log(base); assumes p sums to 1 along axis."""
    return -jnp.sum(p * jnp.log(p), axis=axis) / jnp.log(base)


def _normalize_to_probability(x: jnp.ndarray, axis: int = -1, eps: float = 1e-10) -> jnp.ndarray:
    x = jnp.abs(x) + eps
    return x / jnp.sum(x, axis=axis, keepdims=True)


def _to_grayscale(image: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W), (..., H, W, 3) or (..., 3, H, W) -> (..., H, W) luminosity."""
    if image.ndim >= 3 and image.shape[-1] == 3:
        r, g, b = image[..., 0], image[..., 1], image[..., 2]
        return 0.299 * r + 0.587 * g + 0.114 * b
    if image.ndim >= 3 and image.shape[-3] == 3:
        return (
            0.299 * image[..., 0, :, :]
            + 0.587 * image[..., 1, :, :]
            + 0.114 * image[..., 2, :, :]
        )
    return image


def spatial_entropy(image: jnp.ndarray, normalize_input: bool = True) -> jnp.ndarray:
    """Spatial Shannon entropy (bits) of heatmap image(s).

    Accepts (H, W), (H, W, 3), (3, H, W), or any batch of those; returns
    entropy per image (batch dims preserved).
    """
    gray = _to_grayscale(image)
    flat = gray.reshape(gray.shape[:-2] + (-1,))
    if normalize_input:
        lo = jnp.min(flat, axis=-1, keepdims=True)
        hi = jnp.max(flat, axis=-1, keepdims=True)
        flat = (flat - lo) / (hi - lo + 1e-10)
    p = _normalize_to_probability(flat, axis=-1)
    return shannon_entropy_from_probs(p, axis=-1)


def spectral_entropy(
    eeg: jnp.ndarray,
    sampling_rate: float = 250.0,
    filter_low: float = 0.5,
    filter_high: float = 50.0,
    filter_order: int = 4,
    nperseg: int = 256,
    apply_filter: bool = True,
) -> jnp.ndarray:
    """Spectral Shannon entropy (bits) per channel.

    eeg: (..., C, T) -> (..., C).
    """
    if apply_filter:
        eeg = bandpass_filtfilt_blocked(eeg, filter_low, filter_high, sampling_rate, filter_order)
    _, psd = welch_psd(eeg, sampling_rate, nperseg=nperseg)
    p = _normalize_to_probability(psd, axis=-1)
    return shannon_entropy_from_probs(p, axis=-1)
