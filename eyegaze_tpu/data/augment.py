"""EEG data augmentations (training-only), from the HyperEEG spec.

``4_Experiments/experiments_list.md:316-320``: time masking
(max_length=50, num_masks=2), channel dropout (prob=0.2), Gaussian noise
(std=0.05).  All jit-safe (static shapes, masking instead of dynamic slicing)
and batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def time_masking(rng, x: jnp.ndarray, max_length: int = 50, num_masks: int = 2) -> jnp.ndarray:
    """Zero ``num_masks`` random time spans (<= max_length) per sample.

    x: (B, C, T).
    """
    b, c, t = x.shape
    mask = jnp.ones((b, t), x.dtype)
    for i in range(num_masks):
        rng, k1, k2 = jax.random.split(rng, 3)
        # Inclusive start range [0, t - max_length]: with an exclusive bound
        # the final max_length-sized stretch could never start a mask, so
        # late timesteps would be masked with systematically lower
        # probability than the uniform spans the spec intends.
        starts = jax.random.randint(k1, (b, 1), 0, max(t - max_length + 1, 1))
        lengths = jax.random.randint(k2, (b, 1), 1, max_length + 1)
        pos = jnp.arange(t)[None, :]
        span = (pos >= starts) & (pos < starts + lengths)
        mask = mask * (1.0 - span.astype(x.dtype))
    return x * mask[:, None, :]


def channel_dropout(rng, x: jnp.ndarray, prob: float = 0.2) -> jnp.ndarray:
    """Zero whole channels independently with probability ``prob``.  (B, C, T)."""
    b, c, _ = x.shape
    keep = jax.random.bernoulli(rng, 1.0 - prob, (b, c, 1)).astype(x.dtype)
    return x * keep


def gaussian_noise(rng, x: jnp.ndarray, std: float = 0.05) -> jnp.ndarray:
    return x + std * jax.random.normal(rng, x.shape, x.dtype)


def augment_eeg(rng, x: jnp.ndarray, time_mask_length: int = 50,
                num_time_masks: int = 2, channel_drop_prob: float = 0.2,
                noise_std: float = 0.05) -> jnp.ndarray:
    """Compose all three augmentations (HyperEEG training recipe)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    x = time_masking(k1, x, time_mask_length, num_time_masks)
    x = channel_dropout(k2, x, channel_drop_prob)
    return gaussian_noise(k3, x, noise_std)
