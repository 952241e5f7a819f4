"""Gaze-image augmentations with identical-seed dual-stream application.

Rebuild of the training-mode augmentations in the reference's gaze datasets:
random horizontal flip + color jitter (multimodal_dataset.py:19-275) and the
AugmentedDualImageDataset pattern (dual_image_dataset_v2.py:19-208) where the
SAME random transform is applied to both players' images — here expressed as
jit-safe batched ops that take one PRNG key and apply the identical decision
to both streams.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def random_horizontal_flip(rng, img: jnp.ndarray, prob: float = 0.5) -> jnp.ndarray:
    """Per-sample random horizontal flip of (B, C, H, W)."""
    flip = jax.random.bernoulli(rng, prob, (img.shape[0], 1, 1, 1))
    return jnp.where(flip, img[..., ::-1], img)


def color_jitter(
    rng,
    img: jnp.ndarray,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
) -> jnp.ndarray:
    """Per-sample brightness/contrast/saturation jitter of (B, 3, H, W) in [0,1].

    torchvision ColorJitter semantics: factors drawn uniformly from
    [1-x, 1+x]; brightness multiplies, contrast blends with the per-image
    grayscale mean, saturation blends with the grayscale image.
    """
    b = img.shape[0]
    kb, kc, ks = jax.random.split(rng, 3)
    bf = jax.random.uniform(kb, (b, 1, 1, 1), minval=1 - brightness, maxval=1 + brightness)
    cf = jax.random.uniform(kc, (b, 1, 1, 1), minval=1 - contrast, maxval=1 + contrast)
    sf = jax.random.uniform(ks, (b, 1, 1, 1), minval=1 - saturation, maxval=1 + saturation)

    out = img * bf
    gray = (0.299 * out[:, 0] + 0.587 * out[:, 1] + 0.114 * out[:, 2])[:, None]
    mean = jnp.mean(gray, axis=(2, 3), keepdims=True)
    out = cf * out + (1 - cf) * mean
    out = sf * out + (1 - sf) * gray
    return jnp.clip(out, 0.0, 1.0)


def augment_gaze_pair(
    rng,
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    flip_prob: float = 0.5,
    jitter: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the IDENTICAL random transform to both players' images.

    (AugmentedDualImageDataset contract: the pair's spatial relationship must
    be preserved, so flip decisions and jitter factors are shared.)
    Images in [0, 1], shape (B, 3, H, W).
    """
    k_flip, k_jit = jax.random.split(rng)
    out1 = random_horizontal_flip(k_flip, img1, flip_prob)
    out2 = random_horizontal_flip(k_flip, img2, flip_prob)  # same key = same flips
    out1 = color_jitter(k_jit, out1, jitter, jitter, jitter)
    out2 = color_jitter(k_jit, out2, jitter, jitter, jitter)  # same factors
    return out1, out2
