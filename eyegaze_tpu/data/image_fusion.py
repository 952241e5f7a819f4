"""Image-side preprocessing + data-level fusion as jnp ops.

Rebuild of the data-level image fusion in ``1_Data/processed/two_image_fusion.py``
(horizontal/vertical paste, add/multiply/subtract pixel ops) and the
ImageNet normalization used by every gaze dataset
(``gaze_pair_dataset.py:66-72``).  Runs on device, batched — the reference
pays ~0.1-0.2 s/sample on CPU for this (1_Data/processed/README.md:207-209).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

DATA_FUSION_MODES = ("horizontal", "vertical", "add", "multiply", "subtract")


def to_unit_float(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,1]; float inputs pass through unchanged.

    The ToTensor step of the reference transform (gaze_pair_dataset.py:69),
    run on device so converted datasets can ship uint8 over PCIe/ICI.
    """
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 255.0
    return img


def imagenet_normalize(img: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, H, W) in [0,1] -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN).reshape(3, 1, 1)
    std = jnp.asarray(IMAGENET_STD).reshape(3, 1, 1)
    return (img - mean) / std


def vit_processor_normalize(img: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, H, W) in [0,1] -> [-1, 1]: HF ``ViTImageProcessor`` defaults
    (rescale 1/255 then mean=std=0.5), the normalization the reference's
    data-fusion datasets emit (two_image_fusion.py:64-150)."""
    return (img - 0.5) / 0.5


def resize_bilinear(img: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize of (..., C, H, W) to (..., C, h, w)."""
    out_shape = img.shape[:-2] + (h, w)
    return jax.image.resize(img, out_shape, method="bilinear")


def fuse_image_pair(img_a: jnp.ndarray, img_b: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Data-level fusion of two (..., 3, H, W) images (two_image_fusion.py:19-161).

    'horizontal'/'vertical' paste the two images side by side (then the caller
    resizes back to the model input size); pixel modes operate in [0,1] space.
    """
    if mode == "horizontal":
        return jnp.concatenate([img_a, img_b], axis=-1)
    if mode == "vertical":
        return jnp.concatenate([img_a, img_b], axis=-2)
    if mode == "add":
        return jnp.clip((img_a + img_b) / 2.0, 0.0, 1.0)
    if mode == "multiply":
        return jnp.clip(img_a * img_b, 0.0, 1.0)
    if mode == "subtract":
        return jnp.clip(jnp.abs(img_a - img_b), 0.0, 1.0)
    raise ValueError(f"mode must be one of {DATA_FUSION_MODES}, got {mode!r}")
