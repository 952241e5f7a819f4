"""Gaze-model introspection: saliency, ViT Grad-CAM, feature extraction.

Rebuild of ``6_Utils/attention_utils.py`` (input-gradient saliency :107-164;
ViT Grad-CAM on the last block's patch tokens :166-255, CLS stripped,
reshaped to the patch grid and upsampled) and the CLS-feature extraction of
``5_Metrics/feature_extractors.py:36-397`` — hooks replaced by jax.grad and
Flax perturb points.
"""

from __future__ import annotations

from typing import Dict, Iterator, List

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32).reshape(3, 1, 1)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32).reshape(3, 1, 1)


def denormalize_image(img: np.ndarray) -> np.ndarray:
    """Undo ImageNet normalization -> [0, 1] (attention_utils.py:36-72)."""
    return np.clip(np.asarray(img) * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)


def input_saliency(model, params, img1, img2, class_idx=None):
    """|d logit_c / d input| per pixel, channel-maxed (attention_utils.py:107-164).

    Returns (saliency1, saliency2), each (B, H, W).
    """
    img1 = jnp.asarray(img1)
    img2 = jnp.asarray(img2)

    def score(i1, i2):
        logits = model.apply({"params": params}, i1, i2)
        if class_idx is None:
            idx = jnp.argmax(logits, axis=-1)
        else:
            idx = jnp.full((logits.shape[0],), class_idx)
        return jnp.sum(jnp.take_along_axis(logits, idx[:, None], axis=-1))

    g1, g2 = jax.grad(score, argnums=(0, 1))(img1, img2)
    return (np.abs(np.asarray(g1)).max(axis=1), np.abs(np.asarray(g2)).max(axis=1))


def vit_gradcam(model_perturb, params, img1, img2, class_idx=None,
                upsample_to: int | None = None) -> np.ndarray:
    """Grad-CAM over the ViT's last-block patch tokens.

    ``model_perturb`` must be built with ``enable_perturb=True``.  CLS token
    stripped, CAM reshaped to the patch grid (14x14 for ViT-B/16 @224) and
    optionally bilinearly upsampled.  Returns (B, P, P) or (B, up, up).
    """
    img1 = jnp.asarray(img1)
    img2 = jnp.asarray(img2)
    variables = model_perturb.init(jax.random.PRNGKey(0), img1[:1], img2[:1])
    pert0 = jax.tree_util.tree_map(
        lambda x: jnp.zeros((img1.shape[0],) + x.shape[1:], x.dtype),
        variables.get("perturbations", {}),
    )

    def forward(pert):
        out, state = model_perturb.apply(
            {"params": params, "perturbations": pert}, img1, img2,
            mutable=["intermediates"],
        )
        return out, state["intermediates"]

    def score(pert):
        logits, inter = forward(pert)
        if class_idx is None:
            idx = jnp.argmax(logits, axis=-1)
        else:
            idx = jnp.full((logits.shape[0],), class_idx)
        return jnp.sum(jnp.take_along_axis(logits, idx[:, None], axis=-1)), inter

    grads, inter = jax.grad(score, has_aux=True)(pert0)

    def find_leaf(tree, key):
        for k, v in tree.items():
            if k == key:
                return v
            if isinstance(v, dict):
                r = find_leaf(v, key)
                if r is not None:
                    return r
        return None

    g = find_leaf(grads, "last_block")  # (B, 1+P^2, E)
    act_entry = find_leaf(inter, "last_block_tokens")
    act = act_entry[0] if isinstance(act_entry, tuple) else act_entry
    g = g[:, 1:, :]
    a = act[:, 1:, :]
    w = jnp.mean(g, axis=1, keepdims=True)  # token-avg channel weights
    cam = jax.nn.relu(jnp.sum(w * a, axis=-1))  # (B, P^2)
    p = int(np.sqrt(cam.shape[1]))
    cam = cam.reshape(-1, p, p)
    if upsample_to:
        cam = jax.image.resize(cam, (cam.shape[0], upsample_to, upsample_to), "bilinear")
    cam = np.asarray(cam)
    denom = cam.reshape(cam.shape[0], -1).max(axis=1)[:, None, None] + 1e-8
    return cam / denom


def extract_cls_features(model, params, batches: Iterator[Dict]) -> Dict[str, np.ndarray]:
    """CLS features + labels for early (single stream) or late (dual) models."""
    feats: List[np.ndarray] = []
    labels: List[np.ndarray] = []
    extra: Dict[str, List[np.ndarray]] = {}
    fn = jax.jit(lambda p, i1, i2: model.apply(
        {"params": p}, i1, i2, return_features=True))
    for batch in batches:
        out = fn(params, jnp.asarray(batch["img1"]), jnp.asarray(batch["img2"]))
        if isinstance(out, dict):  # LateFusionViT
            feats.append(np.asarray(out["fused"]))
            for k in ("cls1", "cls2"):
                extra.setdefault(k, []).append(np.asarray(out[k]))
        else:
            feats.append(np.asarray(out))
        labels.append(np.asarray(batch["label"]))
    result = {"features": np.concatenate(feats), "labels": np.concatenate(labels)}
    for k, v in extra.items():
        result[k] = np.concatenate(v)
    return result
