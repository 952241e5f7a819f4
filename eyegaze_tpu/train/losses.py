"""Loss functions (pure jnp; all parity-matched to the reference trainers).

- cross entropy (+ class-weighted variant, train_gaze_earlyfusion.py:395-400),
- symmetry MSE (dual_eeg_transformer.py:1255-1260),
- InfoNCE IBS alignment (:1262-1304),
- supervised contrastive on IBS tokens (:1306-1371).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def weighted_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, class_weights: jnp.ndarray
) -> jnp.ndarray:
    """torch F.cross_entropy(weight=...) parity: weighted mean with weight
    normalization sum(w_y)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = class_weights[labels]
    return jnp.sum(w * nll) / jnp.sum(w)


def symmetry_loss(cls1: jnp.ndarray, cls2: jnp.ndarray) -> jnp.ndarray:
    """MSE between the two players' CLS representations."""
    return jnp.mean((cls1 - cls2) ** 2)


def _l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def ibs_alignment_loss(
    ibs_token: jnp.ndarray,
    cls1: jnp.ndarray,
    cls2: jnp.ndarray,
    temperature: float = 0.07,
) -> jnp.ndarray:
    """InfoNCE: each IBS token's positive is its own cls1 among all 2B cls
    tokens (dual_eeg_transformer.py:1262-1304 'simplified' variant)."""
    b = ibs_token.shape[0]
    ibs_n = _l2norm(ibs_token)
    all_cls = jnp.concatenate([_l2norm(cls1), _l2norm(cls2)], axis=0)  # (2B, d)
    sim = (ibs_n @ all_cls.T) / temperature  # (B, 2B)
    labels = jnp.arange(b)
    return cross_entropy(sim, labels)


def ibs_contrastive_loss(
    ibs_tokens: jnp.ndarray, labels: jnp.ndarray, temperature: float = 0.07
) -> jnp.ndarray:
    """Supervised contrastive loss on normalized IBS tokens
    (dual_eeg_transformer.py:1306-1371): -log(sum_pos exp(sim) / sum_all
    exp(sim)), averaged over samples that have >=1 positive."""
    b = ibs_tokens.shape[0]
    z = _l2norm(ibs_tokens)
    sim = (z @ z.T) / temperature
    same = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    eye = jnp.eye(b)
    pos_mask = same * (1.0 - eye)
    exp_sim = jnp.exp(sim) * (1.0 - eye)
    pos_sim = jnp.sum(exp_sim * pos_mask, axis=1)
    all_sim = jnp.sum(exp_sim, axis=1)
    loss = -jnp.log(pos_sim / (all_sim + 1e-8) + 1e-8)
    has_pos = jnp.sum(pos_mask, axis=1) > 0
    denom = jnp.maximum(jnp.sum(has_pos), 1)
    return jnp.where(jnp.any(has_pos), jnp.sum(jnp.where(has_pos, loss, 0.0)) / denom, 0.0)
