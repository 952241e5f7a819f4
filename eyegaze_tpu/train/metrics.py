"""On-device classification metrics (jnp), sklearn-parity.

Rebuild of ``5_Metrics/classification_metrics.py:36-397``: accuracy,
macro/weighted precision/recall/F1, per-class metrics, confusion matrix, and
one-vs-rest ROC with micro/macro averaging.  All computable inside jit (ROC is
host-side numpy since it sorts).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def confusion_matrix(labels: jnp.ndarray, preds: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(num_classes, num_classes) with rows = true class (sklearn convention)."""
    idx = labels * num_classes + preds
    return jnp.bincount(idx, length=num_classes * num_classes).reshape(
        num_classes, num_classes
    )


def per_class_metrics(cm: jnp.ndarray, eps: float = 1e-12) -> Dict[str, jnp.ndarray]:
    tp = jnp.diagonal(cm).astype(jnp.float32)
    support = jnp.sum(cm, axis=1).astype(jnp.float32)
    pred_count = jnp.sum(cm, axis=0).astype(jnp.float32)
    # sklearn zero_division=0 semantics: 0 when denominator is 0.
    precision = jnp.where(pred_count > 0, tp / (pred_count + eps), 0.0)
    recall = jnp.where(support > 0, tp / (support + eps), 0.0)
    f1 = jnp.where(
        precision + recall > 0, 2 * precision * recall / (precision + recall + eps), 0.0
    )
    return {"precision": precision, "recall": recall, "f1": f1, "support": support}


def classification_metrics(
    labels: jnp.ndarray, preds: jnp.ndarray, num_classes: int = 3
) -> Dict[str, jnp.ndarray]:
    """accuracy + macro/weighted P/R/F1 + confusion matrix, all on device."""
    cm = confusion_matrix(labels, preds, num_classes)
    pc = per_class_metrics(cm)
    n = jnp.sum(cm)
    accuracy = jnp.sum(jnp.diagonal(cm)) / jnp.maximum(n, 1)
    support = pc["support"]
    w = support / jnp.maximum(jnp.sum(support), 1)
    out = {
        "accuracy": accuracy.astype(jnp.float32),
        "precision_macro": jnp.mean(pc["precision"]),
        "recall_macro": jnp.mean(pc["recall"]),
        "f1_macro": jnp.mean(pc["f1"]),
        "precision_weighted": jnp.sum(w * pc["precision"]),
        "recall_weighted": jnp.sum(w * pc["recall"]),
        "f1_weighted": jnp.sum(w * pc["f1"]),
        "confusion_matrix": cm,
    }
    out.update({f"{k}_per_class": v for k, v in pc.items() if k != "support"})
    return out


def roc_curves(labels: np.ndarray, probs: np.ndarray) -> Dict:
    """One-vs-rest ROC curves + AUCs with micro/macro averaging (host-side).

    labels: (N,) ints; probs: (N, C) softmax probabilities.
    Matches classification_metrics.py's sklearn roc_curve/auc usage.
    """
    n, c = probs.shape
    onehot = np.eye(c)[labels]

    def _roc(y, s):
        order = np.argsort(-s, kind="stable")
        y = y[order]
        s = s[order]
        # Tied scores share one threshold: evaluate the curve only at the last
        # index of each distinct score (sklearn _binary_clf_curve semantics);
        # per-sample cumsums through a tie block are path-dependent.
        thr_idx = np.r_[np.flatnonzero(np.diff(s)), len(s) - 1]
        tps = np.cumsum(y)[thr_idx]
        fps = (thr_idx + 1) - tps
        tpr = tps / max(tps[-1], 1)
        fpr = fps / max(fps[-1], 1)
        tpr = np.concatenate([[0.0], tpr])
        fpr = np.concatenate([[0.0], fpr])
        # np.trapezoid exists only in NumPy >= 2.0; fall back for 1.x.
        auc = getattr(np, "trapezoid", np.trapz)(tpr, fpr)
        return fpr, tpr, float(auc)

    out = {"per_class": {}}
    aucs = []
    for k in range(c):
        fpr, tpr, auc = _roc(onehot[:, k], probs[:, k])
        out["per_class"][k] = {"fpr": fpr, "tpr": tpr, "auc": auc}
        aucs.append(auc)
    out["macro_auc"] = float(np.mean(aucs))
    fpr, tpr, micro = _roc(onehot.ravel(), probs.ravel())
    out["micro"] = {"fpr": fpr, "tpr": tpr, "auc": micro}
    return out
