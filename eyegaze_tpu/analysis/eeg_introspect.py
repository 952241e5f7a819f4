"""EEG model introspection — intermediates instead of torch hooks.

Rebuild of ``5_Metrics/eeg_metrics.py``:
- run_inference (:115-176) — logits/probs/preds + cls/ibs embeddings;
- IBS matrix capture + class means + Coop-Comp difference (:183-311), via
  Flax ``sow`` intermediates instead of a forward hook;
- frequency-band sensitivity (:318-413) — the mask becomes a static model
  flag (``mask_band``), one compiled program per band, instead of a hook
  mutating activations;
- cross-attention weight extraction (:420-594) — captured attention
  probabilities, running mean map + per-class diagonal profiles;
- embedding extraction (:601-673) — z_fuse proxy [cls1, cls2, |cls1-cls2|];
- Grad-CAM on the spectrogram CNN (:742-953) — gradient w.r.t. a Flax
  ``perturb`` point at conv2, per-class average CAM resized to 64x64.

Canonical channel montage and 2D positions (:960-995 and
entropy_calculators.py:468-485).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from eyegaze_tpu.ops.connectivity import BAND_NAMES_6 as BAND_NAMES
from eyegaze_tpu.ops.connectivity import FEATURE_NAMES
from eyegaze_tpu.train.metrics import classification_metrics

STANDARD_32_CHANNELS = [
    "Fp1", "Fz", "F3", "F7", "FT9", "FC5", "FC1", "C3",
    "T7", "TP9", "CP5", "CP1", "Pz", "P3", "P7", "O1",
    "Oz", "O2", "P4", "P8", "TP10", "CP6", "CP2", "Cz",
    "C4", "T8", "FT10", "FC6", "FC2", "F4", "F8", "Fp2",
]

CHANNEL_POSITIONS_2D = {
    "Fp1": (-0.3, 0.9), "Fp2": (0.3, 0.9),
    "F7": (-0.7, 0.5), "F3": (-0.35, 0.5), "Fz": (0.0, 0.5), "F4": (0.35, 0.5), "F8": (0.7, 0.5),
    "FT9": (-0.9, 0.3), "FC5": (-0.55, 0.3), "FC1": (-0.2, 0.3), "FC2": (0.2, 0.3),
    "FC6": (0.55, 0.3), "FT10": (0.9, 0.3),
    "T7": (-0.9, 0.0), "C3": (-0.45, 0.0), "Cz": (0.0, 0.0), "C4": (0.45, 0.0), "T8": (0.9, 0.0),
    "TP9": (-0.9, -0.3), "CP5": (-0.55, -0.3), "CP1": (-0.2, -0.3), "CP2": (0.2, -0.3),
    "CP6": (0.55, -0.3), "TP10": (0.9, -0.3),
    "P7": (-0.7, -0.5), "P3": (-0.35, -0.5), "Pz": (0.0, -0.5), "P4": (0.35, -0.5),
    "P8": (0.7, -0.5),
    "O1": (-0.3, -0.8), "Oz": (0.0, -0.8), "O2": (0.3, -0.8),
}


def _apply(model, params, batch, **kw):
    return model.apply({"params": params}, jnp.asarray(batch["eeg1"]),
                       jnp.asarray(batch["eeg2"]), **kw)


def run_inference(model, params, batches: Iterator[Dict]) -> Dict[str, np.ndarray]:
    """Collect logits/probs/preds/labels (+ cls1/cls2/ibs_token embeddings)."""
    fn = jax.jit(lambda p, b: _apply(model, p, b))
    out: Dict[str, List[np.ndarray]] = {}
    labels = []
    for batch in batches:
        res = fn(params, batch)
        labels.append(np.asarray(batch["label"]))
        for k in ("logits", "cls1", "cls2", "ibs_token"):
            if k in res:
                out.setdefault(k, []).append(np.asarray(res[k]))
    result = {k: np.concatenate(v) for k, v in out.items()}
    result["labels"] = np.concatenate(labels)
    result["probs"] = np.asarray(jax.nn.softmax(jnp.asarray(result["logits"]), axis=-1))
    result["preds"] = result["logits"].argmax(axis=-1)
    return result


def extract_ibs_matrices(model, params, batches: Iterator[Dict],
                         num_classes: int = 3) -> Dict:
    """Per-class mean connectivity matrices + Cooperation-Competition diff.

    Returns {'class_means': (num_classes, 6, F, C, C), 'diff_coop_vs_comp':
    (6, F, C, C), 'counts': (num_classes,)}.
    """
    fn = jax.jit(lambda p, b: model.apply(
        {"params": p}, jnp.asarray(b["eeg1"]), jnp.asarray(b["eeg2"]),
        capture=True, mutable=["intermediates"]))
    sums = None
    counts = np.zeros(num_classes, np.int64)
    for batch in batches:
        _, state = fn(params, batch)
        mats = np.asarray(state["intermediates"]["ibs_matrices"][0])  # (B,6,F,C,C)
        labels = np.asarray(batch["label"])
        if sums is None:
            sums = np.zeros((num_classes,) + mats.shape[1:], np.float64)
        for c in range(num_classes):
            sel = labels == c
            if sel.any():
                sums[c] += mats[sel].sum(axis=0)
                counts[c] += int(sel.sum())
    means = sums / np.maximum(counts, 1)[:, None, None, None, None]
    return {
        "class_means": means.astype(np.float32),
        "diff_coop_vs_comp": (means[2] - means[1]).astype(np.float32),
        "counts": counts,
    }


def frequency_sensitivity(
    model_factory: Callable[[int], object],
    params,
    batches_fn: Callable[[], Iterator[Dict]],
    band_names: List[str] = list(BAND_NAMES),
    num_classes: int = 3,
) -> Dict[str, Dict[str, float]]:
    """Accuracy/F1 with each band's connectivity zeroed.

    ``model_factory(band_idx)`` returns the model with ``mask_band=band_idx``
    (same params; static flag -> one compiled program per band).
    """
    results = {}
    for band_idx, band in enumerate(band_names):
        model = model_factory(band_idx)
        fn = jax.jit(lambda p, b, m=model: _apply(m, p, b)["logits"])
        preds, labels = [], []
        for batch in batches_fn():
            preds.append(np.asarray(fn(params, batch)).argmax(axis=-1))
            labels.append(np.asarray(batch["label"]))
        m = classification_metrics(
            jnp.asarray(np.concatenate(labels)), jnp.asarray(np.concatenate(preds)),
            num_classes,
        )
        results[band] = {"accuracy": float(m["accuracy"]), "f1": float(m["f1_macro"])}
    return results


def extract_attention_maps(model, params, batches: Iterator[Dict],
                           num_classes: int = 3) -> Dict:
    """Mean cross-attention maps (head-averaged) overall and per class, plus
    per-class diagonal profiles (eeg_metrics.py:420-594 semantics)."""
    fn = jax.jit(lambda p, b: model.apply(
        {"params": p}, jnp.asarray(b["eeg1"]), jnp.asarray(b["eeg2"]),
        capture=True, mutable=["intermediates"]))
    total = None
    class_sums = None
    counts = np.zeros(num_classes, np.int64)
    n = 0
    for batch in batches:
        _, state = fn(params, batch)
        w = np.asarray(state["intermediates"]["cross_attn"]["attn_weights_1to2"][0])
        w = w.mean(axis=1)  # head-average -> (B, T, T)
        labels = np.asarray(batch["label"])
        if total is None:
            total = np.zeros(w.shape[1:], np.float64)
            class_sums = np.zeros((num_classes,) + w.shape[1:], np.float64)
        total += w.sum(axis=0)
        for c in range(num_classes):
            sel = labels == c
            if sel.any():
                class_sums[c] += w[sel].sum(axis=0)
                counts[c] += int(sel.sum())
        n += w.shape[0]
    mean_map = (total / max(n, 1)).astype(np.float32)
    class_means = (class_sums / np.maximum(counts, 1)[:, None, None]).astype(np.float32)
    return {
        "mean_map": mean_map,
        "class_means": class_means,
        "diagonals": {c: np.diagonal(class_means[c]) for c in range(num_classes)},
        "counts": counts,
    }


def extract_embeddings(inference: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """z_fuse proxy [cls1, cls2, |cls1-cls2|] (+ ibs_token passthrough)."""
    cls1, cls2 = inference["cls1"], inference["cls2"]
    out = {"z_fuse": np.concatenate([cls1, cls2, np.abs(cls1 - cls2)], axis=1)}
    if "ibs_token" in inference:
        out["ibs_token"] = inference["ibs_token"]
    return out


def gradcam_spectrogram(model_perturb, params, batches: Iterator[Dict],
                        num_classes: int = 3, out_size: int = 64,
                        stream: str = "spec1") -> np.ndarray:
    """Per-class mean Grad-CAM over the spectrogram conv2 activation.

    ``model_perturb`` must be built with ``enable_perturb=True`` (same params
    tree; the 'perturbations' collection is synthesized as zeros here).
    Returns (num_classes, out_size, out_size).
    """
    def forward(p, perturbations, batch):
        out, state = model_perturb.apply(
            {"params": p, "perturbations": perturbations},
            jnp.asarray(batch["eeg1"]), jnp.asarray(batch["eeg2"]),
            mutable=["intermediates"],
        )
        return out["logits"], state["intermediates"]

    # The perturbation tree's per-sample shapes are static — init the model
    # ONCE (a full forward incl. the connectivity block) and only rebuild the
    # cheap zero arrays per batch; re-initing inside the loop costs one
    # redundant full-model execution per batch.
    _pert_struct = {}

    def zero_perturbations(batch):
        if not _pert_struct:
            variables = model_perturb.init(
                jax.random.PRNGKey(0), jnp.asarray(batch["eeg1"][:1]),
                jnp.asarray(batch["eeg2"][:1]))
            _pert_struct["tree"] = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape[1:], x.dtype),
                variables.get("perturbations", {}))
        n = batch["eeg1"].shape[0] * batch["eeg1"].shape[1]
        return jax.tree_util.tree_map(
            lambda sd: jnp.zeros((n,) + sd.shape, sd.dtype),
            _pert_struct["tree"])

    @jax.jit
    def cam_for_class(p, perturbations, batch, class_idx):
        def score(pert):
            logits, inter = forward(p, pert, batch)
            return jnp.sum(logits[:, class_idx]), inter

        grads, inter = jax.grad(score, has_aux=True)(perturbations)
        key = f"{stream}_conv2"
        act = inter["spectrogram_generator"][f"{stream}_conv2_act"][0]
        g = grads["spectrogram_generator"][key]
        # Grad-CAM: channel weights = spatial mean of grads; cam = relu(sum).
        w = jnp.mean(g, axis=(1, 2), keepdims=True)  # (N,1,1,ch)
        cam = jax.nn.relu(jnp.sum(w * act, axis=-1))  # (N, F', T')
        cam = jax.image.resize(cam, (cam.shape[0], out_size, out_size), "bilinear")
        return cam

    sums = np.zeros((num_classes, out_size, out_size), np.float64)
    counts = np.zeros(num_classes, np.int64)
    for batch in batches:
        pert = zero_perturbations(batch)
        labels = np.asarray(batch["label"])
        b, c = batch["eeg1"].shape[:2]
        for cls in range(num_classes):
            sel = labels == cls
            if not sel.any():
                continue
            cam = np.asarray(cam_for_class(params, pert, batch, cls))
            cam = cam.reshape(b, c, out_size, out_size).mean(axis=1)  # avg channels
            sums[cls] += cam[sel].sum(axis=0)
            counts[cls] += int(sel.sum())
    return (sums / np.maximum(counts, 1)[:, None, None]).astype(np.float32)
