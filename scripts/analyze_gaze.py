#!/usr/bin/env python
"""Gaze model analysis CLI — metrics, features/t-SNE, error analysis,
saliency/Grad-CAM, multi-model comparison.

Rebuild of ``7_Analysis/python_scripts/analyze_gaze.py``: quantitative
(metrics/CM/ROC) -> qualitative (CLS features, t-SNE) -> error (per-pair
accuracy, mechanism stats) pipeline, plus ``--compare`` multi-model mode
producing a comparison table.  Runs on synthetic gaze pairs when no real
data/checkpoint is given (smoke mode).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from eyegaze_tpu.analysis import (
    ErrorAnalyzer,
    MechanismAnalyzer,
    ModelResults,
    MultiModelComparator,
    extract_cls_features,
    input_saliency,
    tsne_embed,
    vit_gradcam,
)
from eyegaze_tpu.data.image_fusion import imagenet_normalize
from eyegaze_tpu.data.loader import ArrayDataset, batch_iterator
from eyegaze_tpu.data.synthetic import synthetic_gaze_pair_dataset
from eyegaze_tpu.models.vit import EarlyFusionViT, LateFusionViT
from eyegaze_tpu.train.metrics import classification_metrics, roc_curves
from eyegaze_tpu.utils import io_csv
from eyegaze_tpu.utils.visualizers import (
    plot_confusion_matrix,
    plot_embedding_scatter,
    plot_per_pair_accuracy,
    plot_roc_curves,
    setup_academic_style,
)

CLASS_NAMES = ["Single", "Competition", "Cooperation"]


def build_model(kind: str, fusion_mode: str, tiny: bool, enable_perturb=False):
    kw = dict(num_classes=3, fusion_mode=fusion_mode, enable_perturb=enable_perturb)
    if tiny:
        kw.update(img_size=64, embed_dim=64, depth=2, num_heads=4)
    if kind == "early":
        return EarlyFusionViT(**kw)
    return LateFusionViT(**{k: v for k, v in kw.items() if k != "enable_perturb"})


def analyze_one(kind, fusion_mode, params, val_ds, out_dir, tiny):
    model = build_model(kind, fusion_mode, tiny)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    setup_academic_style()

    fn = jax.jit(lambda p, i1, i2: model.apply({"params": p}, i1, i2))
    logits_all, labels_all = [], []
    for batch in batch_iterator(val_ds, 16):
        logits_all.append(np.asarray(fn(params, jnp.asarray(batch["img1"]),
                                        jnp.asarray(batch["img2"]))))
        labels_all.append(batch["label"])
    logits = np.concatenate(logits_all)
    labels = np.concatenate(labels_all)
    preds = logits.argmax(axis=-1)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))

    # Quantitative
    m = classification_metrics(jnp.asarray(labels), jnp.asarray(preds))
    io_csv.save_confusion_matrix(np.asarray(m["confusion_matrix"]),
                                 out_dir / "confusion_matrix.csv", CLASS_NAMES)
    io_csv.save_classification_report(labels, preds,
                                      out_dir / "classification_report.csv", CLASS_NAMES)
    io_csv.save_overall_metrics({k: float(v) for k, v in m.items() if np.ndim(v) == 0},
                                out_dir / "overall_metrics.csv")
    io_csv.save_predictions(labels, preds, probs, out_dir / "predictions.csv", CLASS_NAMES)
    plot_confusion_matrix(np.asarray(m["confusion_matrix"]), out_dir / "confusion_matrix.png")
    roc = roc_curves(labels, probs)
    plot_roc_curves(roc, out_dir / "roc_curves.png")

    # Qualitative: CLS features + t-SNE
    feats = extract_cls_features(model, params, batch_iterator(val_ds, 16))
    proj = tsne_embed(feats["features"], perplexity=min(30.0, max(len(labels) - 1, 2)))
    plot_embedding_scatter(proj, labels, out_dir / "tsne_features.png")
    io_csv.save_embedding_results(
        pd.DataFrame({
            "Sample_ID": np.arange(len(proj)),
            "True_Label": [CLASS_NAMES[int(t)] for t in labels],
            "Pred_Label": [CLASS_NAMES[int(p)] for p in preds],
            "Dim_1": proj[:, 0], "Dim_2": proj[:, 1],
        }),
        out_dir / "tsne_features.csv")

    # Error analysis (per-pair) + gaze mechanism stats
    pairs = val_ds.arrays.get("pair")
    if pairs is not None:
        ea = ErrorAnalyzer(labels, preds, pairs)
        per_pair = ea.per_pair_accuracy()
        pd.DataFrame([{"Pair": p, "Accuracy": a} for p, a in per_pair.items()]).to_csv(
            out_dir / "per_pair_accuracy.csv", index=False)
        plot_per_pair_accuracy(per_pair, out_dir / "per_pair_accuracy.png")
    # Mechanism stats run on the RAW [0,1] heatmaps: after ImageNet
    # normalization the (dominant) background sits at ~-2, so the
    # intensity-weighted center of mass collapses toward the image centroid
    # for every sample and com_distance becomes meaningless.
    raw1 = val_ds.arrays.get("raw1", val_ds.arrays["img1"])
    raw2 = val_ds.arrays.get("raw2", val_ds.arrays["img2"])
    com = np.asarray([
        MechanismAnalyzer.com_distance(raw1[i], raw2[i])
        for i in range(len(val_ds))
    ])
    iou = np.asarray([
        MechanismAnalyzer.iou_overlap(raw1[i], raw2[i])
        for i in range(len(val_ds))
    ])
    mech = {
        "com_distance_vs_correct": MechanismAnalyzer.sensitivity_vs_correctness(
            com, labels == preds),
        "iou_vs_correct": MechanismAnalyzer.sensitivity_vs_correctness(iou, labels == preds),
        "com_per_class_tests": MechanismAnalyzer.per_class_tests(com, labels),
    }
    pd.DataFrame([{"Stat": k, **(v if isinstance(v, dict) else {"value": v})}
                  for k, v in mech.items()
                  if isinstance(v, dict) and "t" in v]).to_csv(
        out_dir / "mechanism_stats.csv", index=False)

    # Saliency on a small sample (early-fusion models only, smoke check)
    if kind == "early":
        s1, _ = input_saliency(model, params,
                               val_ds.arrays["img1"][:2], val_ds.arrays["img2"][:2])
        np.savetxt(out_dir / "saliency_sample.csv", s1[0], delimiter=",", fmt="%.6f")

    return ModelResults(f"{kind}_{fusion_mode}", labels, preds, probs)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["early", "late"], default="early")
    ap.add_argument("--fusion-mode", default="concat")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output-dir", default="runs/analysis_gaze")
    ap.add_argument("--trials", type=int, default=24)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--compare", nargs="*", default=None,
                    help="kind:fusion_mode[:checkpoint] specs to compare — "
                         "per-model trained checkpoints like the reference's "
                         "multi-model mode (run_analysis.py:22-101)")
    args = ap.parse_args(argv)

    # Reconstruct the exact model from the checkpoint's embedded config
    # (same contract as analyze_eeg; reference analyze_gaze.py:150-230 —
    # the ckpt carries its training config).  Without this a tiny-run
    # checkpoint hits a ViT-B shape mismatch on restore.
    def _meta_for(ckpt):
        """(tiny_or_None, fusion_mode_or_None) from the ckpt's embedded config."""
        import json

        meta_path = Path(str(ckpt) + ".meta.json")
        if not meta_path.exists():
            return None, None
        mc = json.loads(meta_path.read_text()).get("config", {}).get("model", {})
        tiny = (int(mc["img_size"]) < 224) if mc.get("img_size") else None
        return tiny, mc.get("fusion_mode")

    compare_specs = []
    if args.compare:
        # Resolve tiny PER SPEC (a one-way ratchet across specs would force
        # full-size checkpoints to be rebuilt tiny -> shape-mismatch crash).
        # Only specs whose checkpoint meta pins an img_size get a vote:
        # init-only specs have no inherent size and adopt the checkpointed
        # consensus (all compared models share one dataset, so pinned sizes
        # cannot mix 64 and 224).
        tiny_by_spec = {}
        for spec in args.compare:
            parts = spec.split(":", 2)
            if len(parts) < 2:
                ap.error(f"--compare spec {spec!r} must be "
                         "kind:fusion_mode[:checkpoint]")
            kind, fm = parts[0], parts[1]
            ckpt = parts[2] if len(parts) > 2 else args.checkpoint
            tiny = None
            if ckpt:
                tiny, _ = _meta_for(ckpt)
            tiny_by_spec[spec] = tiny
            compare_specs.append((kind, fm, ckpt))
        pinned = {v for v in tiny_by_spec.values() if v is not None}
        if len(pinned) > 1:
            raise SystemExit(
                "--compare specs disagree on img_size (tiny 64 vs full 224) and "
                f"cannot share one dataset: {tiny_by_spec}")
        if pinned:
            args.tiny = next(iter(pinned))
    elif args.checkpoint:
        t, fmode = _meta_for(args.checkpoint)
        if t is not None:
            args.tiny = t
        if fmode:
            args.fusion_mode = fmode

    img_size = 64 if args.tiny else 224
    data = synthetic_gaze_pair_dataset(n=args.trials, H=img_size, W=img_size, seed=42)
    img1 = np.asarray(imagenet_normalize(jnp.asarray(data["img1"])))
    img2 = np.asarray(imagenet_normalize(jnp.asarray(data["img2"])))
    # raw [0,1] heatmaps ride along for the mechanism stats (CoM/IoU), which
    # are meaningless on normalized pixels.
    val_ds = ArrayDataset({"img1": img1, "img2": img2, "label": data["label"],
                           "pair": data["pair"],
                           "raw1": np.asarray(data["img1"], np.float32),
                           "raw2": np.asarray(data["img2"], np.float32)})

    def params_for(kind, fusion_mode, checkpoint=None):
        model = build_model(kind, fusion_mode, args.tiny)
        if checkpoint:
            import orbax.checkpoint as ocp

            restored = ocp.StandardCheckpointer().restore(Path(checkpoint).resolve())
            return jax.tree_util.tree_map(jnp.asarray, restored["params"])
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(img1[:1]), jnp.asarray(img2[:1]))
        return v["params"]

    if args.compare:
        results = []
        for kind, fm, ckpt in compare_specs:
            params = params_for(kind, fm, ckpt)
            results.append(analyze_one(kind, fm, params, val_ds,
                                       Path(args.output_dir) / f"{kind}_{fm}", args.tiny))
        comp = MultiModelComparator(results)
        comp.to_csv(Path(args.output_dir) / "comparison_table.csv")
        comp.pairwise_significance().to_csv(
            Path(args.output_dir) / "pairwise_significance.csv", index=False)
        # Full comparison figure suite (model_comparison.py:249-513 role).
        comp.plot_all(Path(args.output_dir) / "comparison_figures")
        print(comp.metric_table().to_string(index=False))
    else:
        params = params_for(args.model, args.fusion_mode, args.checkpoint)
        analyze_one(args.model, args.fusion_mode, params, val_ds,
                    args.output_dir, args.tiny)
    print(f"[analyze_gaze] done -> {args.output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
