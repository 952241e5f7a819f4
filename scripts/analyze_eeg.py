#!/usr/bin/env python
"""EEG model analysis CLI — metrics, frequency sensitivity, IBS connectivity,
embeddings, attention, Grad-CAM.

Rebuild of ``7_Analysis/python_scripts/analyze_eeg.py`` with the same
selectable analyses (``--analyses metrics,frequency,ibs,embedding,attention,
gradcam`` or ``all``) and the same MATLAB-facing CSV output tree
(io_csv.ensure_output_dirs schema).  The model is reconstructed from the
config embedded in the orbax checkpoint meta (analyze_eeg.py:105-171 role);
without a checkpoint it runs on a freshly initialized model over synthetic
data (pipeline smoke mode).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from eyegaze_tpu.analysis import (
    BAND_NAMES,
    FEATURE_NAMES,
    STANDARD_32_CHANNELS,
    extract_attention_maps,
    extract_embeddings,
    extract_ibs_matrices,
    frequency_sensitivity,
    gradcam_spectrogram,
    run_inference,
    tsne_embed,
    umap_embed,
)
from eyegaze_tpu.data.loader import DualEEGWindowDataset
from eyegaze_tpu.data.metadata import stratified_split
from eyegaze_tpu.data.synthetic import synthetic_eeg_pair_dataset
from eyegaze_tpu.models.dual_eeg import DualEEGTransformer
from eyegaze_tpu.train.metrics import classification_metrics, roc_curves
from eyegaze_tpu.utils import io_csv

CLASS_NAMES = ["Single", "Competition", "Cooperation"]
ALL_ANALYSES = ("metrics", "frequency", "ibs", "embedding", "attention", "gradcam")


def load_model_and_params(args):
    """Rebuild the model from checkpoint-embedded config + restore params."""
    model_kw = dict(in_channels=args.channels, d_model=args.d_model,
                    num_layers=args.num_layers, num_heads=args.num_heads,
                    d_ff=args.d_ff, max_len=max(args.window // 4, 256),
                    sampling_rate=args.fs)
    params = None
    if args.checkpoint:
        import orbax.checkpoint as ocp

        ckpt_dir = Path(args.checkpoint).resolve()  # orbax requires absolute
        meta_path = ckpt_dir.parent / f"{ckpt_dir.name}.meta.json"
        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
            mc = meta.get("config", {}).get("model", {})
            abl = meta.get("config", {}).get("ablation", {})
            if mc:
                model_kw.update(
                    in_channels=mc.get("in_channels", args.channels),
                    d_model=mc.get("d_model", args.d_model),
                    num_layers=mc.get("num_layers", args.num_layers),
                    num_heads=mc.get("num_heads", args.num_heads),
                    d_ff=mc.get("d_ff", args.d_ff),
                )
            if abl:
                model_kw.update(
                    use_spectrogram=abl.get("use_spectrogram", True),
                    use_ibs=abl.get("use_ibs", True),
                    use_robust_ibs=abl.get("ibs_mode", "robust") == "robust",
                    use_cross_attention=abl.get("use_cross_attention", True),
                    ibs_instance_norm=abl.get("ibs_instance_norm", True),
                    ibs_feature_type=abl.get("ibs_feature_type", "all"),
                )
        restored = ocp.StandardCheckpointer().restore(ckpt_dir)
        params = jax.tree_util.tree_map(jnp.asarray, restored["params"])
    model = DualEEGTransformer(**model_kw)
    return model, params, model_kw


def make_batches(args, model, params):
    data = synthetic_eeg_pair_dataset(n=args.trials, C=args.channels,
                                      T=max(args.window, 1024), fs=args.fs, seed=42)
    idx = list(range(len(data["label"])))
    _, val_idx = stratified_split(idx, data["label"], test_size=0.2, seed=42)
    val_idx = np.asarray(val_idx)
    ds = DualEEGWindowDataset(data["eeg1"][val_idx], data["eeg2"][val_idx],
                              data["label"][val_idx], window_size=args.window,
                              stride=args.window // 2, pairs=data["pair"][val_idx])
    return lambda: ds.iter_batches(args.batch_size)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output-dir", default="runs/analysis_eeg")
    ap.add_argument("--analyses", default="all")
    ap.add_argument("--trials", type=int, default=24)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--window", type=int, default=1024)
    ap.add_argument("--fs", type=float, default=256.0)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--num-layers", type=int, default=6)
    ap.add_argument("--num-heads", type=int, default=8)
    ap.add_argument("--d-ff", type=int, default=1024)
    ap.add_argument("--render-figures", action="store_true",
                    help="after exporting CSVs, render the MATLAB figure "
                         "suites natively (analysis/matlab_parity.py)")
    args = ap.parse_args(argv)

    analyses = ALL_ANALYSES if args.analyses == "all" else tuple(args.analyses.split(","))
    model, params, model_kw = load_model_and_params(args)
    if params is None:
        print("[analyze_eeg] no checkpoint: using random init (smoke mode)")
        r = np.random.default_rng(0)
        e = jnp.asarray(r.normal(size=(1, args.channels, args.window)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), e, e)["params"]

    batches_fn = make_batches(args, model, params)
    dirs = io_csv.ensure_output_dirs(args.output_dir)

    # The baseline full-dataset forward feeds metrics, frequency (baseline
    # acc/F1), and embeddings; ibs/attention/gradcam run their own extractors,
    # so don't pay an extra full inference (plus compile) for those alone.
    labels = preds = probs = baseline = inference = None
    if {"metrics", "frequency", "embedding"} & set(analyses):
        inference = run_inference(model, params, batches_fn())
        labels, preds, probs = (inference["labels"], inference["preds"],
                                inference["probs"])
        baseline = classification_metrics(jnp.asarray(labels), jnp.asarray(preds))

    if "metrics" in analyses:
        print("[analyze_eeg] core metrics")
        io_csv.save_confusion_matrix(np.asarray(baseline["confusion_matrix"]),
                                     dirs["core_metrics"] / "confusion_matrix.csv",
                                     CLASS_NAMES)
        io_csv.save_classification_report(labels, preds,
                                          dirs["core_metrics"] / "classification_report.csv",
                                          CLASS_NAMES)
        io_csv.save_overall_metrics(
            {k: float(v) for k, v in baseline.items() if np.ndim(v) == 0},
            dirs["core_metrics"] / "overall_metrics.csv")
        io_csv.save_predictions(labels, preds, probs,
                                dirs["core_metrics"] / "predictions.csv", CLASS_NAMES)
        roc = roc_curves(labels, probs)
        io_csv.save_overall_metrics(
            {"macro_auc": roc["macro_auc"], "micro_auc": roc["micro"]["auc"]},
            dirs["core_metrics"] / "roc_auc.csv")

    if "frequency" in analyses and model_kw.get("use_ibs", True):
        print("[analyze_eeg] frequency sensitivity")

        def factory(band_idx):
            return DualEEGTransformer(mask_band=band_idx, **model_kw)

        sens = frequency_sensitivity(factory, params, batches_fn)
        io_csv.save_frequency_sensitivity(
            sens, dirs["frequency_sensitivity"] / "band_sensitivity.csv",
            float(baseline["accuracy"]), float(baseline["f1_macro"]))

    if "ibs" in analyses and model_kw.get("use_ibs", True):
        print("[analyze_eeg] IBS connectivity export")
        ibs = extract_ibs_matrices(model, params, batches_fn())
        chans = STANDARD_32_CHANNELS[: args.channels]
        io_csv.save_channel_names(chans, dirs["ibs_connectivity"] / "channel_names.csv")
        for ci, cname in enumerate(CLASS_NAMES):
            for bi, band in enumerate(BAND_NAMES):
                for fi, feat in enumerate(FEATURE_NAMES):
                    io_csv.save_ibs_matrix(
                        ibs["class_means"][ci, bi, fi],
                        dirs["ibs_mean_by_class"] / f"{cname}_{band}_{feat}.csv")
        for bi, band in enumerate(BAND_NAMES):
            for fi, feat in enumerate(FEATURE_NAMES):
                io_csv.save_ibs_matrix(
                    ibs["diff_coop_vs_comp"][bi, fi],
                    dirs["ibs_difference"] / f"diff_{band}_{feat}.csv")

    if "embedding" in analyses:
        print("[analyze_eeg] embeddings")
        emb = extract_embeddings(inference)
        for name, feats in emb.items():
            proj = tsne_embed(feats, perplexity=min(30.0, max(len(feats) - 1, 2)))
            df = pd.DataFrame({
                "Sample_ID": np.arange(len(proj)),
                "True_Label": [CLASS_NAMES[int(t)] for t in labels],
                "Pred_Label": [CLASS_NAMES[int(p)] for p in preds],
                "Dim_1": proj[:, 0], "Dim_2": proj[:, 1],
            })
            io_csv.save_embedding_results(
                df, dirs["feature_embeddings"] / f"tsne_{name}.csv")
            uproj = umap_embed(feats)
            if uproj is not None:
                df[["Dim_1", "Dim_2"]] = uproj
                io_csv.save_embedding_results(
                    df, dirs["feature_embeddings"] / f"umap_{name}.csv")

    if "attention" in analyses and model_kw.get("use_cross_attention", True):
        print("[analyze_eeg] attention maps")
        att = extract_attention_maps(model, params, batches_fn())
        io_csv.save_attention_matrix(att["mean_map"],
                                     dirs["attention_weights"] / "mean_attention.csv")
        summary = []
        for ci, cname in enumerate(CLASS_NAMES):
            m = att["class_means"][ci]
            io_csv.save_attention_matrix(
                m, dirs["attention_mean_by_class"] / f"attention_{cname}.csv")
            diag = np.diagonal(m)
            off = m[~np.eye(m.shape[0], dtype=bool)]
            summary.append({
                "Class": cname,
                "Mean_Diagonal": float(diag.mean()), "Std_Diagonal": float(diag.std()),
                "Mean_OffDiag": float(off.mean()), "Std_OffDiag": float(off.std()),
            })
        io_csv.save_attention_summary(summary,
                                      dirs["attention_weights"] / "attention_summary.csv")

    if "gradcam" in analyses and model_kw.get("use_spectrogram", True):
        print("[analyze_eeg] Grad-CAM")
        model_p = DualEEGTransformer(enable_perturb=True, **model_kw)
        cams = gradcam_spectrogram(model_p, params, batches_fn(), out_size=64)
        for ci, cname in enumerate(CLASS_NAMES):
            io_csv.save_gradcam_results(
                cams[ci], dirs["gradcam_mean_by_class"] / f"gradcam_{cname}.csv")
        freq_axis = np.linspace(0, args.fs / 2, 64)
        time_axis = np.linspace(0, args.window / args.fs, 64)
        io_csv.save_gradcam_metadata(freq_axis, time_axis,
                                     dirs["gradcam"] / "gradcam_metadata.csv",
                                     int(args.fs))

    if args.render_figures:
        from eyegaze_tpu.analysis.matlab_parity import (
            render_all_suites,
            render_frequency_sensitivity_bar,
        )

        print("[analyze_eeg] rendering MATLAB figure suites natively")
        rendered = render_all_suites(args.output_dir,
                                     Path(args.output_dir) / "figures")
        for suite, artifacts in rendered.items():
            print(f"[analyze_eeg]   {suite}: {len(artifacts)} artifacts")
        band_csv = dirs["frequency_sensitivity"] / "band_sensitivity.csv"
        if band_csv.exists():  # analyze_eeg.m:269-341 grouped-bar figure
            render_frequency_sensitivity_bar(
                band_csv, Path(args.output_dir) / "figures" /
                "freq_sensitivity_grouped_bar.png")
            print("[analyze_eeg]   frequency_sensitivity: 1 artifact")

    print(f"[analyze_eeg] done -> {args.output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
