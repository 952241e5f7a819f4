#!/usr/bin/env python
"""Entropy analysis CLI — gaze spatial entropy + EEG spectral entropy by
condition.

Rebuild of ``7_Analysis/python_scripts/analyze_entropy.py``: condition
parsers, batch entropy computation (on-device, vmapped — the reference loops
per file), mock-data generator with per-condition entropy distributions
(:296-402 parity), summary stats, condition comparisons, CSV + figures.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np
import pandas as pd

from eyegaze_tpu.analysis.eeg_introspect import STANDARD_32_CHANNELS, CHANNEL_POSITIONS_2D
from eyegaze_tpu.data.synthetic import synthetic_eeg_pair_dataset, synthetic_gaze_pair_dataset
from eyegaze_tpu.ops.entropy import spatial_entropy, spectral_entropy
from eyegaze_tpu.utils.visualizers import (
    plot_entropy_boxplot,
    plot_entropy_kde,
    plot_entropy_violin,
    plot_topomap,
    setup_academic_style,
)

CONDITIONS = ("Single", "Competition", "Cooperation")

# Filename convention parsers — the reference's three patterns
# (7_Analysis/python_scripts/analyze_entropy.py:110-179):
#   Single:      Pair-{id}-{A|B}-Single-EYE_trial{n}_{player|observer}.csv
#   Competition: Pair-{id}-Comp-EYE_trial{n}_{playerA|playerB}.csv
#   Cooperation: Pair-{id}-Coop-EYE_trial{n}_{playerA|playerB}.csv
_SINGLE_RE = re.compile(r"Pair-(\d+)-([AB])-Single-EYE_trial(\d+)_(player|observer)\.csv")
_COMP_RE = re.compile(r"Pair-(\d+)-Comp-EYE_trial(\d+)_(playerA|playerB)\.csv")
_COOP_RE = re.compile(r"Pair-(\d+)-Coop-EYE_trial(\d+)_(playerA|playerB)\.csv")


def parse_eeg_filename(filename: str):
    """pair_id/condition/trial_idx/player from an EEG CSV filename, or None."""
    m = _SINGLE_RE.match(filename)
    if m:
        pair_id, ab, trial_idx, role = m.groups()
        return {"pair_id": int(pair_id), "condition": "Single",
                "trial_idx": int(trial_idx), "player": f"{ab}_{role}"}
    for pat, cond in ((_COMP_RE, "Competition"), (_COOP_RE, "Cooperation")):
        m = pat.match(filename)
        if m:
            pair_id, trial_idx, player = m.groups()
            return {"pair_id": int(pair_id), "condition": cond,
                    "trial_idx": int(trial_idx), "player": player}
    return None


def parse_gaze_filename(filename: str):
    """Same conventions with .jpg/.png extension (analyze_entropy.py:164-179)."""
    base = filename.replace(".jpg", ".csv").replace(".png", ".csv")
    return parse_eeg_filename(base)


def scan_eeg_files(eeg_dir):
    """Scan *.csv under ``eeg_dir`` for reference-convention filenames
    (analyze_entropy.py:224-257)."""
    eeg_path = Path(eeg_dir)
    if not eeg_path.exists():
        raise FileNotFoundError(f"EEG directory not found: {eeg_dir}")
    files = []
    for f in sorted(eeg_path.glob("*.csv")):
        meta = parse_eeg_filename(f.name)
        if meta is not None:
            meta["filepath"] = str(f)
            meta["filename"] = f.name
            files.append(meta)
    print(f"[scan] {len(files)} EEG CSV files in {eeg_dir}")
    return files


def scan_gaze_files(gaze_dir):
    """Scan *.jpg / *.png under ``gaze_dir`` (analyze_entropy.py:259-294)."""
    gaze_path = Path(gaze_dir)
    if not gaze_path.exists():
        raise FileNotFoundError(f"Gaze directory not found: {gaze_dir}")
    files = []
    for pattern in ("*.jpg", "*.png"):
        for f in sorted(gaze_path.glob(pattern)):
            meta = parse_gaze_filename(f.name)
            if meta is not None:
                meta["filepath"] = str(f)
                meta["filename"] = f.name
                files.append(meta)
    print(f"[scan] {len(files)} gaze image files in {gaze_dir}")
    return files


def _chunk_size(per_item_elems: int, budget_elems: int = 80_000_000) -> int:
    """Items per device call so f32 intermediates stay ~<320 MB HBM.

    Full-resolution 3000x1583 gaze heatmaps are ~4.75 M pixels each; sending a
    whole directory in one batch OOMs the 16 GB chip (observed: 12 GB HBM
    requested for 224 images).  Chunking costs nothing measurable — each chunk
    is still one vmapped call on the same compiled program."""
    return max(1, budget_elems // max(1, per_item_elems))


def analyze_gaze_entropy_files(file_list) -> pd.DataFrame:
    """Spatial entropy over actual image files (analyze_entropy.py:409-461).

    The reference loops one image at a time through a NumPy calculator; here
    images are grouped by shape and each group runs as HBM-bounded vmapped
    device calls.  Decoding is streamed: a shape group is flushed to the
    device as soon as it holds one chunk, so host RAM stays ~one chunk of
    decoded pixels per shape (a full 4,463-trial tree of 3000x1583 JPGs is
    ~127 GB decoded — far past the 1-core host — but one 16-image chunk is
    ~230 MB)."""
    from PIL import Image

    rows = []
    pending: dict = {}  # shape -> [(info, decoded array), ...], <= 1 chunk
    n_shapes: set = set()

    def flush(shape):
        items = pending.pop(shape, [])
        if not items:
            return
        batch = jnp.asarray(np.stack([a for _, a in items]))
        ents = np.asarray(spatial_entropy(batch))
        for (info, _), ent in zip(items, ents):
            rows.append({"pair_id": info["pair_id"], "player": info["player"],
                         "trial_idx": info["trial_idx"],
                         "condition": info["condition"],
                         "spatial_entropy": float(ent)})

    for info in file_list:
        try:
            with Image.open(info["filepath"]) as im:
                arr = np.asarray(im)
        except Exception as e:
            print(f"[warn] skipping {info['filename']}: {e}")
            continue
        n_shapes.add(arr.shape)
        pending.setdefault(arr.shape, []).append((info, arr))
        if len(pending[arr.shape]) >= _chunk_size(int(np.prod(arr.shape[:2]))):
            flush(arr.shape)
    for shape in list(pending):
        flush(shape)
    df = pd.DataFrame(rows)
    print(f"[gaze] spatial entropy for {len(df)} images "
          f"({len(n_shapes)} shape group(s))")
    return df


def analyze_eeg_entropy_files(
    file_list, fs: float, filter_low=0.5, filter_high=50.0,
    n_channels: int = 32,
) -> pd.DataFrame:
    """Spectral entropy over actual EEG CSV trees (analyze_entropy.py:464-535).

    CSVs are parsed by the native C++ loader (numpy fallback), grouped by
    (rows, cols) so each uniform-shape group is ONE batched device call:
    filtfilt bandpass + Welch PSD + Shannon entropy, vmapped over trials.
    Files without exactly ``n_channels`` rows are skipped with a warning,
    matching the reference's channel check.
    """
    from eyegaze_tpu.data.native import load_csv_f32

    rows = []
    pending: dict = {}  # (r, c) -> [(info, array), ...], at most one chunk
    n_shapes: set = set()

    def flush(shape):
        items = pending.pop(shape, [])
        if not items:
            return
        ents = np.asarray(spectral_entropy(
            jnp.asarray(np.stack([a for _, a in items])),
            fs, filter_low=filter_low, filter_high=filter_high))
        for (info, _), ent in zip(items, ents):
            row = {"pair_id": info["pair_id"], "player": info["player"],
                   "trial_idx": info["trial_idx"],
                   "condition": info["condition"],
                   "mean_entropy": float(ent.mean())}
            row.update({name: float(v) for name, v in
                        zip(STANDARD_32_CHANNELS, ent)})
            rows.append(row)

    for info in file_list:
        try:
            arr, r, c = load_csv_f32(info["filepath"], max_rows=n_channels + 8,
                                     max_cols=65536)
        except Exception as e:
            print(f"[warn] skipping {info['filename']}: {e}")
            continue
        if r != n_channels:
            print(f"[warn] {info['filename']} has {r} channels, "
                  f"expected {n_channels} — skipped")
            continue
        n_shapes.add((r, c))
        pending.setdefault((r, c), []).append((info, arr[:r, :c].copy()))
        if len(pending[(r, c)]) >= _chunk_size(r * c):
            flush((r, c))
    for shape in list(pending):
        flush(shape)
    df = pd.DataFrame(rows)
    print(f"[eeg] spectral entropy for {len(df)} trials "
          f"({len(n_shapes)} shape group(s))")
    return df


def generate_mock_data(n_subjects=5, trials_per_condition=None, seed=42):
    """Per-condition entropy distributions (analyze_entropy.py:296-402 parity):
    Single low, Competition high, Cooperation medium."""
    if trials_per_condition is None:
        trials_per_condition = {"Single": 40, "Competition": 20, "Cooperation": 20}
    rng = np.random.default_rng(seed)
    gaze_params = {"Single": (4.5, 0.4), "Competition": (5.2, 0.5),
                   "Cooperation": (4.8, 0.3)}
    eeg_params = {"Single": (3.8, 0.3), "Competition": (4.5, 0.4),
                  "Cooperation": (4.1, 0.35)}
    gaze_rows, eeg_rows = [], []
    for s in range(n_subjects):
        pair_id = 12 + s
        for player in ("playerA", "playerB"):
            for cond, n in trials_per_condition.items():
                gm, gs = gaze_params[cond]
                em, es = eeg_params[cond]
                for trial in range(n):
                    gaze_rows.append({
                        "pair_id": pair_id, "player": player, "trial_idx": trial + 1,
                        "condition": cond,
                        "spatial_entropy": float(rng.normal(gm, gs)),
                    })
                    ch = rng.normal(em, es, 32)
                    row = {"pair_id": pair_id, "player": player,
                           "trial_idx": trial + 1, "condition": cond,
                           "mean_entropy": float(ch.mean())}
                    row.update({name: float(v) for name, v in
                                zip(STANDARD_32_CHANNELS, ch)})
                    eeg_rows.append(row)
    return pd.DataFrame(gaze_rows), pd.DataFrame(eeg_rows)


def compute_real_entropy(n_trials: int, fs: float, seed: int = 42):
    """Compute entropies from the synthetic signal generators on device —
    the actual batched entropy path (replaces per-file loops)."""
    gaze = synthetic_gaze_pair_dataset(n=n_trials, H=112, W=112, seed=seed)
    eeg = synthetic_eeg_pair_dataset(n=n_trials, C=32, T=1024, fs=fs, seed=seed)
    g_ent = np.asarray(spatial_entropy(jnp.asarray(gaze["img1"])))
    e_ent = np.asarray(spectral_entropy(jnp.asarray(eeg["eeg1"]), fs))  # (N, C)
    gaze_df = pd.DataFrame({
        "pair_id": gaze["pair"], "condition": [CONDITIONS[l] for l in gaze["label"]],
        "spatial_entropy": g_ent,
    })
    eeg_df = pd.DataFrame({
        "pair_id": eeg["pair"], "condition": [CONDITIONS[l] for l in eeg["label"]],
        "mean_entropy": e_ent.mean(axis=1),
        **{name: e_ent[:, i] for i, name in enumerate(STANDARD_32_CHANNELS)},
    })
    return gaze_df, eeg_df


def condition_comparison(df: pd.DataFrame, col: str) -> pd.DataFrame:
    from scipy import stats as sstats

    rows = []
    groups = {c: df.loc[df.condition == c, col].to_numpy() for c in CONDITIONS
              if (df.condition == c).any()}
    for c, v in groups.items():
        rows.append({"Condition": c, "Mean": v.mean(), "Std": v.std(),
                     "N": len(v)})
    stats_df = pd.DataFrame(rows)
    tests = []
    names = list(groups)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            t, p = sstats.ttest_ind(groups[a], groups[b], equal_var=False)
            tests.append({"A": a, "B": b, "t": t, "p": p})
    return stats_df, pd.DataFrame(tests)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--output-dir", default="runs/analysis_entropy")
    ap.add_argument("--mock", action="store_true",
                    help="use the mock per-condition distributions")
    ap.add_argument("--gaze-dir", default=None,
                    help="directory of reference-convention gaze JPG/PNGs")
    ap.add_argument("--eeg-dir", default=None,
                    help="directory of reference-convention EEG CSVs")
    ap.add_argument("--trials", type=int, default=30)
    ap.add_argument("--fs", type=float, default=256.0)
    ap.add_argument("--filter-low", type=float, default=0.5)
    ap.add_argument("--filter-high", type=float, default=50.0)
    args = ap.parse_args(argv)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    setup_academic_style()

    if args.gaze_dir or args.eeg_dir:
        # Real-file path: scan directory trees with the reference's filename
        # conventions and compute entropy from disk, batched on device.
        gaze_df = (analyze_gaze_entropy_files(scan_gaze_files(args.gaze_dir))
                   if args.gaze_dir else pd.DataFrame())
        eeg_df = (analyze_eeg_entropy_files(
                      scan_eeg_files(args.eeg_dir), args.fs,
                      args.filter_low, args.filter_high)
                  if args.eeg_dir else pd.DataFrame())
        if gaze_df.empty and eeg_df.empty:
            print("[analyze_entropy] no parseable files found")
            return 1
    elif args.mock:
        gaze_df, eeg_df = generate_mock_data()
    else:
        gaze_df, eeg_df = compute_real_entropy(args.trials, args.fs)

    gaze_df.to_csv(out / "gaze_entropy_raw.csv", index=False)
    eeg_df.to_csv(out / "eeg_entropy_raw.csv", index=False)

    # Per-pair / per-player summaries (compute_summary_statistics role,
    # analyze_entropy.py:537-585) — only meaningful when those columns exist.
    for df, col, tag in ((gaze_df, "spatial_entropy", "gaze"),
                         (eeg_df, "mean_entropy", "eeg")):
        if not df.empty and {"pair_id", "condition"} <= set(df.columns):
            keys = [k for k in ("pair_id", "player", "condition") if k in df.columns]
            df.groupby(keys)[col].agg(["mean", "std", "count"]).reset_index().to_csv(
                out / f"{tag}_entropy_by_pair.csv", index=False)

    for df, col, tag in ((gaze_df, "spatial_entropy", "gaze"),
                         (eeg_df, "mean_entropy", "eeg")):
        if df.empty:
            continue
        stats_df, tests_df = condition_comparison(df, col)
        stats_df.to_csv(out / f"{tag}_entropy_summary.csv", index=False)
        tests_df.to_csv(out / f"{tag}_entropy_tests.csv", index=False)
        by_cond = {c: df.loc[df.condition == c, col].to_numpy()
                   for c in CONDITIONS if (df.condition == c).any()}
        plot_entropy_boxplot(by_cond, out / f"{tag}_entropy_boxplot.png",
                             title=f"{tag} entropy by condition")
        plot_entropy_kde(by_cond, out / f"{tag}_entropy_kde.png",
                         title=f"{tag} entropy distribution")
        plot_entropy_violin(by_cond, out / f"{tag}_entropy_violin.png",
                            title=f"{tag} entropy by condition")

    # EEG per-channel topomap of condition differences.
    ch_cols = [c for c in STANDARD_32_CHANNELS if c in eeg_df.columns]
    if ch_cols:
        coop = eeg_df.loc[eeg_df.condition == "Cooperation", ch_cols].mean()
        comp = eeg_df.loc[eeg_df.condition == "Competition", ch_cols].mean()
        if coop.notna().all() and comp.notna().all():
            plot_topomap((coop - comp).to_numpy(), CHANNEL_POSITIONS_2D, ch_cols,
                         out / "eeg_entropy_topomap_coop_minus_comp.png",
                         title="Spectral entropy: Coop - Comp")

    # MATLAB-suite figures from the raw CSVs (analyze_gaze.m fig_* set +
    # analyze_eeg.m's entropy trio) — native, analysis/matlab_parity.py.
    from eyegaze_tpu.analysis.matlab_parity import render_entropy_suite

    rendered = render_entropy_suite(out, out / "figures",
                                    positions=CHANNEL_POSITIONS_2D)
    for name in rendered:
        print(f"[analyze_entropy] figure: {name}")

    print(f"[analyze_entropy] done -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
