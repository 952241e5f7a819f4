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

# Filename convention parsers (analyze_entropy.py:110-179 role).
_PATTERNS = {
    "Single": re.compile(r"single", re.I),
    "Competition": re.compile(r"comp", re.I),
    "Cooperation": re.compile(r"coop", re.I),
}


def parse_condition(name: str):
    for cond, pat in _PATTERNS.items():
        if pat.search(name):
            return cond
    return None


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
    ap.add_argument("--trials", type=int, default=30)
    ap.add_argument("--fs", type=float, default=256.0)
    args = ap.parse_args(argv)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    setup_academic_style()

    if args.mock:
        gaze_df, eeg_df = generate_mock_data()
    else:
        gaze_df, eeg_df = compute_real_entropy(args.trials, args.fs)

    gaze_df.to_csv(out / "gaze_entropy_raw.csv", index=False)
    eeg_df.to_csv(out / "eeg_entropy_raw.csv", index=False)

    for df, col, tag in ((gaze_df, "spatial_entropy", "gaze"),
                         (eeg_df, "mean_entropy", "eeg")):
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

    print(f"[analyze_entropy] done -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
