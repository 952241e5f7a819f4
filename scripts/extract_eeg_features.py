#!/usr/bin/env python
"""Offline EEG feature extraction: PSD, band energy, intra/inter connectivity.

TPU-native rebuild of ``2_Preprocessing/scripts/extract_eeg_features.py``
(:762-1119): per trial it computes Welch PSD, 5-band energies, intra-brain
(2, 7, 5, C, C) and inter-brain (7, 5, C, C) connectivity — as ONE
jit-compiled program per trial instead of joblib-parallel scipy loops.
``--resume`` skips trials whose .npy already exists (:873-882 parity).

Output per trial: features/trial_{i:05d}.npz with keys
{psd, band_energy, intra (2,7,5,C,C), inter (7,5,C,C), label, pair}.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from eyegaze_tpu.data.synthetic import synthetic_eeg_pair_dataset
from eyegaze_tpu.ops.features import (
    FEATURE_BANDS_5,
    band_energy,
    inter_connectivity,
    intra_connectivity,
)
from eyegaze_tpu.ops.spectral import welch_psd


def get_completed_trials(out_dir: Path) -> set:
    return {int(p.stem.split("_")[1]) for p in out_dir.glob("trial_*.npz")}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", default=None)
    ap.add_argument("--output-dir", default="data/features")
    ap.add_argument("--sampling-rate", type=float, default=250.0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--synthetic-trials", type=int, default=None)
    ap.add_argument("--row-chunk", type=int, default=8)
    args = ap.parse_args(argv)

    if args.input_dir:
        d = Path(args.input_dir)
        eeg1 = np.load(d / "eeg1.npy")
        eeg2 = np.load(d / "eeg2.npy")
        labels = np.load(d / "labels.npy")
        pairs = np.load(d / "pairs.npy")
    else:
        n = args.synthetic_trials or 8
        data = synthetic_eeg_pair_dataset(n=n, C=32, T=2048,
                                          fs=args.sampling_rate, seed=42)
        eeg1, eeg2, labels, pairs = (data["eeg1"], data["eeg2"],
                                     data["label"], data["pair"])
        print(f"[extract] synthetic mode: {n} trials")

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    done = get_completed_trials(out) if args.resume else set()

    fs = args.sampling_rate
    rc = args.row_chunk

    @jax.jit
    def trial_features(e1, e2):
        _, psd1 = welch_psd(e1, fs)
        _, psd2 = welch_psd(e2, fs)
        be1 = band_energy(e1, fs)
        be2 = band_energy(e2, fs)
        intra = jnp.stack([
            intra_connectivity(e1, fs, row_chunk=rc),
            intra_connectivity(e2, fs, row_chunk=rc),
        ])
        inter = inter_connectivity(e1, e2, fs, row_chunk=rc)
        return {
            "psd": jnp.stack([psd1, psd2]),
            "band_energy": jnp.stack([be1, be2]),
            "intra": intra,
            "inter": inter,
        }

    t0 = time.time()
    n_done = 0
    for i in range(len(labels)):
        if i in done:
            continue
        feats = trial_features(jnp.asarray(eeg1[i]), jnp.asarray(eeg2[i]))
        np.savez(
            out / f"trial_{i:05d}.npz",
            **{k: np.asarray(v) for k, v in feats.items()},
            label=labels[i], pair=pairs[i],
        )
        n_done += 1
    dt = time.time() - t0
    print(f"[extract] {n_done} trials in {dt:.1f}s "
          f"({n_done / max(dt, 1e-9):.2f} trials/s) -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
