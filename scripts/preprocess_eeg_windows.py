#!/usr/bin/env python
"""Offline EEG preprocessing: bandpass -> CAR -> z-score -> sliding windows.

TPU-native rebuild of ``2_Preprocessing/scripts/preprocess_eeg_windows.py``
(:96-712): instead of per-trial scipy calls, the WHOLE pipeline is one
jit-compiled batched function over all trials (ops.preprocess), with scipy
filtfilt parity.  Split modes: 'pair' (held-out val pairs 33-40) and
'stratified' (seeded random per class), like the reference.

Input: trial-level .npy arrays (from preprocess_eeg_raw.py / converters) or
synthetic trials; output: {train,val}_windows.npy (N, C, window) +
labels/pairs + metadata.json per split.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from eyegaze_tpu.data.metadata import stratified_split
from eyegaze_tpu.data.synthetic import synthetic_eeg_pair_dataset
from eyegaze_tpu.ops.preprocess import preprocess_eeg, sliding_windows


def preprocess_and_window(eeg: np.ndarray, fs: float, low: float, high: float,
                          window: int, stride: int, batch: int = 16) -> np.ndarray:
    """(N, C, T) trials -> (N, n_windows, C, window), jit-batched."""
    fn = jax.jit(lambda x: sliding_windows(
        preprocess_eeg(x, fs, low, high), window, stride))
    outs = []
    for start in range(0, len(eeg), batch):
        outs.append(np.asarray(fn(jnp.asarray(eeg[start:start + batch]))))
    return np.concatenate(outs)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", default=None,
                    help="dir with eeg1.npy/eeg2.npy/labels.npy/pairs.npy trials")
    ap.add_argument("--output-dir", default="data/EEGseg_preprocessed")
    ap.add_argument("--sampling-rate", type=float, default=250.0)
    ap.add_argument("--filter-low", type=float, default=0.5)
    ap.add_argument("--filter-high", type=float, default=50.0)
    ap.add_argument("--window-size", type=int, default=1024)
    ap.add_argument("--stride", type=int, default=256)
    ap.add_argument("--split-mode", choices=["pair", "stratified"], default="pair")
    ap.add_argument("--val-pairs", type=int, nargs="*",
                    default=[33, 34, 35, 36, 37, 38, 39, 40])
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--synthetic-trials", type=int, default=None,
                    help="generate synthetic trials instead of reading input")
    args = ap.parse_args(argv)

    t0 = time.time()
    if args.input_dir:
        d = Path(args.input_dir)
        eeg1 = np.load(d / "eeg1.npy")
        eeg2 = np.load(d / "eeg2.npy")
        labels = np.load(d / "labels.npy")
        pairs = np.load(d / "pairs.npy")
    else:
        n = args.synthetic_trials or 24
        data = synthetic_eeg_pair_dataset(n=n, C=32, T=max(args.window_size, 2048),
                                          fs=args.sampling_rate, seed=args.seed)
        eeg1, eeg2, labels, pairs = (data["eeg1"], data["eeg2"],
                                     data["label"], data["pair"])
        print(f"[preprocess] synthetic mode: {n} trials")

    if args.split_mode == "pair":
        val_mask = np.isin(pairs, np.asarray(args.val_pairs))
        train_idx = np.flatnonzero(~val_mask)
        val_idx = np.flatnonzero(val_mask)
    else:
        idx = list(range(len(labels)))
        tr, va = stratified_split(idx, labels, test_size=0.2, seed=args.seed)
        train_idx, val_idx = np.asarray(tr), np.asarray(va)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    for split, idxs in (("train", train_idx), ("val", val_idx)):
        if len(idxs) == 0:
            print(f"[preprocess] {split}: empty split, skipping")
            continue
        w1 = preprocess_and_window(eeg1[idxs], args.sampling_rate, args.filter_low,
                                   args.filter_high, args.window_size, args.stride)
        w2 = preprocess_and_window(eeg2[idxs], args.sampling_rate, args.filter_low,
                                   args.filter_high, args.window_size, args.stride)
        n_trials, n_win = w1.shape[:2]
        win_labels = np.repeat(labels[idxs], n_win)
        win_pairs = np.repeat(pairs[idxs], n_win)
        np.save(out / f"{split}_eeg1.npy", w1.reshape(-1, *w1.shape[2:]))
        np.save(out / f"{split}_eeg2.npy", w2.reshape(-1, *w2.shape[2:]))
        np.save(out / f"{split}_labels.npy", win_labels)
        np.save(out / f"{split}_pairs.npy", win_pairs)
        meta = {
            "split": split, "trials": int(n_trials),
            "windows": int(n_trials * n_win), "window_size": args.window_size,
            "stride": args.stride, "sampling_rate": args.sampling_rate,
            "filter": [args.filter_low, args.filter_high],
            "split_mode": args.split_mode,
            "class_counts": {int(c): int((win_labels == c).sum())
                             for c in np.unique(win_labels)},
        }
        (out / f"{split}_metadata.json").write_text(json.dumps(meta, indent=2))
        print(f"[preprocess] {split}: {meta['windows']} windows from {n_trials} trials")
    print(f"[preprocess] done in {time.time() - t0:.1f}s -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
