#!/usr/bin/env python
"""Raw EEG CSV -> trial .npy conversion.

Rebuild of ``2_Preprocessing/scripts/preprocess_eeg_raw.py`` (:48-429):
per-trial CSVs -> (N, num_channels, target_length) arrays with pad/truncate
(time) and channel padding, pair-based split, per-split metadata.json.  The
CSV parse uses the native C++ loader (native/csv_loader.cpp, ~60x faster
than the reference's pandas path) with a numpy fallback; failed files are
skipped with a report (the reference's robustness contract).

Expects ``complete_metadata.json`` records with player1/player2 file stems;
EEG files at <eeg-dir>/<stem>.csv.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from eyegaze_tpu.data.metadata import LABEL2ID, load_metadata, pair_split
from eyegaze_tpu.data.native import load_csv_batch_f32


def fix_orientation(arr: np.ndarray, rows: int, cols: int, num_channels: int,
                    target_length: int) -> np.ndarray:
    """(rows, cols) parsed block -> (num_channels, target_length) with
    pad/truncate on both axes (preprocess_eeg_raw.py:48-94 semantics; also
    transposes time-major CSVs)."""
    data = arr[:rows, :cols]
    if rows > cols:  # time-major layout -> (C, T)
        data = data.T
    c, t = data.shape
    out = np.zeros((num_channels, target_length), np.float32)
    cc = min(c, num_channels)
    tt = min(t, target_length)
    out[:cc, :tt] = data[:cc, :tt]
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--metadata", required=True)
    ap.add_argument("--eeg-dir", required=True)
    ap.add_argument("--output-dir", default="data/EEGraw_npy")
    ap.add_argument("--num-channels", type=int, default=32)
    ap.add_argument("--target-length", type=int, default=3250)
    ap.add_argument("--val-pairs", type=int, nargs="*",
                    default=[33, 34, 35, 36, 37, 38, 39, 40])
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args(argv)

    metadata = load_metadata(args.metadata)
    eeg_dir = Path(args.eeg_dir)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    # Track each record's index into the ORIGINAL metadata order so other
    # modalities converted in that order (scripts/convert_gaze_images.py) can
    # be aligned trial-for-trial (multimodal training).
    val_set = set(args.val_pairs)
    train_idx = [i for i, m in enumerate(metadata) if m["pair"] not in val_set]
    val_idx = [i for i, m in enumerate(metadata) if m["pair"] in val_set]
    train_meta, val_meta = pair_split(metadata, args.val_pairs)
    t0 = time.time()
    for split, meta, gidx in (("train", train_meta, train_idx),
                              ("val", val_meta, val_idx)):
        n = len(meta)
        if n == 0:
            continue
        eeg1 = np.zeros((n, args.num_channels, args.target_length), np.float32)
        eeg2 = np.zeros_like(eeg1)
        labels = np.asarray([LABEL2ID[m["class"]] for m in meta], np.int32)
        pairs = np.asarray([m["pair"] for m in meta], np.int32)
        keep = np.ones(n, bool)
        max_rows = max(args.num_channels * 2, 64)
        max_cols = args.target_length + 256
        for start in range(0, n, args.batch):
            chunk = meta[start : start + args.batch]
            for player, dest in (("player1", eeg1), ("player2", eeg2)):
                paths = [eeg_dir / f"{m[player]}.csv" for m in chunk]
                block, rows, cols, ok = load_csv_batch_f32(paths, max_rows, max_cols)
                for j in range(len(chunk)):
                    i = start + j
                    if not ok[j] or rows[j] == 0:
                        keep[i] = False
                        continue
                    if rows[j] >= max_rows:
                        # Hit the row cap: a time-major CSV (one row per
                        # SAMPLE, e.g. 3250x32) — the batch buffer is sized
                        # for channel-major files and would silently keep
                        # only the first max_rows samples.  Re-parse this
                        # file alone with swapped caps.
                        from eyegaze_tpu.data.native import load_csv_f32

                        arr, r, c = load_csv_f32(
                            paths[j], max_rows=args.target_length + 256,
                            max_cols=max_rows)
                        dest[i] = fix_orientation(arr, int(r), int(c),
                                                  args.num_channels,
                                                  args.target_length)
                        continue
                    dest[i] = fix_orientation(block[j], int(rows[j]), int(cols[j]),
                                              args.num_channels, args.target_length)
        kept = int(keep.sum())
        np.save(out / f"{split}_eeg1.npy", eeg1[keep])
        np.save(out / f"{split}_eeg2.npy", eeg2[keep])
        np.save(out / f"{split}_labels.npy", labels[keep])
        np.save(out / f"{split}_pairs.npy", pairs[keep])
        (out / f"{split}_metadata.json").write_text(json.dumps({
            "split": split, "requested": n, "converted": kept,
            "skipped": n - kept, "num_channels": args.num_channels,
            "target_length": args.target_length,
            "metadata_indices": [int(g) for g, k in zip(gidx, keep) if k],
            "class_counts": {int(c): int((labels[keep] == c).sum())
                             for c in np.unique(labels[keep])},
        }, indent=2))
        print(f"[raw] {split}: {kept}/{n} trials converted")
    print(f"[raw] done in {time.time() - t0:.1f}s -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
