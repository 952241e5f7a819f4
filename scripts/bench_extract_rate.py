#!/usr/bin/env python
"""Measure the batched offline feature-extraction rate (VERDICT r4 Weak #5).

Round 4 measured ~0.87-1 s/trial warm for the one-trial-per-dispatch
extractor — relay-dispatch/transfer-bound, not compute-bound (the
connectivity math costs ~0.065 ms/window).  Round 5's extractor vmaps a
trial CHUNK per dispatch and overlaps each chunk's D2H fetch with the next
chunk's compute (scripts/extract_eeg_features.py).  This bench runs the
extractor end-to-end (including .npz writes) on synthetic trials at
chunk sizes {1, 8} and reports trials/s for each — chunk=1 reproduces the
round-4 dispatch pattern as the in-session comparator.

Reference anchor being replaced:
/root/reference/2_Preprocessing/scripts/extract_eeg_features.py:762-1119
(joblib-parallel scipy loops).  Done-criterion from VERDICT r4 #5: warm
rate >= 5x the chunk=1 comparator.

Stdout: one JSON document (battery redirects to
measurements/extract_rate_r5.json).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_extractor():
    spec = importlib.util.spec_from_file_location(
        "extract_eeg_features_bench",
        Path(__file__).resolve().parent / "extract_eeg_features.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def run_once(m, n_trials, chunk, out_dir):
    t0 = time.time()
    rc = m.main(["--output-dir", str(out_dir), "--trial-chunk", str(chunk),
                 "--synthetic-trials", str(n_trials),
                 "--sampling-rate", "250"])
    dt = time.time() - t0
    n_files = len(list(Path(out_dir).glob("trial_*.npz")))
    return {"chunk": chunk, "n_trials": n_trials, "rc": rc,
            "wall_s": round(dt, 2),
            "trials_per_s": round(n_trials / dt, 3),
            "files_written": n_files}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=64)
    ap.add_argument("--chunks", default="1,8")
    args = ap.parse_args()

    m = load_extractor()
    base = Path(tempfile.mkdtemp(prefix="extract_rate_"))
    rows = []
    try:
        for chunk in [int(c) for c in args.chunks.split(",")]:
            d = base / f"chunk{chunk}"
            # Warm pass (compile) on a small prefix, then the timed pass.
            warm = base / f"warm{chunk}"
            m.main(["--output-dir", str(warm), "--trial-chunk", str(chunk),
                    "--synthetic-trials", str(min(args.trials, 2 * chunk)),
                    "--sampling-rate", "250"])
            row = run_once(m, args.trials, chunk, d)
            rows.append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    import jax

    out = {"rows": rows, "device": jax.devices()[0].device_kind,
           "note": "end-to-end incl. npz writes; chunk=1 = round-4 "
                   "one-trial-per-dispatch pattern; round-4 measured "
                   "~1.0-1.15 trials/s warm on the real CSV tree "
                   "(rehearsal_report_r4.json)"}
    if len(rows) >= 2 and rows[0]["trials_per_s"] > 0:
        out["speedup_vs_chunk1"] = round(
            rows[-1]["trials_per_s"] / rows[0]["trials_per_s"], 2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
