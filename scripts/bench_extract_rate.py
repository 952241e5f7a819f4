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


def _main_quiet(m, argv):
    """Run the extractor CLI with ITS stdout routed to stderr: this bench's
    stdout must stay one parseable JSON document (the battery redirects it
    straight into the .json artifact — the round-5 first run was corrupted
    by the extractor's progress prints)."""
    import contextlib

    with contextlib.redirect_stdout(sys.stderr):
        return m.main(argv)


def run_once(m, n_trials, chunk, out_dir):
    t0 = time.time()
    rc = _main_quiet(m, ["--output-dir", str(out_dir),
                         "--trial-chunk", str(chunk),
                         "--synthetic-trials", str(n_trials),
                         "--sampling-rate", "250"])
    dt = time.time() - t0
    n_files = len(list(Path(out_dir).glob("trial_*.npz")))
    return {"chunk": chunk, "n_trials": n_trials, "rc": rc,
            "wall_s": round(dt, 2),
            "trials_per_s": round(n_trials / dt, 3),
            "files_written": n_files}


def device_path_rate(chunks, reps=3):
    """Time ONLY the part trial-chunking targets — dispatch + D2H fetch of
    the features — without the npz writes and synthetic-data generation
    that dominate the end-to-end wall on local disk (the real deployment's
    bottleneck was the relay transfer, rehearsal_report_r4.json)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eyegaze_tpu.data.synthetic import synthetic_eeg_pair_dataset
    from eyegaze_tpu.ops.features import (band_energy, inter_connectivity,
                                          intra_connectivity)
    from eyegaze_tpu.ops.spectral import welch_psd

    fs = 250.0
    d = synthetic_eeg_pair_dataset(n=max(chunks), C=32, T=2048, fs=fs,
                                   seed=42)

    def trial_features(e1, e2):
        _, p1 = welch_psd(e1, fs)
        _, p2 = welch_psd(e2, fs)
        return {"psd": jnp.stack([p1, p2]),
                "band_energy": jnp.stack([band_energy(e1, fs),
                                          band_energy(e2, fs)]),
                "intra": jnp.stack([
                    intra_connectivity(e1, fs, row_chunk=8),
                    intra_connectivity(e2, fs, row_chunk=8)]),
                "inter": inter_connectivity(e1, e2, fs, row_chunk=8)}

    rows = []
    for tc in chunks:
        f = jax.jit(jax.vmap(trial_features))
        x1, x2 = jnp.asarray(d["eeg1"][:tc]), jnp.asarray(d["eeg2"][:tc])
        host = {k: np.asarray(v) for k, v in f(x1, x2).items()}  # warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            host = {k: np.asarray(v) for k, v in f(x1, x2).items()}
            best = min(best, time.time() - t0)
        rows.append({"chunk": tc,
                     "device_fetch_s_per_trial": round(best / tc, 4),
                     "fetch_mb": round(sum(v.nbytes
                                           for v in host.values()) / 1e6, 1)})
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)
    return rows


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
            _main_quiet(m, ["--output-dir", str(warm),
                            "--trial-chunk", str(chunk),
                            "--synthetic-trials",
                            str(min(args.trials, 2 * chunk)),
                            "--sampling-rate", "250"])
            row = run_once(m, args.trials, chunk, d)
            rows.append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    import jax

    chunk_list = [int(c) for c in args.chunks.split(",")]
    dev_rows = device_path_rate(chunk_list)
    out = {"rows": rows, "device_path": dev_rows,
           "device": jax.devices()[0].device_kind,
           "note": "rows = end-to-end incl. npz writes + synthetic-data "
                   "generation (disk/CPU-bound on this host — chunking is "
                   "neutral there); device_path isolates dispatch + D2H "
                   "fetch, the phase trial-chunking targets and the phase "
                   "that bound the round-4 real-tree rate "
                   "(~1.0-1.15 trials/s, rehearsal_report_r4.json). "
                   "chunk=1 = round-4 one-trial-per-dispatch pattern."}
    if len(rows) >= 2 and rows[0]["trials_per_s"] > 0:
        out["e2e_speedup_vs_chunk1"] = round(
            rows[-1]["trials_per_s"] / rows[0]["trials_per_s"], 2)
    if len(dev_rows) >= 2 and dev_rows[-1]["device_fetch_s_per_trial"] > 0:
        out["device_path_speedup_vs_chunk1"] = round(
            dev_rows[0]["device_fetch_s_per_trial"]
            / dev_rows[-1]["device_fetch_s_per_trial"], 2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
