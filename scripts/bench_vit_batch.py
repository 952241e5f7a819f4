"""ViT-B/16 early-fusion batch sweep on TPU: find the MFU-optimal batch.

bench.py measures batch 64 (47.7% infer / 52.5% train MFU round 3); this
sweeps the batch axis to check whether a larger batch fills the MXU further
or HBM capacity/bandwidth turns it over.  Host-fetch-fenced like bench.py.

Usage: python scripts/bench_vit_batch.py [--batches 32,64,128,256] [--skip-train]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128,256")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import bench  # reuse bench.py's measurement + MFU machinery

    out = {"device": None, "sweep": {}}
    for b in batches:
        try:
            # --skip-train measures inference only (bench_vit returns before
            # building/compiling the train step at all).
            res = bench.bench_vit(batch_infer=b, batch_train=b,
                                  iters=args.iters, reps=args.reps,
                                  skip_train=args.skip_train)
            row = {
                "infer_img_s": res["infer"]["throughput"]["mean"],
                "infer_mfu": res["infer"]["mfu"],
            }
            if not args.skip_train:
                row["train_img_s"] = res["train"]["throughput"]["mean"]
                row["train_mfu"] = res["train"]["mfu"]
        except Exception as e:  # OOM at large batch is a valid result
            row = {"error": f"{type(e).__name__}: {e}"[:200]}
        out["sweep"][b] = row
        # Progress goes to stderr: stdout must stay ONE parseable JSON
        # document (the measurement battery redirects it to a .json file).
        print(json.dumps({b: row}), file=sys.stderr, flush=True)
    import jax

    out["device"] = jax.devices()[0].device_kind
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
