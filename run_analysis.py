#!/usr/bin/env python
"""Batch analysis runner — sequentially analyzes all trained gaze models.

Rebuild of the reference's root ``run_analysis.py:22-101``: runs the gaze
analyzer over every (model-kind, fusion-mode) combination, continues on
failure, reports pass/fail per run.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

PROJECT_ROOT = Path(__file__).resolve().parent

EARLY_MODES = ("concat", "add", "subtract", "subtract_abs", "multiply")
LATE_MODES = ("concat", "add", "subtract", "multiply", "full")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--output-dir", default="runs/analysis_all")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--trials", type=int, default=12)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of kind:mode specs")
    args = ap.parse_args(argv)

    specs = [f"early:{m}" for m in EARLY_MODES] + [f"late:{m}" for m in LATE_MODES]
    if args.only:
        specs = [s for s in specs if s in args.only]

    results = {}
    for spec in specs:
        kind, mode = spec.split(":")
        cmd = [sys.executable, str(PROJECT_ROOT / "scripts" / "analyze_gaze.py"),
               "--model", kind, "--fusion-mode", mode,
               "--output-dir", str(Path(args.output_dir) / f"{kind}_{mode}"),
               "--trials", str(args.trials)]
        if args.tiny:
            cmd.append("--tiny")
        print(f"[run_analysis] {spec}")
        rc = subprocess.run(cmd).returncode
        results[spec] = rc == 0
        if rc != 0:
            print(f"[run_analysis] {spec} FAILED; continuing")

    print("\n=== Summary ===")
    for spec, ok in results.items():
        print(f"  {'PASS' if ok else 'FAIL'}  {spec}")
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
