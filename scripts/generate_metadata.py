#!/usr/bin/env python
"""Generate complete_metadata.json from raw description records.

Rebuild of ``1_Data/metadata/generate_json.py`` (:52-157): joins description
JSONs, derives the class from the player filename (single/comp/coop
patterns), excludes pair 18, restricts pairs to 12-40, and emits the
metadata records consumed by every dataset.

Usage:
    python scripts/generate_metadata.py --inputs desc1.json desc2.json \
        --output complete_metadata.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eyegaze_tpu.data.metadata import generate_metadata, verify_metadata


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", nargs="+", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    records = []
    for path in args.inputs:
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        records.extend(data if isinstance(data, list) else [data])

    metadata = generate_metadata(records)
    report = verify_metadata(metadata)
    with open(args.output, "w", encoding="utf-8") as f:
        json.dump(metadata, f, ensure_ascii=False, indent=2)
    print(f"[generate_metadata] wrote {report['num_records']} records -> {args.output}")
    print(f"  class counts: {report['class_counts']}")
    print(f"  pairs: {report['pairs'][:5]}...{report['pairs'][-3:]}")
    if not report["ok"]:
        print(f"  PROBLEMS: {report['problems']}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
