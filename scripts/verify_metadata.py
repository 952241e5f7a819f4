#!/usr/bin/env python
"""Validate a complete_metadata.json file.

Rebuild of ``1_Data/metadata/verify_metadata.py:1-83``: pair-18 exclusion,
pair range 12-40, class counts, null required fields.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eyegaze_tpu.data.metadata import load_metadata, verify_metadata


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("metadata", help="path to complete_metadata.json")
    args = ap.parse_args(argv)

    report = verify_metadata(load_metadata(args.metadata))
    print(f"records: {report['num_records']}")
    print(f"pairs:   {report['pairs']}")
    print(f"classes: {report['class_counts']}")
    if report["ok"]:
        print("OK: all checks passed")
        return 0
    print(f"FAILED: {report['problems']}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
