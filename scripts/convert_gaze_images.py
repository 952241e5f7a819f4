#!/usr/bin/env python
"""One-time gaze-image conversion: JPG directory + metadata -> array shards.

Moves the reference's per-epoch PIL decode/resize cost
(``gaze_pair_dataset.py:66-72``, ~0.1-0.2 s per 3000x1583 JPG pair) out of
the training hot path: decode + bilinear resize to 224x224 ONCE, store uint8
memmap-able ``.npy`` arrays; training then slices numpy and ships uint8 to
the TPU, where /255 + ImageNet normalization run inside the jitted step.

Usage:
    python scripts/convert_gaze_images.py \
        --metadata complete_metadata.json --image-root /data/gaze_images \
        --output runs/gaze_arrays [--size 224] [--extension .jpg]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eyegaze_tpu.data.images import convert_gaze_images
from eyegaze_tpu.data.metadata import load_metadata, verify_metadata


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--metadata", required=True, help="complete_metadata.json")
    ap.add_argument("--image-root", required=True, help="directory of per-player JPGs")
    ap.add_argument("--output", required=True, help="output array directory")
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--extension", default=".jpg")
    args = ap.parse_args(argv)

    metadata = load_metadata(args.metadata)
    report = verify_metadata(metadata)
    print(f"[metadata] {report['num_records']} records, "
          f"classes {report['class_counts']}, ok={report['ok']}")
    meta = convert_gaze_images(
        metadata, args.image_root, args.output,
        size=args.size, extension=args.extension,
    )
    print(json.dumps({k: v for k, v in meta.items() if k != "players"}, indent=1))
    if meta["num_failures"]:
        print(f"[warn] {meta['num_failures']} images failed to load "
              f"(zero-filled; see {args.output}/meta.json)")
    print(f"[done] wrote {meta['num_records']} trials to {args.output}")


if __name__ == "__main__":
    main()
