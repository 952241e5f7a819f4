"""Real gaze-image ingestion: JPG decode, resize, conversion to arrays.

Host-side counterpart of the reference's PIL pipeline
(``1_Data/datasets/gaze_pair_dataset.py:66-110``: ``Image.open(...).convert
('RGB')`` -> ``T.Resize((224, 224))`` -> ``ToTensor``), with path resolution
``image_root / f"{player}{ext}"`` (``gaze_pair_dataset.py:88-90``).  The
torchvision order is resize-in-PIL-uint8-space then divide-by-255, so storing
the resized uint8 pixels is *exact* parity with the reference's float tensors;
ImageNet normalization stays on device (``data/image_fusion.py``).

Design: decode/resize happen ONCE offline (``scripts/convert_gaze_images.py``
-> memmap-able ``.npy`` shards); training iterates numpy slices and ships
uint8 to the device (4x less host->device traffic than float32), where
``to_unit_float`` + ``imagenet_normalize`` run fused inside the jitted step.
The reference instead re-decodes two 3000x1583 JPGs per sample per epoch in
DataLoader workers (~0.1-0.2 s/sample, 1_Data/processed/README.md:207-209).

Per-sample failures are recorded and replaced by zero images, matching the
reference's dummy-sample fallback (``multimodal_dataset.py:243-258``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from eyegaze_tpu.data.loader import GazePairArrays
from eyegaze_tpu.data.metadata import LABEL2ID

CONVERTED_FIELDS = ("img1", "img2", "label", "pair")


def load_image(path: str | Path, size: int = 224) -> np.ndarray:
    """Decode one image -> (3, size, size) uint8, RGB.

    PIL bilinear resize on uint8 pixels == torchvision ``T.Resize((s, s))``
    applied to a PIL image (gaze_pair_dataset.py:67-69).
    """
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((size, size), Image.BILINEAR)
        arr = np.asarray(im, np.uint8)
    return np.transpose(arr, (2, 0, 1))


def image_path(image_root: str | Path, player: str, extension: str = ".jpg") -> Path:
    return Path(image_root) / f"{player}{extension}"


def convert_gaze_images(
    metadata: Sequence[Dict],
    image_root: str | Path,
    out_dir: str | Path,
    size: int = 224,
    extension: str = ".jpg",
    log_every: int = 200,
) -> Dict:
    """One-time JPG -> array conversion for the whole metadata.

    Writes to ``out_dir``: ``img1.npy``/``img2.npy`` uint8 (N, 3, size, size),
    ``label.npy`` int32, ``pair.npy`` int32, and ``meta.json`` (size, failures,
    record order).  Returns the meta dict.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = len(metadata)
    img1 = np.lib.format.open_memmap(
        out / "img1.npy", mode="w+", dtype=np.uint8, shape=(n, 3, size, size)
    )
    img2 = np.lib.format.open_memmap(
        out / "img2.npy", mode="w+", dtype=np.uint8, shape=(n, 3, size, size)
    )
    labels = np.zeros(n, np.int32)
    pairs = np.zeros(n, np.int32)
    failures: List[Dict] = []
    for i, rec in enumerate(metadata):
        labels[i] = LABEL2ID[rec["class"]]
        pairs[i] = int(rec["pair"])
        for field, dst in (("player1", img1), ("player2", img2)):
            p = image_path(image_root, rec[field], extension)
            try:
                dst[i] = load_image(p, size)
            except Exception as e:  # zero image + report, don't crash the run
                failures.append({"index": i, "path": str(p), "error": str(e)})
                dst[i] = 0
        if log_every and (i + 1) % log_every == 0:
            print(f"[convert] {i + 1}/{n}")
    img1.flush()
    img2.flush()
    np.save(out / "label.npy", labels)
    np.save(out / "pair.npy", pairs)
    meta = {
        "num_records": n,
        "size": size,
        "extension": extension,
        "num_failures": len(failures),
        "failures": failures[:50],
        "players": [[m["player1"], m["player2"]] for m in metadata],
    }
    with open(out / "meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def load_converted_gaze(
    out_dir: str | Path, mmap: bool = True, indices: Optional[np.ndarray] = None
) -> GazePairArrays:
    """Load a converted directory back as GazePairArrays (uint8 images)."""
    out = Path(out_dir)
    mode = "r" if mmap else None
    img1 = np.load(out / "img1.npy", mmap_mode=mode)
    img2 = np.load(out / "img2.npy", mmap_mode=mode)
    labels = np.load(out / "label.npy")
    pairs = np.load(out / "pair.npy")
    if indices is not None:
        img1, img2 = img1[indices], img2[indices]
        labels, pairs = labels[indices], pairs[indices]
    return GazePairArrays(img1=img1, img2=img2, labels=labels, pairs=pairs)


def load_gaze_pairs(
    metadata: Sequence[Dict],
    image_root: str | Path,
    size: int = 224,
    extension: str = ".jpg",
) -> GazePairArrays:
    """Directly load a (small) metadata list into memory, no conversion dir."""
    n = len(metadata)
    img1 = np.zeros((n, 3, size, size), np.uint8)
    img2 = np.zeros((n, 3, size, size), np.uint8)
    labels = np.zeros(n, np.int32)
    pairs = np.zeros(n, np.int32)
    for i, rec in enumerate(metadata):
        labels[i] = LABEL2ID[rec["class"]]
        pairs[i] = int(rec["pair"])
        img1[i] = load_image(image_path(image_root, rec["player1"], extension), size)
        img2[i] = load_image(image_path(image_root, rec["player2"], extension), size)
    return GazePairArrays(img1=img1, img2=img2, labels=labels, pairs=pairs)
