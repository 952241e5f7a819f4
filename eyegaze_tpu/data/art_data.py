"""ART data factory: real directory layout + synthetic fallback.

Rebuild of ``1_Data/processed/two_EEG_fusion.py:68-120``: real data lives at
``root/{train,val,test}/{Brain,ChannelNoise,Eye,Heart,LineNoise,Muscle,
Other}/<file>`` — clean targets in Brain/, inputs drawn from a random noise
category with the same filename (falling back to the clean copy when the
noise variant is missing).  Synthetic fallback uses the seeded ``gen_eeg``
generators when the root is absent — the same heuristic as the reference's
``build_hf_datasets``.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from eyegaze_tpu.data.loader import ArrayDataset
from eyegaze_tpu.data.synthetic import gen_eeg

NOISE_CATEGORIES = ("Brain", "ChannelNoise", "Eye", "Heart", "LineNoise",
                    "Muscle", "Other")


def read_eeg(path: str | Path) -> np.ndarray:
    """Load a .csv/.npy EEG file ensuring (C, T) layout with C < T
    (two_EEG_fusion.py:9-29 semantics)."""
    path = Path(path)
    if path.suffix.lower() == ".csv":
        from eyegaze_tpu.data.native import load_csv_f32

        arr, rows, cols = load_csv_f32(path, max_rows=4096, max_cols=65536)
        arr = arr[:rows, :cols]
    elif path.suffix.lower() == ".npy":
        arr = np.load(path)
    else:
        raise ValueError(f"Unsupported EEG extension: {path.suffix}")
    if arr.ndim != 2:
        raise ValueError(f"EEG must be 2D, got {arr.shape}")
    c, t = arr.shape
    if c > t:
        arr = arr.T
        c, t = arr.shape
    if c >= t:
        raise ValueError(f"Cannot determine (C, T) with C < T: {arr.shape}")
    return arr.astype(np.float32)


def real_art_split(root: str | Path, split: str, seed: Optional[int] = 42,
                   max_files: Optional[int] = None) -> ArrayDataset:
    """Load a real split: clean labels from Brain/, inputs from a random
    noise category with the same filename."""
    base = Path(root) / split
    brain = base / "Brain"
    rng = random.Random(seed)
    files = sorted(p.name for p in brain.iterdir() if p.is_file())
    if max_files:
        files = files[:max_files]
    inputs, labels = [], []
    for fname in files:
        category = rng.choice(list(NOISE_CATEGORIES))
        clean = read_eeg(brain / fname)
        noise_path = base / category / fname
        noisy = read_eeg(noise_path) if noise_path.is_file() else clean.copy()
        inputs.append(noisy)
        labels.append(clean)
    return ArrayDataset({"input_values": np.stack(inputs), "labels": np.stack(labels)})


def synthetic_art_split(length: int, C: int = 32, T: int = 1024,
                        sample_rate: float = 256.0, seed: Optional[int] = 42,
                        attr: Optional[Dict] = None, target: Optional[Dict] = None) -> ArrayDataset:
    """Seeded synthetic split (two_EEG_fusion.py:51-66 parity: per-sample
    seeds seed*100003+i for inputs, seed*100019+i for labels)."""
    attr = attr or {}
    target = target or {}
    inputs = np.stack([
        gen_eeg(C, T, sample_rate=sample_rate,
                seed=None if seed is None else seed * 100003 + i, **attr)
        for i in range(length)
    ])
    labels = np.stack([
        gen_eeg(C, T, sample_rate=sample_rate,
                seed=None if seed is None else seed * 100019 + i, **target)
        for i in range(length)
    ])
    return ArrayDataset({"input_values": inputs, "labels": labels})


def build_art_datasets(config: Dict, seed: Optional[int] = 42) -> Dict[str, ArrayDataset]:
    """Real-vs-synthetic factory (build_hf_datasets heuristic,
    two_EEG_fusion.py:96-120): real when root/train/Brain exists."""
    data_cfg = config.get("data", {})
    root = data_cfg.get("root")
    use_real = isinstance(root, str) and (Path(root) / "train" / "Brain").is_dir()
    out = {}
    for split in ("train", "val", "test"):
        if use_real:
            out[split] = real_art_split(root, split, seed=seed)
        else:
            params = data_cfg.get("splits", {}).get(split, {})
            length = params.get("length", 1000 if split == "train" else 100)
            out[split] = synthetic_art_split(
                length,
                C=int(params.get("C", data_cfg.get("C", 32))),
                T=int(params.get("T", data_cfg.get("T", 1024))),
                sample_rate=float(params.get("sample_rate", 256.0)),
                seed=seed,
                attr=params.get("attr", {}),
                target=params.get("target", {}),
            )
    return out
