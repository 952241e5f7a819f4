"""Minimal host-side batch loaders feeding device arrays.

The reference pushes per-sample Python work (PIL decode, pandas CSV reads)
through DataLoader workers; here the layout is array-first: trials live in
preconverted .npy arrays (see scripts/preprocess_eeg_raw.py for EEG and
scripts/convert_gaze_images.py for images), windowing is index math, and
batches are plain numpy slices handed to jit as device arrays.
Rebuilds the roles of DualEEGDataset (dual_eeg_dataset.py:17-296),
GazePairDataset (gaze_pair_dataset.py:23-252) and MultimodalDataset
(multimodal_dataset.py:19-275).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from eyegaze_tpu.data.windows import WindowIndex, gather_windows, window_index


@dataclasses.dataclass
class ArrayDataset:
    """A dict of equally sized numpy arrays with batch iteration."""

    arrays: Dict[str, np.ndarray]

    def __post_init__(self):
        sizes = {k: len(v) for k, v in self.arrays.items()}
        assert len(set(sizes.values())) == 1, f"ragged arrays: {sizes}"

    def __len__(self) -> int:
        return len(next(iter(self.arrays.values())))

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        return {k: v[idx] for k, v in self.arrays.items()}


def _batch_indices(
    n: int, batch_size: int, shuffle: bool, seed: int,
    drop_remainder: bool, epoch: int,
) -> Iterator[np.ndarray]:
    """Shared index plan for every loader: deterministic per (seed, epoch)
    shuffle, optional static-shape tail drop.  One implementation so the
    epoch-seeding scheme can never drift between dataset types."""
    idx = np.arange(n)
    if shuffle:
        rng = np.random.default_rng(seed + epoch * 100003)
        rng.shuffle(idx)
    end = n - (n % batch_size) if drop_remainder else n
    for start in range(0, end, batch_size):
        yield idx[start : start + batch_size]


def batch_iterator(
    dataset: "ArrayDataset | Dict[str, np.ndarray]",
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_remainder: bool = False,
    epoch: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield dict batches; deterministic per (seed, epoch).

    With ``drop_remainder=True`` every batch has a static shape (one compiled
    program); otherwise the tail batch triggers one extra compile.
    """
    if isinstance(dataset, dict):
        dataset = ArrayDataset(dataset)
    for sel in _batch_indices(len(dataset), batch_size, shuffle, seed,
                              drop_remainder, epoch):
        yield dataset[sel]


class DualEEGWindowDataset:
    """Window-level view over trial-level dual-EEG arrays.

    Stores (N_trials, C, T) per player + labels; samples are sliding windows
    (window_size/stride parity with dual_eeg_dataset.py:28-29 defaults).
    """

    def __init__(
        self,
        eeg1: np.ndarray,
        eeg2: np.ndarray,
        labels: np.ndarray,
        window_size: int = 1024,
        stride: int = 512,
        pairs: Optional[np.ndarray] = None,
    ):
        assert eeg1.shape == eeg2.shape
        self.eeg1 = eeg1
        self.eeg2 = eeg2
        self.labels = labels
        self.pairs = pairs
        self.index: WindowIndex = window_index(
            [eeg1.shape[-1]] * len(eeg1), window_size, stride
        )

    def __len__(self) -> int:
        return len(self.index)

    def batch(self, items: Sequence[int]) -> Dict[str, np.ndarray]:
        out = {
            "eeg1": gather_windows(self.eeg1, self.index, items),
            "eeg2": gather_windows(self.eeg2, self.index, items),
            "label": self.labels[self.index.trial_ids[items]],
        }
        if self.pairs is not None:
            out["pair"] = self.pairs[self.index.trial_ids[items]]
        return out

    def iter_batches(
        self, batch_size: int, shuffle: bool = False, seed: int = 0,
        drop_remainder: bool = False, epoch: int = 0,
    ) -> Iterator[Dict[str, np.ndarray]]:
        for sel in _batch_indices(len(self), batch_size, shuffle, seed,
                                  drop_remainder, epoch):
            yield self.batch(sel)


class MultimodalArrays:
    """Joint gaze-image + dual-EEG-window dataset component.

    Rebuild of MultimodalDataset (multimodal_dataset.py:19-275): each sample
    is one sliding EEG window of a trial paired with that trial's two gaze
    images (images repeat across the trial's windows).  Images may be uint8
    (converted arrays, see data/images.py) — converted to [0,1] float on
    device via image_fusion.to_unit_float.
    """

    def __init__(
        self,
        img1: np.ndarray,
        img2: np.ndarray,
        eeg1: np.ndarray,
        eeg2: np.ndarray,
        labels: np.ndarray,
        window_size: int = 1024,
        stride: int = 512,
        pairs: Optional[np.ndarray] = None,
    ):
        assert eeg1.shape == eeg2.shape
        assert len(img1) == len(img2) == len(eeg1) == len(labels)
        self.img1 = img1
        self.img2 = img2
        self.eeg1 = eeg1
        self.eeg2 = eeg2
        self.labels = labels
        self.pairs = pairs
        self.index: WindowIndex = window_index(
            [eeg1.shape[-1]] * len(eeg1), window_size, stride
        )

    def __len__(self) -> int:
        return len(self.index)

    def batch(self, items: Sequence[int]) -> Dict[str, np.ndarray]:
        trial = self.index.trial_ids[items]
        out = {
            "img1": np.asarray(self.img1[trial]),
            "img2": np.asarray(self.img2[trial]),
            "eeg1": gather_windows(self.eeg1, self.index, items),
            "eeg2": gather_windows(self.eeg2, self.index, items),
            "label": self.labels[trial],
        }
        if self.pairs is not None:
            out["pair"] = self.pairs[trial]
        return out

    def iter_batches(
        self, batch_size: int, shuffle: bool = False, seed: int = 0,
        drop_remainder: bool = False, epoch: int = 0,
    ) -> Iterator[Dict[str, np.ndarray]]:
        for sel in _batch_indices(len(self), batch_size, shuffle, seed,
                                  drop_remainder, epoch):
            yield self.batch(sel)


@dataclasses.dataclass
class GazePairArrays:
    """Gaze-pair samples as arrays: (N, 3, H, W) x2 + labels (+ pair ids)."""

    img1: np.ndarray
    img2: np.ndarray
    labels: np.ndarray
    pairs: Optional[np.ndarray] = None

    def __len__(self):
        return len(self.labels)

    def as_dataset(self) -> ArrayDataset:
        arrays = {"img1": self.img1, "img2": self.img2, "label": self.labels}
        if self.pairs is not None:
            arrays["pair"] = self.pairs
        return ArrayDataset(arrays)
