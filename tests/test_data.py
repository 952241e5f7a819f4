"""Tests for the data layer: metadata, splits, synthetic fixtures, windows,
ART factory, augmentations, image fusion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eyegaze_tpu.data import (
    ArrayDataset,
    DualEEGWindowDataset,
    batch_iterator,
    class_weights,
    fuse_image_pair,
    gen_eeg,
    imagenet_normalize,
    pair_split,
    stratified_split,
    synthetic_eeg_pair_dataset,
    synthetic_gaze_pair_dataset,
    synthetic_metadata,
    verify_metadata,
    window_index,
)
from eyegaze_tpu.data.art_data import build_art_datasets, synthetic_art_split
from eyegaze_tpu.data.augment import augment_eeg, channel_dropout, time_masking


def test_gen_eeg_reference_parity():
    """gen_eeg must be numerically identical to the reference generator given
    the same seed (same default_rng call sequence, two_EEG_fusion.py:31-49)."""
    def reference_gen_eeg(C, T, sample_rate=256.0, mode="mixed", noise_std=0.1,
                          num_components=3, seed=None):
        rng = np.random.default_rng(seed)
        t = np.arange(T, dtype=np.float32) / float(sample_rate)
        x = np.zeros((C, T), dtype=np.float32)
        if mode in {"sine", "mixed"}:
            for c in range(C):
                freqs = rng.uniform(1.0, 40.0, size=(num_components,)).astype(np.float32)
                amps = rng.uniform(0.1, 1.0, size=(num_components,)).astype(np.float32)
                phases = rng.uniform(0.0, 2 * np.pi, size=(num_components,)).astype(np.float32)
                s = np.zeros_like(t)
                for f, a, p in zip(freqs, amps, phases):
                    s += a * np.sin(2 * np.pi * f * t + p)
                x[c] += s.astype(np.float32)
        if mode in {"noise", "mixed"}:
            x += rng.normal(0, noise_std, size=(C, T)).astype(np.float32)
        return x

    got = gen_eeg(4, 128, seed=7)
    want = reference_gen_eeg(4, 128, seed=7)
    np.testing.assert_array_equal(got, want)


def test_metadata_and_splits():
    meta = synthetic_metadata(56)
    report = verify_metadata(meta)
    assert report["ok"], report["problems"]
    assert 18 not in report["pairs"]
    train, val = pair_split(meta, [33, 34, 35])
    assert all(m["pair"] in (33, 34, 35) for m in val)
    assert all(m["pair"] not in (33, 34, 35) for m in train)

    labels = [i % 3 for i in range(30)]
    tr, te = stratified_split(list(range(30)), labels, test_size=0.2, seed=42)
    assert len(te) == 6
    te_labels = [labels[i] for i in te]
    assert sorted(set(te_labels)) == [0, 1, 2]
    # Deterministic
    tr2, te2 = stratified_split(list(range(30)), labels, test_size=0.2, seed=42)
    assert te == te2

    w = class_weights([0, 0, 0, 1, 2, 2])
    np.testing.assert_allclose(w, [6 / 9, 6 / 3, 6 / 6])


def test_window_index_math():
    idx = window_index([1024, 512, 100], window_size=512, stride=256)
    # trial0: (1024-512)//256+1 = 3 windows; trial1: 1; trial2 (too short): 0.
    assert len(idx) == 4
    assert idx.trial_ids.tolist() == [0, 0, 0, 1]
    assert idx.starts.tolist() == [0, 256, 512, 0]


def test_dual_eeg_window_dataset():
    data = synthetic_eeg_pair_dataset(n=6, C=4, T=1024, seed=0)
    ds = DualEEGWindowDataset(data["eeg1"], data["eeg2"], data["label"],
                              window_size=512, stride=256, pairs=data["pair"])
    assert len(ds) == 6 * 3
    batch = ds.batch([0, 5, 10])
    assert batch["eeg1"].shape == (3, 4, 512)
    assert set(batch) == {"eeg1", "eeg2", "label", "pair"}
    batches = list(ds.iter_batches(4, shuffle=True, seed=1, drop_remainder=True))
    assert len(batches) == len(ds) // 4
    # Shuffle determinism per (seed, epoch)
    b1 = list(ds.iter_batches(4, shuffle=True, seed=1, epoch=0))
    b2 = list(ds.iter_batches(4, shuffle=True, seed=1, epoch=0))
    np.testing.assert_array_equal(b1[0]["label"], b2[0]["label"])


def test_synthetic_class_structure():
    """Cooperation pairs must show higher PLV than Singles (the fixtures must
    carry real class signal for e2e validation)."""
    from eyegaze_tpu.ops import connectivity_scalars

    data = synthetic_eeg_pair_dataset(n=12, C=8, T=512, seed=3)
    feats = np.asarray(connectivity_scalars(
        jnp.asarray(data["eeg1"]), jnp.asarray(data["eeg2"]), 256.0))
    plv_mean = feats[:, [0, 7, 14, 21]].mean(axis=1)  # PLV across 4 bands
    coop = plv_mean[data["label"] == 2].mean()
    single = plv_mean[data["label"] == 0].mean()
    assert coop > single


def test_art_factory_synthetic():
    ds = build_art_datasets({"data": {"splits": {
        "train": {"length": 4, "C": 4, "T": 128},
        "val": {"length": 2, "C": 4, "T": 128},
        "test": {"length": 2, "C": 4, "T": 128},
    }}})
    assert set(ds) == {"train", "val", "test"}
    assert ds["train"].arrays["input_values"].shape == (4, 4, 128)
    # Seeded determinism
    ds2 = synthetic_art_split(4, C=4, T=128, seed=42)
    np.testing.assert_array_equal(ds["train"].arrays["input_values"],
                                  ds2.arrays["input_values"])


def test_art_factory_real_layout(tmp_path):
    from eyegaze_tpu.data.art_data import NOISE_CATEGORIES, real_art_split

    r = np.random.default_rng(0)
    for split in ("train",):
        for cat in NOISE_CATEGORIES:
            (tmp_path / split / cat).mkdir(parents=True)
        for i in range(3):
            clean = r.normal(size=(4, 64)).astype(np.float32)
            np.save(tmp_path / split / "Brain" / f"s{i}.npy", clean)
            np.save(tmp_path / split / "Eye" / f"s{i}.npy",
                    clean + r.normal(size=(4, 64)).astype(np.float32))
    ds = real_art_split(tmp_path, "train", seed=1)
    assert ds.arrays["labels"].shape == (3, 4, 64)
    assert ds.arrays["input_values"].shape == (3, 4, 64)


def test_augmentations():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((4, 8, 256))
    masked = np.asarray(time_masking(rng, x, max_length=50, num_masks=2))
    assert masked.shape == x.shape
    assert masked.min() == 0.0 and masked.max() == 1.0
    # Each sample loses at most 2*50 timepoints.
    zeros_per_sample = (masked[:, 0] == 0).sum(axis=-1)
    assert (zeros_per_sample <= 100).all() and (zeros_per_sample >= 1).all()

    dropped = np.asarray(channel_dropout(rng, x, prob=0.5))
    per_channel = dropped.mean(axis=-1)
    assert ((per_channel == 0) | (per_channel == 1)).all()  # whole channels

    aug = np.asarray(augment_eeg(rng, x))
    assert aug.shape == x.shape and np.isfinite(aug).all()


def test_image_fusion_modes():
    r = np.random.default_rng(2)
    a = jnp.asarray(r.random((2, 3, 16, 16)).astype(np.float32))
    b = jnp.asarray(r.random((2, 3, 16, 16)).astype(np.float32))
    assert fuse_image_pair(a, b, "horizontal").shape == (2, 3, 16, 32)
    assert fuse_image_pair(a, b, "vertical").shape == (2, 3, 32, 16)
    for mode in ("add", "multiply", "subtract"):
        f = np.asarray(fuse_image_pair(a, b, mode))
        assert f.shape == (2, 3, 16, 16)
        assert f.min() >= 0.0 and f.max() <= 1.0
    norm = np.asarray(imagenet_normalize(a))
    assert norm.shape == a.shape
    with pytest.raises(ValueError):
        fuse_image_pair(a, b, "bogus")


def test_prefetch_to_device():
    from eyegaze_tpu.data import prefetch_to_device

    batches = [{"x": np.full((2, 3), i, np.float32), "label": np.array([i, i])}
               for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])
        np.testing.assert_array_equal(np.asarray(b["label"]), batches[i]["label"])
    # size larger than the stream, empty stream
    assert len(list(prefetch_to_device(iter(batches), size=10))) == 5
    assert list(prefetch_to_device(iter([]), size=2)) == []
    # size=0 disables queueing but MUST still apply placement: Trainer routes
    # DP-mesh shard_batch through it, so a passthrough would feed unsharded
    # host batches to a sharded jit step (round-2 advisor finding).
    thru = list(prefetch_to_device(iter(batches), size=0))
    assert len(thru) == 5
    assert isinstance(thru[0]["x"], jax.Array)
    np.testing.assert_array_equal(np.asarray(thru[0]["x"]), batches[0]["x"])
    seen = []
    thru0 = list(prefetch_to_device(iter(batches), size=0,
                                    placement=lambda b: seen.append(1) or b))
    assert len(seen) == len(thru0) == 5


def test_vit_processor_normalize_range():
    """HF ViTImageProcessor contract: uint8 -> [-1, 1] via 1/255 then 0.5/0.5
    (two_image_fusion.py:64-150; docs/PARITY.md datafusion row)."""
    import jax.numpy as jnp

    from eyegaze_tpu.data.image_fusion import to_unit_float, vit_processor_normalize

    img = np.asarray([[[0, 127, 255]]], np.uint8).reshape(1, 1, 1, 3)
    out = np.asarray(vit_processor_normalize(to_unit_float(jnp.asarray(img))))
    np.testing.assert_allclose(out.ravel(), [-1.0, 127 / 255 * 2 - 1, 1.0],
                               atol=1e-6)
