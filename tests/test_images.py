"""Real-image ingestion: JPG decode/resize, conversion dir, MultimodalArrays.

Covers the GazePairDataset image path (gaze_pair_dataset.py:66-110) and the
MultimodalDataset joint sampling (multimodal_dataset.py:19-275).
"""

import json

import numpy as np
import pytest

from eyegaze_tpu.data.image_fusion import to_unit_float
from eyegaze_tpu.data.images import (
    convert_gaze_images,
    load_converted_gaze,
    load_gaze_pairs,
    load_image,
)
from eyegaze_tpu.data.loader import MultimodalArrays


def _write_jpgs(root, names, hw=(40, 64), seed=0):
    """Write distinct grayscale-gradient JPGs (wide like the real 3000x1583)."""
    from PIL import Image

    root.mkdir(parents=True, exist_ok=True)
    r = np.random.default_rng(seed)
    for name in names:
        arr = r.integers(0, 255, size=(hw[0], hw[1], 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"{name}.jpg", quality=95)


def _metadata(n_pairs=3, trials_per_pair=2):
    meta, names = [], []
    classes = ["Single", "Competition", "Cooperation"]
    for p in range(n_pairs):
        pair = 12 + p
        for t in range(trials_per_pair):
            p1, p2 = f"p{pair}_t{t}_a", f"p{pair}_t{t}_b"
            names += [p1, p2]
            meta.append({"pair": pair, "player1": p1, "player2": p2,
                         "class": classes[(p + t) % 3]})
    return meta, names


def test_load_image_shape_dtype(tmp_path):
    _write_jpgs(tmp_path, ["x"], hw=(30, 50))
    img = load_image(tmp_path / "x.jpg", size=16)
    assert img.shape == (3, 16, 16)
    assert img.dtype == np.uint8
    assert img.max() > img.min()  # not constant


def test_convert_and_load_roundtrip(tmp_path):
    meta, names = _metadata()
    _write_jpgs(tmp_path / "jpg", names)
    out = tmp_path / "arrays"
    report = convert_gaze_images(meta, tmp_path / "jpg", out, size=16, log_every=0)
    assert report["num_failures"] == 0
    ga = load_converted_gaze(out)
    assert ga.img1.shape == (len(meta), 3, 16, 16)
    assert ga.img1.dtype == np.uint8
    assert ga.labels.tolist() == [0, 1, 1, 2, 2, 0]
    assert sorted(set(ga.pairs.tolist())) == [12, 13, 14]
    # Converted pixels == direct decode (exact: same PIL path).
    direct = load_gaze_pairs(meta, tmp_path / "jpg", size=16)
    np.testing.assert_array_equal(np.asarray(ga.img1), direct.img1)
    np.testing.assert_array_equal(np.asarray(ga.img2), direct.img2)
    # Subset loading by indices aligns with the metadata order.
    sub = load_converted_gaze(out, indices=np.asarray([3, 1]))
    np.testing.assert_array_equal(np.asarray(sub.img1[0]), np.asarray(ga.img1[3]))
    assert sub.labels.tolist() == [2, 1]


def test_convert_missing_file_zero_fills(tmp_path):
    meta, names = _metadata(n_pairs=1, trials_per_pair=1)
    _write_jpgs(tmp_path / "jpg", names[:1])  # player2 image missing
    out = tmp_path / "arrays"
    report = convert_gaze_images(meta, tmp_path / "jpg", out, size=8, log_every=0)
    assert report["num_failures"] == 1
    assert report["failures"][0]["index"] == 0
    ga = load_converted_gaze(out)
    assert np.asarray(ga.img1[0]).max() > 0
    assert np.asarray(ga.img2[0]).max() == 0  # dummy-sample fallback
    saved = json.loads((out / "meta.json").read_text())
    assert saved["num_failures"] == 1


def test_to_unit_float():
    import jax.numpy as jnp

    u8 = jnp.asarray(np.asarray([[0, 128, 255]], np.uint8))
    f = to_unit_float(u8)
    assert f.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(f), [[0.0, 128 / 255, 1.0]])
    f32 = jnp.asarray([[0.5]], jnp.float32)
    assert to_unit_float(f32) is f32


def test_multimodal_arrays_windows_and_alignment():
    n, c, t = 4, 3, 100
    r = np.random.default_rng(0)
    img1 = r.integers(0, 255, (n, 3, 8, 8), dtype=np.uint8)
    img2 = r.integers(0, 255, (n, 3, 8, 8), dtype=np.uint8)
    eeg1 = r.normal(size=(n, c, t)).astype(np.float32)
    eeg2 = r.normal(size=(n, c, t)).astype(np.float32)
    labels = np.arange(n, dtype=np.int32) % 3
    ds = MultimodalArrays(img1, img2, eeg1, eeg2, labels,
                          window_size=40, stride=30)
    # windows per trial: starts 0,30,60 -> 3 each (dual_eeg_dataset.py:98-113)
    assert len(ds) == n * 3
    batch = ds.batch(np.asarray([0, 1, 2, 3]))
    assert batch["img1"].shape == (4, 3, 8, 8)
    assert batch["eeg1"].shape == (4, c, 40)
    # windows 0-2 belong to trial 0: same image, advancing windows
    np.testing.assert_array_equal(batch["img1"][0], batch["img1"][1])
    np.testing.assert_array_equal(batch["eeg1"][1], eeg1[0, :, 30:70])
    np.testing.assert_array_equal(batch["img1"][3], img1[1])
    assert batch["label"].tolist() == [0, 0, 0, 1]
    # iter_batches covers everything once
    seen = sum(len(b["label"]) for b in ds.iter_batches(5))
    assert seen == len(ds)


def test_multimodal_arrays_ragged_rejected():
    r = np.random.default_rng(0)
    with pytest.raises(AssertionError):
        MultimodalArrays(
            img1=r.normal(size=(3, 3, 4, 4)), img2=r.normal(size=(3, 3, 4, 4)),
            eeg1=r.normal(size=(2, 3, 50)), eeg2=r.normal(size=(2, 3, 50)),
            labels=np.zeros(3, np.int32), window_size=20, stride=20,
        )
