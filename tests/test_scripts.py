"""Smoke tests for the CLI entry points (cheap paths only)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent


def run(args, timeout=300):
    return subprocess.run(
        [sys.executable, *args], cwd=ROOT, capture_output=True, text=True,
        timeout=timeout,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )


def test_run_experiments_dry_run():
    r = run(["run_experiments.py", "--dry-run", "--experiments", "A,B,C", "--yes"])
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.count("PASS") == 13


def test_run_experiments_list():
    r = run(["run_experiments.py", "--list"])
    assert r.returncode == 0
    for name in ("A1_baseline_temporal_only", "B2_phase_only", "C4_full_losses_baseline"):
        assert name in r.stdout


def test_analyze_entropy_mock(tmp_path):
    r = run(["scripts/analyze_entropy.py", "--mock", "--output-dir", str(tmp_path)],
            timeout=600)
    assert r.returncode == 0, r.stderr[-500:]
    for f in ("gaze_entropy_raw.csv", "eeg_entropy_summary.csv",
              "gaze_entropy_boxplot.png", "eeg_entropy_tests.csv"):
        assert (tmp_path / f).exists(), f
    # Mock distributions: Competition entropy > Single (by construction).
    import pandas as pd

    summary = pd.read_csv(tmp_path / "gaze_entropy_summary.csv")
    comp = summary.loc[summary.Condition == "Competition", "Mean"].iloc[0]
    single = summary.loc[summary.Condition == "Single", "Mean"].iloc[0]
    assert comp > single


def test_graft_entry_compiles():
    """entry() must return a jittable fn and example args (driver contract)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("ge", ROOT / "__graft_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    import jax

    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 3)
    assert np.isfinite(np.asarray(out)).all()
