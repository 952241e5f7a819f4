#!/usr/bin/env python
"""End-to-end benchmark: preprocess+infer throughput on the flagship model.

Measures trials/sec/chip for the full DualEEGTransformer inference path —
on-device preprocessing (CAR + z-score) + IBS connectivity (6 bands x 7
features x 32x32) + spectrogram tokens + Siamese transformer + cross-brain
attention — i.e. everything from raw (32, 1024) window pairs to class logits.

Baseline comparator: the reference computes the same per-trial work on CPU
with NumPy loops (IBSConnectivityMatrixGenerator's Python double loops,
dual_eeg_transformer.py:593-758, plus torch forward).  We time a literal
NumPy port of just the connectivity block (tests/golden/reference_port.py) —
a conservative under-estimate of the reference's true per-trial cost (it
excludes the reference's own model forward) — and report
vs_baseline = tpu_trials_per_sec / cpu_reference_trials_per_sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "trials/sec/chip", "vs_baseline": N,
   "extra": {...}}
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_tpu(batch=64, iters=10, c=32, t=1024):
    import jax
    import jax.numpy as jnp

    from eyegaze_tpu.models.dual_eeg import DualEEGTransformer
    from eyegaze_tpu.ops.preprocess import common_average_reference, zscore

    model = DualEEGTransformer(
        in_channels=c, num_classes=3, d_model=256, num_layers=6, num_heads=8,
        d_ff=1024, max_len=256, sampling_rate=256.0,
        use_spectrogram=True, use_ibs=True, use_robust_ibs=True,
        use_cross_attention=True, dtype=jnp.bfloat16,
    )
    r = np.random.default_rng(0)
    e1 = jnp.asarray(r.normal(size=(batch, c, t)).astype(np.float32))
    e2 = jnp.asarray(r.normal(size=(batch, c, t)).astype(np.float32))
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, e1[:1], e2[:1])
    params = variables["params"]

    @jax.jit
    def pipeline(params, x1, x2):
        # On-device preprocessing (dual_eeg_dataset SimpleEEGPreprocessor role)
        x1 = zscore(common_average_reference(x1))
        x2 = zscore(common_average_reference(x2))
        return model.apply({"params": params}, x1, x2)["logits"]

    # Warmup / compile
    out = pipeline(params, e1, e2)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(params, e1, e2)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    throughput = batch * iters / dt

    # p50 single-trial latency
    e1s, e2s = e1[:1], e2[:1]
    out = pipeline(params, e1s, e2s)
    jax.block_until_ready(out)
    lats = []
    for _ in range(20):
        s = time.perf_counter()
        jax.block_until_ready(pipeline(params, e1s, e2s))
        lats.append(time.perf_counter() - s)
    p50 = float(np.median(lats) * 1000)
    return throughput, p50


def bench_cpu_reference(c=32, t=1024, n_bands_timed=1, reps=3):
    """Time the literal NumPy port of the reference connectivity loops for one
    trial; extrapolate one timed band to all 6 (best of ``reps`` repetitions
    for a stable baseline)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from tests.golden import reference_port as ref

    r = np.random.default_rng(1)
    e1 = r.normal(size=(1, c, t)).astype(np.float64)
    e2 = r.normal(size=(1, c, t)).astype(np.float64)
    bands = dict(list(ref.BANDS_6.items())[:n_bands_timed])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        ref.connectivity_matrices(e1, e2, fs=256.0, bands=bands)
        best = min(best, time.perf_counter() - t0)
    dt = best * (len(ref.BANDS_6) / n_bands_timed)
    return 1.0 / dt  # trials/sec


def main():
    tpu_tps, p50_ms = bench_tpu()
    cpu_tps = bench_cpu_reference()
    result = {
        "metric": "eeg_e2e_preprocess_infer_throughput",
        "value": round(tpu_tps, 2),
        "unit": "trials/sec/chip",
        "vs_baseline": round(tpu_tps / cpu_tps, 1),
        "extra": {
            "p50_trial_latency_ms": round(p50_ms, 2),
            "cpu_reference_trials_per_sec": round(cpu_tps, 3),
            "model": "DualEEGTransformer full (IBS robust + spectrogram + cross-attn)",
            "batch": 64,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
