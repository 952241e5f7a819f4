#!/usr/bin/env python
"""Component-level timing of the inference pipeline (host-fetch-fenced).

Attributes the end-to-end raw->logits time (bench.py) to its stages:
offline-parity preprocessing (filtfilt/CAR/z-score/window), the analytic-
signal block, the full connectivity block, spectrogram features, and the
model forward under ablation flags (full / no-IBS / no-spectrogram), so
optimization effort goes where the time is.

    python scripts/profile_components.py [--trials 16] [--windows 80]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from eyegaze_tpu.models.dual_eeg import DualEEGTransformer
from eyegaze_tpu.ops.connectivity import connectivity_matrices
from eyegaze_tpu.ops.preprocess import preprocess_eeg, sliding_windows
from eyegaze_tpu.ops.spectral import BAND_DEFS_6, analytic_band_parts, stft_log_magnitude
from eyegaze_tpu.train.profiler import time_fn


def _model(**flags):
    cfg = dict(
        in_channels=32, num_classes=3, d_model=256, num_layers=6, num_heads=8,
        d_ff=1024, max_len=256, sampling_rate=256.0, use_spectrogram=True,
        use_ibs=True, use_robust_ibs=True, use_cross_attention=True,
        dtype=jnp.bfloat16,
    )
    cfg.update(flags)
    return DualEEGTransformer(**cfg)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=16)
    ap.add_argument("--windows", type=int, default=None,
                    help="defaults to 5x trials (1024/512 windows over T=3250)")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args(argv)
    if args.windows is None:
        args.windows = args.trials * 5

    r = np.random.default_rng(0)
    raw = jnp.asarray(r.normal(size=(args.trials, 32, 3250)), jnp.float32)
    win1 = jnp.asarray(r.normal(size=(args.windows, 32, 1024)), jnp.float32)
    win2 = jnp.asarray(r.normal(size=(args.windows, 32, 1024)), jnp.float32)

    stats = {}

    def put(key, val):
        # Stream every stage the moment it is measured (JSONL): a battery
        # timeout mid-profile then keeps all completed stages; the final
        # single-line document supersedes the stream.
        stats[key] = val
        print(json.dumps({key: round(val, 3)}), flush=True)

    # Per-call dispatch floor of this deployment (relay-attached chip):
    # a trivial jit call measures ~3.3-3.6 ms wall.  Subtract it from every
    # standalone number below to get device time; deltas between two full
    # forwards cancel it automatically.
    floor = jax.jit(lambda x: x + 1.0)
    put("dispatch_floor_ms", time_fn(floor, jnp.ones((8,)),
                                     iters=args.iters)["mean_s"] * 1e3)

    prep = jax.jit(lambda x: sliding_windows(
        preprocess_eeg(x, sampling_rate=256.0), 1024, 512))
    put("preprocess_per_player_ms", time_fn(prep, raw, iters=args.iters)["mean_s"] * 1e3)

    ana = jax.jit(lambda x: analytic_band_parts(x, 256.0, BAND_DEFS_6))
    put("analytic_6band_per_player_ms", time_fn(ana, win1, iters=args.iters)["mean_s"] * 1e3)

    conn = jax.jit(lambda a, b: connectivity_matrices(a, b, 256.0))
    put("connectivity_full_ms", time_fn(conn, win1, win2, iters=args.iters)["mean_s"] * 1e3)

    spec = jax.jit(lambda x: stft_log_magnitude(x))
    put("stft_per_player_ms", time_fn(spec, win1, iters=args.iters)["mean_s"] * 1e3)

    for name, flags in (
        ("forward_full", {}),
        ("forward_no_ibs", {"use_ibs": False, "use_robust_ibs": False}),
        ("forward_no_spectrogram", {"use_spectrogram": False}),
        ("forward_no_ibs_no_spec", {"use_ibs": False, "use_robust_ibs": False,
                                    "use_spectrogram": False}),
    ):
        m = _model(**flags)
        params = m.init(jax.random.PRNGKey(0), win1[:1], win2[:1])["params"]
        fwd = jax.jit(lambda p, a, b, m=m: m.apply({"params": p}, a, b)["logits"])
        put(f"{name}_ms", time_fn(fwd, params, win1, win2,
                                  iters=args.iters)["mean_s"] * 1e3)

    stats = {k: round(v, 3) for k, v in stats.items()}
    stats["shape"] = f"{args.windows}x32x1024 windows, {args.trials}x32x3250 raw"
    stats["backend"] = jax.devices()[0].device_kind
    print(json.dumps(stats), flush=True)  # final line supersedes the stream
    return 0


if __name__ == "__main__":
    sys.exit(main())
