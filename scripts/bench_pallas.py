#!/usr/bin/env python
"""XLA-fusion vs Pallas-kernel shootout for the pairwise phase metrics.

Times the chunked-lax.map XLA path against the fused Pallas kernel
(ops/pallas_kernels.py) on identical (B, C, T) inputs, checks numerical
equivalence, and prints a JSON summary.  Run on the real TPU; results are
recorded in BASELINE.md (VERDICT round-1 item: "one Pallas kernel that
actually wins, or document the XLA path as final").

    python scripts/bench_pallas.py [--batch 64] [--channels 32] [--time 1024]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--time", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from eyegaze_tpu.ops import pallas_kernels
    from eyegaze_tpu.ops.connectivity import _pairwise_phase_metrics

    b, c, t = args.batch, args.channels, args.time
    r = np.random.default_rng(0)
    ph1 = jnp.asarray(r.uniform(-np.pi, np.pi, (b, c, t)).astype(np.float32))
    ph2 = jnp.asarray(r.uniform(-np.pi, np.pi, (b, c, t)).astype(np.float32))
    pw1 = jnp.asarray(r.uniform(0, 1, (b, c, t)).astype(np.float32))
    pw2 = jnp.asarray(r.uniform(0, 1, (b, c, t)).astype(np.float32))

    @jax.jit
    def xla_path(a, bb, cc, dd):
        return _pairwise_phase_metrics(a, bb, cc, dd, eps=1e-8, row_chunk=8)

    def pallas_path(row_tile):
        @jax.jit
        def fn(a, bb, cc, dd):
            return pallas_kernels.pairwise_phase_metrics(
                a, bb, cc, dd, eps=1e-8, row_tile=row_tile)
        return fn

    from eyegaze_tpu.train.profiler import device_barrier

    def timeit(fn):
        # device_barrier (host-fetch), NOT block_until_ready: the latter
        # returns after dispatch on the relay backend (see profiler.py).
        out = fn(ph1, ph2, pw1, pw2)
        device_barrier(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(ph1, ph2, pw1, pw2)
        device_barrier(out)
        return (time.perf_counter() - t0) / args.iters * 1000, out

    ms_xla, out_xla = timeit(xla_path)
    pallas_ms = {}
    out_pal = None
    for r_tile in (8, 16, 32):
        if c % r_tile:
            continue
        ms, out_pal = timeit(pallas_path(r_tile))
        pallas_ms[f"pallas_r{r_tile}_ms"] = round(ms, 4)
    ms_pal = min(pallas_ms.values())
    errs = [float(jnp.max(jnp.abs(a - bb)))
            for a, bb in zip(out_xla, out_pal)]

    result = {
        "shape": [b, c, t],
        "xla_ms": round(ms_xla, 4),
        "pallas_best_ms": round(ms_pal, 4),
        **pallas_ms,
        "speedup_pallas_over_xla": round(ms_xla / ms_pal, 2),
        "max_abs_diff": max(errs),
        "winner": "pallas" if ms_pal < ms_xla else "xla",
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
