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
    from eyegaze_tpu.ops.connectivity import (
        _pairwise_phase_metrics_xla,
        _plv_matrix,
    )

    b, c, t = args.batch, args.channels, args.time
    r = np.random.default_rng(0)
    ph1 = jnp.asarray(r.uniform(-np.pi, np.pi, (b, c, t)).astype(np.float32))
    ph2 = jnp.asarray(r.uniform(-np.pi, np.pi, (b, c, t)).astype(np.float32))
    pw1 = jnp.asarray(r.uniform(0, 1, (b, c, t)).astype(np.float32))
    pw2 = jnp.asarray(r.uniform(0, 1, (b, c, t)).astype(np.float32))

    @jax.jit
    def xla_path(a, bb, cc, dd):
        # The explicit XLA implementation — NOT the auto-dispatching wrapper,
        # which would itself pick the Pallas kernel on TPU.
        return _pairwise_phase_metrics_xla(a, bb, cc, dd, eps=1e-8, row_chunk=8)

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
    if not pallas_ms:
        raise SystemExit(
            f"no row tile in (8, 16, 32) divides --channels {c}; "
            "pick a channel count that is a multiple of 8")
    ms_pal = min(pallas_ms.values())
    errs = [float(jnp.max(jnp.abs(a - bb)))
            for a, bb in zip(out_xla, out_pal)]

    # --- Widened-kernel experiment (VERDICT r2 #6): does folding PLV into the
    # dphi-tile kernel (VPU cos/sin) beat the production split (4 MXU matmuls
    # from the free band/quad cos/sin + 3-output kernel)?  Production inputs
    # get cos/sin for free from the analytic parts, so they are GIVEN here.
    c1, s1 = jnp.cos(ph1), jnp.sin(ph1)
    c2, s2 = jnp.cos(ph2), jnp.sin(ph2)

    @jax.jit
    def production_plv4(a, bb, cc, dd, c1, s1, c2, s2):
        plv = _plv_matrix(c1, s1, c2, s2)
        pli, wpli, pdiff = pallas_kernels.pairwise_phase_metrics(
            a, bb, cc, dd, eps=1e-8, row_tile=32)
        return plv, pli, wpli, pdiff

    @jax.jit
    def widened_plv5(a, bb, cc, dd):
        # R=16: the widened kernel's cos/sin temporaries + 5 outputs blow the
        # 16 MB VMEM budget at R=32 (measured: 17.86M requested).
        return pallas_kernels.pairwise_phase_plv_metrics(
            a, bb, cc, dd, eps=1e-8, row_tile=16)

    def timeit_fn(fn, *inp):
        out = fn(*inp)
        device_barrier(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*inp)
        device_barrier(out)
        return (time.perf_counter() - t0) / args.iters * 1000, out

    ms_p4, out_p4 = timeit_fn(production_plv4, ph1, ph2, pw1, pw2, c1, s1, c2, s2)
    ms_p5, out_p5 = timeit_fn(widened_plv5, ph1, ph2, pw1, pw2)
    plv_err = float(jnp.max(jnp.abs(out_p4[0] - out_p5[0])))

    # --- Coherence: six per-band full-F broadcast-reduces (round-2 path) vs
    # the single masked-contraction pass over the union bins (round-3 path).
    from eyegaze_tpu.ops.connectivity import _coherence_all_bands, _coherence_matrix
    from eyegaze_tpu.ops.spectral import BAND_DEFS_6, band_masks, band_masks_np

    f = t // 2 + 1
    pxx = jnp.asarray(r.uniform(0.1, 10.0, (b, c, f)).astype(np.float32))
    pyy = jnp.asarray(r.uniform(0.1, 10.0, (b, c, f)).astype(np.float32))
    masks = band_masks(t, 256.0, BAND_DEFS_6)
    masks_np = band_masks_np(t, 256.0, BAND_DEFS_6)

    @jax.jit
    def coh_old(px, py):
        return jnp.stack([_coherence_matrix(px * masks[k], py * masks[k], 1e-8)
                          for k in range(len(BAND_DEFS_6))], axis=1)

    @jax.jit
    def coh_new(px, py):
        return _coherence_all_bands(px, py, masks_np, 1e-8)

    ms_co, out_co = timeit_fn(coh_old, pxx, pyy)
    ms_cn, out_cn = timeit_fn(coh_new, pxx, pyy)
    coh_err = float(jnp.max(jnp.abs(out_co - out_cn)))

    result = {
        "shape": [b, c, t],
        "xla_ms": round(ms_xla, 4),
        "pallas_best_ms": round(ms_pal, 4),
        **pallas_ms,
        "speedup_pallas_over_xla": round(ms_xla / ms_pal, 2),
        "max_abs_diff": max(errs),
        "winner": "pallas" if ms_pal < ms_xla else "xla",
        "plv4_production_ms": round(ms_p4, 4),
        "plv5_widened_ms": round(ms_p5, 4),
        "plv_widened_speedup": round(ms_p4 / ms_p5, 2),
        "plv_max_abs_diff": plv_err,
        "plv_winner": "widened_kernel" if ms_p5 < ms_p4 else "matmul+kernel",
        "coherence_6pass_ms": round(ms_co, 4),
        "coherence_fused_ms": round(ms_cn, 4),
        "coherence_speedup": round(ms_co / ms_cn, 2),
        "coherence_max_abs_diff": coh_err,
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
