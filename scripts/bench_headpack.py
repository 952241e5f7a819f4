#!/usr/bin/env python
"""Head-packed attention shootout at ART's exact shape (VERDICT r4 Weak #3).

Compares, on device (B=16, H=8, T=1024, d_k=16, bf16 — the regime where the
stock flash kernel measured 2x SLOWER from 8x lane padding,
measurements/flash_attn_r3.json):

  1. kernel-only: raw attention call — headpacked Pallas
     (ops/attn_kernels.py, VMEM-resident scores) vs the unchunked einsum
     vs the q-chunked einsum scan.  Target: beat the 16.2 ms stock-flash
     kernel floor AND the ~2 ms einsum per-call cost.
  2. full-model ART inference with EYEGAZE_HEADPACK_ATTN={0,1} x
     EYEGAZE_ATTN_QCHUNK={0,auto} — the number that decides the production
     default (_headpack_eligible auto gate).
  3. parity: kernel context vs the einsum context at bf16 and f32 inputs
     (max abs diff; the kernel follows the einsum dtype contract exactly,
     so this should be ~0 — any drift fails the gate decision).

Stdout: JSONL rows, then one final JSON document (battery redirects to
measurements/headpack_attn_r5.json).  Exit 1 if parity fails (speedups from
non-parity outputs must not be reported — flash_attn_r3 precedent).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B, H, T, D = 16, 8, 1024, 16


def _fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def timed(fn, iters=10, reps=3):
    fn()  # warm
    _fence(fn())
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn()
        _fence(o)
        out.append((time.perf_counter() - t0) / iters)
    return min(out)


def kernel_shootout(dtype_name, emit):
    import jax.numpy as jnp

    from eyegaze_tpu.ops.attn_kernels import headpacked_attention

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    r = np.random.default_rng(0)
    qh, kh, vh = (jnp.asarray(r.normal(size=(B, T, H, D)), dtype)
                  for _ in range(3))
    scale = 1.0 / math.sqrt(D)

    @jax.jit
    def einsum_ctx(qh, kh, vh):
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) * scale
        a = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", a.astype(dtype), vh,
                          preferred_element_type=jnp.float32).astype(dtype)

    @jax.jit
    def packed_ctx(qh, kh, vh):
        return headpacked_attention(qh, kh, vh, scale)

    want = np.asarray(einsum_ctx(qh, kh, vh), np.float32)
    got = np.asarray(packed_ctx(qh, kh, vh), np.float32)
    max_diff = float(np.abs(want - got).max())
    scale_ref = float(np.abs(want).max())

    t_einsum = timed(lambda: einsum_ctx(qh, kh, vh))
    t_packed = timed(lambda: packed_ctx(qh, kh, vh))
    row = {"kind": "kernel_only", "dtype": dtype_name,
           "einsum_ms": round(t_einsum * 1e3, 3),
           "headpacked_ms": round(t_packed * 1e3, 3),
           "speedup": round(t_einsum / t_packed, 2),
           "max_abs_diff": max_diff, "ref_scale": scale_ref}
    emit(row)
    return row


def model_shootout(emit, iters, reps):
    import bench

    os.environ["EYEGAZE_FLASH_ATTN"] = "0"  # measured loser stays out
    rows = {}
    for name, env in (
            ("einsum", {"EYEGAZE_HEADPACK_ATTN": "0",
                        "EYEGAZE_ATTN_QCHUNK": "0"}),
            ("qchunk128", {"EYEGAZE_HEADPACK_ATTN": "0",
                           "EYEGAZE_ATTN_QCHUNK": "128"}),
            ("headpacked", {"EYEGAZE_HEADPACK_ATTN": "1",
                            "EYEGAZE_ATTN_QCHUNK": "0"}),
    ):
        os.environ.update(env)
        try:
            res = bench.bench_art(batch=B, iters=iters, reps=reps)
            row = {"kind": "art_full_model", "path": name,
                   "infer_windows_s": res["infer"]["throughput"]["mean"],
                   "infer_mfu": res["infer"]["mfu"],
                   "train_windows_s": res["train"]["throughput"]["mean"],
                   "attention_path_reported": res.get("infer_attention_path")}
        except Exception as e:  # noqa: BLE001 — recorded, next path measured
            row = {"kind": "art_full_model", "path": name,
                   "error": f"{type(e).__name__}: {e}"[:300]}
        emit(row)
        rows[name] = row
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-model", action="store_true")
    args = ap.parse_args()

    global jax
    import jax

    out = {"shape": dict(b=B, h=H, t=T, d=D), "rows": []}

    def emit(row):
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
        print(json.dumps(row), file=sys.stderr, flush=True)

    def guarded(dtype_name):
        # A kernel-leg failure (e.g. the round-5 first-cut VMEM OOM at f32)
        # must record an error row, not forfeit the whole shootout.
        try:
            return kernel_shootout(dtype_name, emit)
        except Exception as e:  # noqa: BLE001
            row = {"kind": "kernel_only", "dtype": dtype_name,
                   "error": f"{type(e).__name__}: {e}"[:400]}
            emit(row)
            return row

    k_bf16 = guarded("bf16")
    k_f32 = guarded("f32")

    # Parity gate: bf16 tolerance covers bf16 rounding of identical math
    # (contract: same f32-accum dtype path as einsum, so expect ~1 ulp).
    tol = {"bf16": 0.05, "f32": 2e-5}
    parity_ok = (
        "error" not in k_bf16 and "error" not in k_f32
        and k_bf16["max_abs_diff"] <= tol["bf16"] * k_bf16["ref_scale"]
        and k_f32["max_abs_diff"] <= tol["f32"] * max(k_f32["ref_scale"], 1.0))
    out["parity_ok"] = parity_ok

    if not args.skip_model:
        out["model"] = model_shootout(emit, args.iters, args.reps)

    out["device"] = jax.devices()[0].device_kind
    print(json.dumps(out, indent=2))
    if not parity_ok:
        print("[headpack] PARITY FAIL — speedups above are not reportable",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
