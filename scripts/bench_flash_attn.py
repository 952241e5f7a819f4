"""Flash-attention shootout for the ART denoiser (T=1024) on TPU.

Decides whether the Pallas flash-attention kernel
(`jax.experimental.pallas.ops.tpu.flash_attention`) beats the einsum +
materialized-softmax path for ART's 18 attention calls per forward
(reference scale: `3_Models/backbones/art.py:566-658`, embed 128, 8 heads,
d_k 16, T=1024).  The einsum path streams ~67 MB/sample/layer of f32 scores
through HBM; flash keeps them in VMEM.

Runs BOTH paths (EYEGAZE_FLASH_ATTN=1/0 at trace time), checks output parity,
and times inference + (dropout=0) train step host-fetch-fenced.

Usage: python scripts/bench_flash_attn.py [--batch 16] [--iters 10] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _fence(out):
    """Host-fetch completion barrier (block_until_ready returns at dispatch
    on the axon relay — CLAUDE.md timing discipline). Use after every warmup
    call so the compile/warmup execution cannot bleed into the first rep."""
    import jax

    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return out


def _timed_reps(fn, iters, reps):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        _fence(out)  # host fetch = barrier
        times.append(time.perf_counter() - t0)
    return float(np.median(times) / iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--t", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sweep-blocks", action="store_true",
                    help="also sweep kernel BlockSizes on the raw attention shape")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from eyegaze_tpu.models.art import ArtConfig, ArtifactRemovalTransformer, art_loss

    r = np.random.default_rng(7)
    noisy = jnp.asarray(r.normal(size=(args.batch, 32, args.t)), jnp.float32)
    clean = jnp.asarray(r.normal(size=(args.batch, 32, args.t)), jnp.float32)

    results = {"backend": jax.devices()[0].device_kind,
               "batch": args.batch, "t": args.t}

    def build(flash: bool, dtype, dropout: float):
        os.environ["EYEGAZE_FLASH_ATTN"] = "1" if flash else "0"
        cfg = ArtConfig(dropout=dropout)
        model = ArtifactRemovalTransformer(cfg, dtype=dtype)
        params = model.init(jax.random.PRNGKey(0), noisy[:1], clean[:1])["params"]
        return model, params

    # --- parity: flash vs einsum, f32 then bf16 ----------------------------
    for dtype, tol, name in ((jnp.float32, 2e-5, "f32"), (jnp.bfloat16, 5e-2, "bf16")):
        try:
            model, params = build(False, dtype, 0.0)
            os.environ["EYEGAZE_FLASH_ATTN"] = "0"
            ref = jax.jit(lambda p, x, y: model.apply({"params": p}, x, y))(
                params, noisy, clean)
            os.environ["EYEGAZE_FLASH_ATTN"] = "1"
            out = jax.jit(lambda p, x, y: model.apply({"params": p}, x, y))(
                params, noisy, clean)
            diff = float(jnp.max(jnp.abs(out - ref)))
            scale = float(jnp.max(jnp.abs(ref)))
            results[f"parity_{name}_max_abs_diff"] = diff
            results[f"parity_{name}_ref_scale"] = scale
            results[f"parity_{name}_ok"] = bool(diff < tol * max(scale, 1.0))
        except Exception as e:
            results[f"parity_{name}_error"] = f"{type(e).__name__}: {e}"

    # --- timing: inference (bf16, the bench_art configuration) -------------
    for flash in (False, True):
        key = "flash" if flash else "einsum"
        try:
            model, params = build(flash, jnp.bfloat16, 0.1)
            fn = jax.jit(lambda p, x, y: model.apply({"params": p}, x, y))
            _fence(fn(params, noisy, clean))  # compile + completion fence
            results[f"infer_{key}_ms"] = 1e3 * _timed_reps(
                lambda: fn(params, noisy, clean), args.iters, args.reps)
        except Exception as e:
            results[f"infer_{key}_error"] = f"{type(e).__name__}: {e}"

    # --- timing: train step with attention dropout DISABLED (dropout=0 model
    # keeps residual/FFN dropout off too — this measures the kernel's
    # backward; the production dropout=0.1 train step keeps the einsum path
    # for reference parity, art.py:207-208) ---------------------------------
    import optax

    for flash in (False, True):
        key = "flash" if flash else "einsum"
        try:
            model, params = build(flash, jnp.bfloat16, 0.0)
            tx = optax.adamw(1e-4)
            opt_state = tx.init(params)

            def loss_fn(p):
                recon = model.apply({"params": p}, noisy, clean)
                return art_loss(recon, clean)

            @jax.jit
            def step(p, s):
                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = tx.update(grads, s, p)
                return optax.apply_updates(p, updates), s, loss

            p, s, loss0 = step(params, opt_state)  # compile
            _fence(loss0)  # completion fence before the timed reps
            holder = {"p": p, "s": s}

            def one():
                holder["p"], holder["s"], loss = step(holder["p"], holder["s"])
                return loss

            results[f"train0_{key}_ms"] = 1e3 * _timed_reps(one, args.iters, args.reps)
        except Exception as e:  # record, keep the inference results
            results[f"train0_{key}_error"] = f"{type(e).__name__}: {e}"

    # Speedups are only meaningful for a kernel producing correct outputs:
    # suppress them (and fail the run) if any parity check did not pass.
    parity_ok = all(results.get(f"parity_{n}_ok", False) for n in ("f32", "bf16"))
    if parity_ok:
        if "infer_flash_ms" in results and "infer_einsum_ms" in results:
            results["infer_speedup"] = results["infer_einsum_ms"] / results["infer_flash_ms"]
        if "train0_flash_ms" in results and "train0_einsum_ms" in results:
            results["train0_speedup"] = results["train0_einsum_ms"] / results["train0_flash_ms"]

    # --- kernel-only block-size sweep (ART attention shape) ----------------
    if args.sweep_blocks:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention,
        )

        q = jnp.asarray(r.normal(size=(args.batch, 8, args.t, 16)), jnp.bfloat16)
        kv = jnp.asarray(r.normal(size=(args.batch, 8, args.t, 16)), jnp.bfloat16)
        sweep = {}
        for bq, bkM, bk in ((128, 128, 128), (256, 256, 256), (512, 512, 512),
                            (256, 512, 512), (512, 1024, 512), (1024, 1024, 1024)):
            if bq > args.t or bkM > args.t:
                continue
            bs = BlockSizes(block_q=bq, block_k_major=bkM, block_k=bk, block_b=1,
                            block_q_major_dkv=bq, block_k_major_dkv=bkM,
                            block_k_dkv=bk, block_q_dkv=bq,
                            block_k_major_dq=bkM, block_k_dq=bk, block_q_dq=bq)
            try:
                fn = jax.jit(lambda q, k, v, bs=bs: flash_attention(
                    q, k, v, sm_scale=0.25, block_sizes=bs))
                _fence(fn(q, kv, kv))
                sweep[f"q{bq}_kM{bkM}_k{bk}"] = round(
                    1e3 * _timed_reps(lambda: fn(q, kv, kv), args.iters, args.reps), 4)
            except Exception as e:
                sweep[f"q{bq}_kM{bkM}_k{bk}"] = f"{type(e).__name__}"[:80]
        results["block_sweep_ms"] = sweep

    print(json.dumps(results, indent=2))
    if not parity_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
