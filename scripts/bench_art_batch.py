"""ART seq2seq batch sweep + attention-path shootout on TPU.

VERDICT r3 item #5: round 3 measured ART only at B=16 (410 windows/s infer,
3.3-5.4% MFU — intrinsic d=128 scale), leaving two levers untried:

1. batch: ART is bandwidth-light per window (T=1024, d=128); throughput for
   such a model should respond to batch the way ViT-B's does
   (``scripts/bench_vit_batch.py``) — sweep B in {16, 32, 64}.
2. q-chunked einsum attention (``EYEGAZE_ATTN_QCHUNK``): ART's 18 attention
   calls each materialize a (B, 8, 1024, 1024) f32 score slab through HBM;
   chunking the query axis keeps the einsum SEMANTICS (docs/PARITY.md) while
   shrinking the live slab Tq/Qc-fold.  Measured infer at every
   (batch, chunk) point; train at --train-batches.

Training note: the reference-parity train recipe drops out the softmax
WEIGHTS (art.py:207-208), which gates the chunked path off (same RNG-
semantics reasoning as flash) — so the parity train step is measured once
per batch (chunk-invariant), and chunked TRAIN rows use the documented
opt-in ``ArtConfig(attn_dropout=0.0)`` recipe (docs/PARITY.md), with its
unchunked dropout-0 step as the comparator.

Reference anchor: /root/reference/3_Models/backbones/art.py:128-213 (the
attention being re-expressed) — no reference throughput number exists.

Usage: python scripts/bench_art_batch.py [--batches 16,32,64]
       [--chunks 0,128,256] [--train-batches 16] [--skip-train]
Stdout is ONE JSON document (the measurement battery redirects it to a
.json file); progress goes to stderr.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

T = 1024


def _setup(batch: int, attn_dropout):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from eyegaze_tpu.models.art import ArtConfig, ArtifactRemovalTransformer

    model = ArtifactRemovalTransformer(ArtConfig(attn_dropout=attn_dropout),
                                       dtype=jnp.bfloat16)
    r = np.random.default_rng(4)
    noisy = jnp.asarray(r.normal(size=(batch, bench.C, T)), jnp.float32)
    clean = jnp.asarray(r.normal(size=(batch, bench.C, T)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), noisy[:1], clean[:1])["params"]
    return model, params, noisy, clean


def measure_infer(batch: int, iters: int, reps: int):
    """Fresh trace per call: EYEGAZE_ATTN_QCHUNK is read at trace time, so
    each env value needs its own jitted closure (new closure => new cache)."""
    import jax

    import bench

    model, params, noisy, clean = _setup(batch, None)
    infer = jax.jit(lambda p, x, y: model.apply({"params": p}, x, y))
    return bench._measure_fwd(infer, (params, noisy, clean), batch,
                              iters, reps)


def measure_train(batch: int, iters: int, reps: int, attn_dropout):
    import jax

    import bench
    from eyegaze_tpu.models.art import art_loss
    from eyegaze_tpu.train.optim import make_optimizer
    from eyegaze_tpu.train.state import create_train_state, training_prng_key

    model, params, noisy, clean = _setup(batch, attn_dropout)
    state = create_train_state(model, {"params": params},
                               make_optimizer(1e-4, grad_clip=1.0))

    def loss_fn(p, rng):
        recon = model.apply({"params": p}, noisy, clean,
                            deterministic=False, rngs={"dropout": rng})
        return art_loss(recon, clean)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, rng)
        return state.apply_gradients(grads), loss

    return bench._measure_train(train_step, state, training_prng_key(5),
                                batch, iters, reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,32,64")
    ap.add_argument("--chunks", default="0,128,256",
                    help="EYEGAZE_ATTN_QCHUNK values; 0 = unchunked einsum")
    ap.add_argument("--train-batches", default="16",
                    help="batches at which the train steps are measured")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--low-batch", action="store_true",
                    help="preset: infer-only B in {1,4} x chunk {0,128} — "
                    "measures the low-B·H interior of the auto q-chunk gate "
                    "that ADVICE r4 flagged as extrapolated")
    args = ap.parse_args()
    if args.low_batch:
        args.batches, args.chunks, args.skip_train = "1,4", "0,128", True

    # Pin the baseline attention dispatch: the sweep compares unchunked
    # einsum vs q-chunked einsum, never flash (measured loser at d_k=16).
    os.environ["EYEGAZE_FLASH_ATTN"] = "0"

    batches = [int(x) for x in args.batches.split(",")]
    chunks = [int(x) for x in args.chunks.split(",")]
    train_batches = ([] if args.skip_train
                     else [int(x) for x in args.train_batches.split(",")])

    def emit(row):
        # Stream each completed row to stdout immediately: a timeout mid-
        # sweep then leaves a JSONL of everything measured so far (the 19:00
        # 2026-08-19 relay-load session cost >50 min per COLD compile — an
        # all-at-the-end document forfeits hours of completed measurements).
        # The final line is the full document; parsers take the last line
        # or the row lines, both are valid JSON.
        out["sweep"].append(row)
        print(json.dumps(row), flush=True)
        print(json.dumps(row), file=sys.stderr, flush=True)

    out = {"device": None, "t": T, "note":
           "windows/s = (B, 32, 1024) noisy->denoised pairs per second; "
           "qchunk 0 = full (B,8,1024,1024) einsum (round-3 production "
           "path); train_parity keeps attention-weight dropout (chunk-"
           "invariant), train_d0 is the opt-in attn_dropout=0.0 recipe "
           "where chunking is active",
           "sweep": []}
    for b in batches:
        for qc in chunks:
            os.environ["EYEGAZE_ATTN_QCHUNK"] = str(qc)
            try:
                res = measure_infer(b, args.iters, args.reps)
                emit({"kind": "infer", "batch": b, "qchunk": qc,
                      "windows_s": res["throughput"]["mean"],
                      "mfu": res["mfu"]})
            except Exception as e:  # OOM at large batch is a valid result
                emit({"kind": "infer", "batch": b, "qchunk": qc,
                      "error": f"{type(e).__name__}: {e}"[:200]})
    for b in train_batches:
        # Parity recipe: attention-weight dropout active => chunked path is
        # gated off; one measurement per batch covers every chunk value.
        os.environ["EYEGAZE_ATTN_QCHUNK"] = "0"
        try:
            res = measure_train(b, args.iters, args.reps, None)
            emit({"kind": "train_parity", "batch": b,
                  "windows_s": res["throughput"]["mean"], "mfu": res["mfu"]})
        except Exception as e:
            emit({"kind": "train_parity", "batch": b,
                  "error": f"{type(e).__name__}: {e}"[:200]})
        for qc in chunks:
            os.environ["EYEGAZE_ATTN_QCHUNK"] = str(qc)
            try:
                res = measure_train(b, args.iters, args.reps, 0.0)
                emit({"kind": "train_d0", "batch": b, "qchunk": qc,
                      "windows_s": res["throughput"]["mean"],
                      "mfu": res["mfu"]})
            except Exception as e:
                emit({"kind": "train_d0", "batch": b, "qchunk": qc,
                      "error": f"{type(e).__name__}: {e}"[:200]})
    import jax

    out["device"] = jax.devices()[0].device_kind
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
