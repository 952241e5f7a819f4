#!/usr/bin/env python
"""Profile the flagship model: per-step timing + optional XProf trace dump.

First-class tracing (SURVEY.md §5.1 — the reference has only tqdm bars):

    python scripts/profile_model.py --batch 64 [--trace runs/profile] [--train]
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
from eyegaze_tpu.train.losses import cross_entropy
from eyegaze_tpu.train.optim import make_optimizer
from eyegaze_tpu.train.profiler import time_fn, trace
from eyegaze_tpu.train.state import create_train_state


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--window", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trace", default=None, help="dump an XProf trace here")
    ap.add_argument("--train", action="store_true", help="profile the train step too")
    args = ap.parse_args(argv)

    model = DualEEGTransformer(
        in_channels=args.channels, d_model=256, num_layers=6, num_heads=8,
        d_ff=1024, max_len=max(args.window // 4, 256), dtype=jnp.bfloat16,
    )
    r = np.random.default_rng(0)
    e1 = jnp.asarray(r.normal(size=(args.batch, args.channels, args.window)), jnp.float32)
    e2 = jnp.asarray(r.normal(size=(args.batch, args.channels, args.window)), jnp.float32)
    labels = jnp.asarray(np.arange(args.batch) % 3, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), e1[:1], e2[:1])
    params = variables["params"]

    fwd = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b)["logits"])
    stats = {"forward": time_fn(fwd, params, e1, e2, iters=args.iters)}
    stats["forward"]["trials_per_sec"] = args.batch / stats["forward"]["p50_s"]

    if args.train:
        tx = make_optimizer(1e-4)
        state = create_train_state(model, variables, tx)

        def train_step(state, a, b, y):
            def loss_fn(p):
                out = model.apply({"params": p}, a, b, deterministic=False,
                                  rngs={"dropout": jax.random.PRNGKey(0)})
                return cross_entropy(out["logits"], y)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads), loss

        from eyegaze_tpu.train.profiler import device_barrier

        step = jax.jit(train_step)
        state, loss = step(state, e1, e2, labels)  # warmup w/o donation reuse issues
        device_barrier(loss)
        import time as _time

        times = []
        for _ in range(3):  # bursts; one host-fetch barrier amortized per burst
            t0 = _time.perf_counter()
            for _ in range(args.iters):
                state, loss = step(state, e1, e2, labels)
            device_barrier(loss)
            times.append((_time.perf_counter() - t0) / args.iters)
        p50 = float(np.percentile(times, 50))
        stats["train_step"] = {"p50_s": p50, "trials_per_sec": args.batch / p50}

    if args.trace:
        with trace(args.trace):
            # block_until_ready returns at DISPATCH on the axon relay; a
            # host fetch is the only real completion fence (CLAUDE.md), and
            # stopping the trace early would truncate the xplane.
            device_barrier(fwd(params, e1, e2))
        stats["trace_dir"] = args.trace

    print(json.dumps(stats, indent=2, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
