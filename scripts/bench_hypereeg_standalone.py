#!/usr/bin/env python
"""Standalone HyperEEG device benchmark with per-phase timing.

The five-family battery (bench.py) lost its hypereeg row twice to rc=124:
the family's cold compile through the remote-compile relay exceeded every
between-family budget estimate (>35 min measured 2026-08-20, vs ~90-190 s
for the relay-cache-hit families).  This script runs ONLY the hypereeg
family, logging a timestamp after every phase (import / data / init /
infer-compile / infer-measure / train-compile / train-measure) so the stall
is attributable, and commits the measured numbers that VERDICT r3 item #4
asks for.  Running it also warms the relay cache so the driver's final
bench.py pass hits compiled programs.

Reference anchor: /root/reference/4_Experiments/experiments_list.md:321-325
(~1 min/epoch at batch 256 on an RTX 4070).

Usage:
    python scripts/bench_hypereeg_standalone.py [--iters 5] [--reps 3] \
        [--batch 64] [--out measurements/bench_hypereeg_r4.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

_T0 = time.time()


def log(msg: str) -> None:
    print(f"[hypereeg +{time.time() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default="measurements/bench_hypereeg_r4.json")
    args = ap.parse_args()

    phases: dict[str, float] = {}

    def phase(name: str) -> None:
        phases[name] = round(time.time() - _T0, 1)
        log(name)

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from eyegaze_tpu.models.hypereeg import create_hypereeg_model
    from eyegaze_tpu.train.losses import cross_entropy
    from eyegaze_tpu.train.optim import make_optimizer
    from eyegaze_tpu.train.state import create_train_state, training_prng_key

    phase("imports")
    dev = jax.devices()[0]
    log(f"backend={dev.platform} kind={dev.device_kind}")

    C, WINDOW = bench.C, bench.WINDOW
    model = create_hypereeg_model("full", in_channels=C, embed_dim=128,
                                  num_heads=4, sinc_kernel_size=125,
                                  sample_rate=256.0, dtype=jnp.bfloat16)
    r = np.random.default_rng(8)
    e1 = jnp.asarray(r.normal(size=(args.batch, C, WINDOW)), jnp.float32)
    e2 = jnp.asarray(r.normal(size=(args.batch, C, WINDOW)), jnp.float32)
    labels = jnp.asarray(np.arange(args.batch) % 3, jnp.int32)
    phase("data_on_device")

    params = jax.jit(model.init)(jax.random.PRNGKey(0), e1[:1], e2[:1])["params"]
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    phase("init")
    log(f"params={n_params:,}")

    partial = {
        "family": "hypereeg", "batch": args.batch, "iters": args.iters,
        "reps": args.reps, "n_params": n_params,
        "device_kind": dev.device_kind, "phase_elapsed_s": phases,
    }

    def dump(extra):
        # Incremental: the train-step cold compile has exceeded 35 min and
        # outer timeouts before — never lose what is already measured.
        partial.update(extra)
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(partial, indent=2) + "\n")

    infer = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b)["logits"])
    # AOT-compile once; _measure_fwd reuses the executable for timing and
    # cost analysis (a separate jit call + .lower().compile() pays the
    # relay compile twice on a relay-cache miss — measured ~50 min each
    # for the train step of this very model).
    infer_c = infer.lower(params, e1, e2).compile()
    phase("infer_compile")
    res_i = bench._measure_fwd(infer_c, (params, e1, e2), args.batch,
                               args.iters, args.reps)
    phase("infer_measure")
    log(f"infer: {res_i['throughput']['mean']:.1f} windows/s "
        f"mfu={res_i['mfu']}")
    dump({"infer": res_i, "train": "pending (cold compile can exceed "
                                   "outer timeouts)"})

    state = create_train_state(model, {"params": params},
                               make_optimizer(1e-3, grad_clip=1.0))

    def loss_fn(p, rng):
        out = model.apply({"params": p}, e1, e2,
                          deterministic=False, rngs={"dropout": rng})
        return cross_entropy(out["logits"], labels)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, rng)
        return state.apply_gradients(grads), loss

    rng = training_prng_key(9)
    train_step_c = train_step.lower(state, rng).compile()
    phase("train_compile")
    res_t = bench._measure_train(train_step_c, state, rng, args.batch,
                                 args.iters, args.reps)
    phase("train_measure")
    log(f"train: {res_t['throughput']['mean']:.1f} windows/s "
        f"mfu={res_t['mfu']}")

    dump({"infer": res_i, "train": res_t,
          "reference_anchor": "experiments_list.md:321-325 "
                              "(~1 min/epoch @ batch 256, RTX 4070)"})
    # Full dict on stdout: bench.py's subprocess wrapper parses this line
    # into the same {infer, train} shape the in-process families return.
    print(json.dumps(partial), flush=True)
    log(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
