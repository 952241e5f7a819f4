#!/usr/bin/env python
"""Serving-path benchmark: serialized dispatch vs dynamic micro-batching.

Measures what a request storm actually sees — per-request latency percentiles
and aggregate requests/sec — for the two concurrency disciplines
``scripts/serve.py`` offers:

  serialized  each request takes the device lock and dispatches alone
              (the default; what the reference's ad-hoc loops would do)
  batched     ``serving.DynamicBatcher`` coalesces co-arriving requests into
              one padded-bucket dispatch (``--dynamic-batch``)

The storm is in-process (threads calling the predictor directly), so the
numbers isolate the dispatch/batching economics from HTTP overhead. Outputs
are host-fetched by ``predict`` itself, so timings measure completed work
(BASELINE.md timing-sync correction).

Default model: the EEG flagship (DualEEGTransformer, full config) with random
init — batching economics depend on shapes/program, not weights. Pass
--checkpoint to storm a trained checkpoint instead; --tiny shrinks the model
for CPU smoke runs.

Prints one JSON line, e.g.
  {"metric": "serving_rps_speedup", "value": 3.1, "unit": "x", ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_predictor(args):
    import jax
    import jax.numpy as jnp

    from eyegaze_tpu.serving import Predictor

    if args.checkpoint:
        return Predictor.from_checkpoint(Path(args.checkpoint).resolve(),
                                         batch_buckets=tuple(args.buckets))
    from eyegaze_tpu.models.dual_eeg import DualEEGTransformer

    if args.tiny:
        model = DualEEGTransformer(in_channels=8, d_model=32, num_layers=1,
                                   num_heads=4, d_ff=64, max_len=128,
                                   use_spectrogram=False, dtype=jnp.bfloat16)
    else:
        model = DualEEGTransformer(dtype=jnp.bfloat16)  # flagship config
    c, t = model.in_channels, args.window
    z = np.zeros((1, c, t), np.float32)
    variables = model.init(jax.random.PRNGKey(0), z, z)
    return Predictor(model, variables["params"],
                     batch_buckets=tuple(args.buckets), preprocess=True)


def storm(predict, inputs, clients: int, per_client: int):
    """clients threads x per_client sequential single-sample requests."""
    lat, lat_lock = [], threading.Lock()
    start = threading.Barrier(clients + 1)

    def client(i):
        e1, e2 = inputs[i]
        start.wait()
        for _ in range(per_client):
            t0 = time.perf_counter()
            out = predict(e1, e2)
            ms = (time.perf_counter() - t0) * 1e3
            assert np.isfinite(out["logits"]).all()
            with lat_lock:
                lat.append(ms)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    for th in threads:
        th.start()
    start.wait()
    t0 = time.perf_counter()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0
    lat.sort()
    pct = lambda p: lat[min(len(lat) - 1, int(len(lat) * p / 100))]
    return {"p50_ms": round(pct(50), 2), "p99_ms": round(pct(99), 2),
            "rps": round(len(lat) / wall, 1)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tiny", action="store_true", help="CPU-sized model")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--per-client", type=int, default=10)
    ap.add_argument("--window", type=int, default=1024,
                    help="samples per synthetic request window")
    ap.add_argument("--buckets", type=int, nargs="+", default=[1, 8, 16])
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    args = ap.parse_args(argv)

    from eyegaze_tpu.serving import DynamicBatcher

    pred = build_predictor(args)
    c = pred.model.in_channels
    t = args.window
    r = np.random.default_rng(0)
    inputs = [(r.normal(size=(1, c, t)).astype(np.float32),
               r.normal(size=(1, c, t)).astype(np.float32))
              for _ in range(args.clients)]

    # Warm every bucket a storm can hit (single + coalesced sizes).
    pred.warmup(c=c, t=t)

    lock = threading.Lock()

    def serialized(e1, e2):
        with lock:
            return pred.predict(e1, e2)

    ser = storm(serialized, inputs, args.clients, args.per_client)
    # Emit the serialized leg the moment it exists: if the batched storm (or
    # a cold bucket compile inside it) outlives the battery timeout, the
    # tail still carries half the measurement. Last line supersedes.
    print(json.dumps({"metric": "serving_rps_speedup", "value": None,
                      "unit": "x", "serialized": ser,
                      "dynamic_batch": "pending"}), flush=True)

    batcher = DynamicBatcher(pred, max_wait_ms=args.max_wait_ms)
    try:
        bat = storm(batcher.predict, inputs, args.clients, args.per_client)
        phases = batcher.phase_summary()  # p99 attribution (VERDICT r4 #6)
        stats = {k: v for k, v in batcher.stats.items()
                 if not isinstance(v, list)}
        stats["dispatch_rows"] = batcher.stats["dispatch_rows"]
    finally:
        batcher.close()

    speedup = round(bat["rps"] / ser["rps"], 2) if ser["rps"] else float("nan")
    print(json.dumps({
        "metric": "serving_rps_speedup",
        "value": speedup,
        "unit": "x",
        "serialized": ser,
        "dynamic_batch": bat,
        "phase_breakdown": phases,
        "coalescing": stats,
        "clients": args.clients,
        "per_client": args.per_client,
        "max_wait_ms": args.max_wait_ms,
        "buckets": list(pred.buckets),
        "backend": __import__("jax").default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
