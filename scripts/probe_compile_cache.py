#!/usr/bin/env python
"""Probe whether JAX's persistent compilation cache works on the axon relay.

The round-3/4 bench captures were lost to cold XLA compiles through the
remote-compile relay (~3-4 min per program, >35 min for HyperEEG's train
step).  jax's persistent compilation cache (`jax_compilation_cache_dir`)
serializes compiled executables to disk; if the experimental axon backend
supports executable (de)serialization, a warmed cache directory makes every
subsequent process — including the driver's final `bench.py` pass — skip
the relay compile entirely.

This probe compiles one distinctive program twice in two child processes
sharing a fresh cache dir and reports both compile times plus whether the
cache dir gained entries.  A second-run speedup >5x with cache files
present = supported.

    python scripts/probe_compile_cache.py [--cache-dir /root/repo/.jax_cache]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

CHILD = r"""
import json, sys, time
cache_dir = sys.argv[1]
nonce = int(sys.argv[2])
import jax
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

# Nonce-dependent odd dims: a RELAY-side program cache from any earlier
# probe invocation cannot hide run 1's true compile cost, while run 2 of the
# SAME invocation (same nonce) still exercises the on-disk cache under test.
x = jnp.asarray(np.random.default_rng(0).normal(
    size=(193 + 2 * (nonce % 31), 509 + 2 * (nonce % 13))), jnp.bfloat16)


@jax.jit
def f(a):
    b = a @ a.T
    for _ in range(3 + nonce % 3):
        b = jnp.tanh(b) @ b
    return b.sum()


t0 = time.time()
v = float(np.asarray(f(x)))
t_first = time.time() - t0
t0 = time.time()
v2 = float(np.asarray(f(x)))
t_second = time.time() - t0
print(json.dumps({"first_call_s": round(t_first, 2),
                  "cached_call_s": round(t_second, 3),
                  "value_finite": bool(np.isfinite(v))}))
"""


def run_child(cache_dir: str, nonce: int) -> dict:
    r = subprocess.run([sys.executable, "-c", CHILD, cache_dir, str(nonce)],
                       capture_output=True, text=True, timeout=900,
                       cwd=str(Path(__file__).resolve().parents[1]))
    if r.returncode != 0:
        return {"error": r.stderr.strip()[-400:]}
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", default=None,
                    help="default: fresh temp dir (probe only)")
    ap.add_argument("--out", default="measurements/compile_cache_probe.json")
    args = ap.parse_args()

    cache_dir = args.cache_dir or tempfile.mkdtemp(prefix="jaxcache_probe_")
    os.makedirs(cache_dir, exist_ok=True)
    nonce = int(time.time()) % 100000

    print(f"[probe] run 1 (cold) cache_dir={cache_dir} nonce={nonce}",
          file=sys.stderr, flush=True)
    run1 = run_child(cache_dir, nonce)
    entries = sorted(p.name for p in Path(cache_dir).glob("*"))
    print(f"[probe] run 1: {run1}; cache entries: {len(entries)}",
          file=sys.stderr, flush=True)
    print("[probe] run 2 (fresh process, warmed dir)", file=sys.stderr,
          flush=True)
    run2 = run_child(cache_dir, nonce)
    print(f"[probe] run 2: {run2}", file=sys.stderr, flush=True)

    # ADVICE r4: a fast cold run (relay program-cache hit) must not count as
    # evidence — require BOTH a genuinely slow cold compile (well above the
    # ~3.5 ms dispatch floor and the ~few-s warm-process cost) AND a real
    # ratio, else report inconclusive rather than a false positive.
    cold_s = run1.get("first_call_s", 0.0)
    warm_s = run2.get("first_call_s", 1e9)
    ok = "error" not in run1 and "error" not in run2 and len(entries) > 0
    if ok and cold_s >= 20.0 and warm_s < 0.2 * cold_s:
        supported = True
    elif ok and cold_s < 20.0:
        supported = "inconclusive: cold run too fast to attribute (relay "
        supported += "cache hit?)"
    else:
        supported = False
    out = {
        "cache_dir": cache_dir,
        "run1_cold": run1,
        "run2_warm_dir_fresh_process": run2,
        "cache_entries_after_run1": len(entries),
        "cache_entry_names": entries[:8],
        "persistent_cache_supported": supported,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    if args.cache_dir is None:
        shutil.rmtree(cache_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
