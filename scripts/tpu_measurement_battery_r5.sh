#!/bin/bash
# Round-5 measurement battery.  Strategy change vs r3/r4: the persistent XLA
# compilation cache is CONFIRMED working on the axon relay
# (measurements/compile_cache_probe.json: cold 772 s -> warm 0.44 s), and
# eyegaze_tpu/__init__.py now wires <repo>/.jax_cache into every process.
# So this battery (a) measures everything VERDICT r4 asked for, and (b) as a
# side effect warms the cache with the EXACT programs the driver's final
# `python bench.py` pass compiles — closing the three-round-old gap where
# BENCH_r*.json never held more than the EEG family.
#
# Order: hypereeg standalone FIRST (the one family whose cold train compile
# measured >35 min — warm it before bench.py's 900 s-deadline subprocess can
# hit it), then the full bench at a generous budget (warms every program),
# then a default-budget bench (validates the driver pass fits 1680 s warm),
# then the evidence batteries (roofline, kernel shootouts, headpack,
# serving, low-batch sweep, extractor rate).
#
# Usage: bash scripts/tpu_measurement_battery_r5.sh
cd /root/repo || exit 1
mkdir -p measurements
LOG=measurements/battery_r5.log
note() { echo "[battery5 $(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

probe() {
  timeout 900 python -c "
import eyegaze_tpu, jax, numpy as np, jax.numpy as jnp
d = jax.devices()[0]
assert 'tpu' in (d.device_kind + ' ' + d.platform).lower(), d
x = jnp.ones((4,4)) @ jnp.ones((4,4))
assert np.asarray(x)[0,0] == 4.0
print('TPU_UP')
" 2>/dev/null | grep -q TPU_UP
}

wait_tpu() {
  local max_min=${1:-120}
  for i in $(seq 1 "$max_min"); do
    if probe; then note "TPU up (probe $i)"; return 0; fi
    sleep 55
  done
  note "TPU never came up after $max_min probes"
  return 1
}

commit_artifact() {
  git add "$1" "$LOG" 2>/dev/null
  git commit -q -m "measurements: $2

No-Verification-Needed: on-device measurement artifact, no source change" \
    && note "committed $1"
}

run_step() {
  local t=$1 out=$2 desc=$3; shift 3
  wait_tpu || return 1
  note "START $desc -> $out"
  timeout "$t" "$@" > "$out" 2> "/tmp/$(basename "$out").err"
  local rc=$?
  note "DONE  $desc rc=$rc ($(wc -c < "$out" 2>/dev/null) bytes)"
  if [ -s "$out" ]; then commit_artifact "$out" "$desc (rc=$rc)"; fi
  return $rc
}

# 1. HyperEEG standalone (infer + TRAIN — VERDICT r4 Missing #2): cold train
#    compile measured >35 min; 7200 s bound covers a loaded relay, and the
#    programs land in .jax_cache for every later pass.  The script writes
#    --out incrementally, so even a timeout keeps the infer numbers.
run_step 7200 measurements/bench_hypereeg_r5.stdout.log \
  "bench_hypereeg_r5 (standalone incl. train)" \
  python scripts/bench_hypereeg_standalone.py \
    --out measurements/bench_hypereeg_r5.json
[ -s measurements/bench_hypereeg_r5.json ] && \
  commit_artifact measurements/bench_hypereeg_r5.json "bench_hypereeg_r5"

# 2. Full five-family bench, generous budget: measures AND warms the exact
#    driver-pass programs.
EYEGAZE_BENCH_BUDGET_S=10000 EYEGAZE_BENCH_HYPEREEG_TIMEOUT_S=2400 \
  run_step 10800 measurements/bench_full_r5.json \
  "bench_full_r5 (five families, cache-warming pass)" python bench.py

# 3. Default-budget bench on the warmed cache: the driver-pass rehearsal.
#    Success criterion: all five families present, no *_skipped.
run_step 1900 measurements/bench_full_r5_warm.json \
  "bench_full_r5_warm (driver-budget rehearsal on warm cache)" \
  python bench.py

# 4. HBM-roofline cost analysis (VERDICT r4 Missing #1 / Weak #2).
run_step 2400 measurements/roofline_r5.stdout.log \
  "roofline_r5 (XLA cost analysis 80/320)" \
  python scripts/dump_roofline.py --out measurements/roofline_r5.json
[ -s measurements/roofline_r5.json ] && \
  commit_artifact measurements/roofline_r5.json "roofline_r5 (cost analysis)"

# 5. Kernel shootouts: phase Pallas vs XLA, widened PLV, coherence fusion —
#    the committed evidence behind BASELINE.md's three shootout tables.
run_step 2400 measurements/bench_pallas_r5.json \
  "bench_pallas_r5 (3 kernel shootouts)" python scripts/bench_pallas.py

# 6. Head-packed attention shootout at ART's shape (VERDICT r4 Weak #3).
run_step 3600 measurements/headpack_attn_r5.json \
  "headpack_attn_r5 (kernel + full-model ART)" \
  python scripts/bench_headpack.py

# 7. Serving storm with per-phase p99 attribution (VERDICT r4 Weak #4).
run_step 3600 measurements/bench_serving_r5.json \
  "bench_serving_r5 (storm + phase breakdown)" python scripts/bench_serving.py

# 8. Low-batch q-chunk sweep (ADVICE r4: the extrapolated gate interior).
run_step 2400 measurements/art_low_batch_r5.json \
  "art_low_batch_r5 (B=1,4 x chunk 0,128 infer)" \
  python scripts/bench_art_batch.py --low-batch

# 9. Batched offline feature extraction rate (VERDICT r4 Weak #5): 64 trials
#    at chunk=8 vs chunk=1 comparison points.
run_step 3600 measurements/extract_rate_r5.json \
  "extract_rate_r5 (vmapped trial chunks)" \
  python scripts/bench_extract_rate.py

note "BATTERY 5 COMPLETE"
