#!/bin/bash
# Round-4b measurement battery: the evidence still uncommitted after the
# main r4 battery — the HBM-roofline cost analysis, the three kernel
# shootouts (phase Pallas / widened-PLV / coherence, whose BASELINE.md
# tables cited only round-2/3 prose), and a validation bench.py pass that
# exercises the new hang-proof hypereeg subprocess family end-to-end.
# Run AFTER scripts/bench_hypereeg_standalone.py has landed (it warms the
# relay cache for hypereeg's programs).
#
# Usage: bash scripts/tpu_measurement_battery_r4b.sh
cd /root/repo || exit 1
mkdir -p measurements
LOG=measurements/battery_r4.log
note() { echo "[battery4b $(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

probe() {
  timeout 900 python -c "
import jax, numpy as np, jax.numpy as jnp
d = jax.devices()[0]
assert 'tpu' in (d.device_kind + ' ' + d.platform).lower(), d
x = jnp.ones((4,4)) @ jnp.ones((4,4))
assert np.asarray(x)[0,0] == 4.0
print('TPU_UP')
" 2>/dev/null | grep -q TPU_UP
}

wait_tpu() {
  local max_min=${1:-180}
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

# 1. HBM-roofline cost analysis (compile-only; programs relay-cached).
# Stdout goes to a repo path: run_step's commit_artifact runs `git add` on
# its $out, and an outside-repo pathspec (/tmp/...) makes git add abort so
# the battery log silently never gets staged (ADVICE r4).
run_step 2400 measurements/roofline_r4.stdout.log \
  "roofline_r4 (XLA cost analysis 80/320)" \
  python scripts/dump_roofline.py --out measurements/roofline_r4.json
[ -s measurements/roofline_r4.json ] && \
  commit_artifact measurements/roofline_r4.json "roofline_r4 (cost analysis)"

# 2. Kernel shootouts: phase Pallas vs XLA, widened PLV, coherence fusion.
run_step 2400 measurements/bench_pallas_r4.json \
  "bench_pallas_r4 (3 kernel shootouts)" python scripts/bench_pallas.py

# 3. Validation five-family bench.py with the subprocess hypereeg family.
EYEGAZE_BENCH_BUDGET_S=3300 run_step 3600 measurements/bench_full_r4b.json \
  "bench_full_r4b (validation: subprocess hypereeg + auto qchunk ART)" \
  python bench.py

note "BATTERY 4B COMPLETE"
