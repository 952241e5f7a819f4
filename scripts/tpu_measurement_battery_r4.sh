#!/bin/bash
# Round-4 measurement battery: wait for the axon TPU relay, run every
# evidence artifact VERDICT r3 asked for (#2/#4/#5/#7 + rehearsal report),
# and commit each artifact the moment it lands (the relay has died
# mid-session before — partial evidence committed beats full evidence lost).
#
# Usage: bash scripts/tpu_measurement_battery_r4.sh [max_probe_minutes]
cd /root/repo || exit 1
mkdir -p measurements
LOG=measurements/battery_r4.log
: > "$LOG"
note() { echo "[battery $(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

probe() {
  # Affirmative TPU check: axon registration failure silently falls back to
  # CPU and would record CPU timings as TPU artifacts (device_kind check).
  # 900s bound: a fresh python process pays 170-460s for its first host
  # fetch through the remote-compile relay even for a 4x4 matmul (measured
  # 2026-08-19, latency grows under relay load); tighter bounds flagged a
  # live TPU as down and starved the whole battery.
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
  local max_min=${1:-420}
  for i in $(seq 1 "$max_min"); do
    if probe; then note "TPU up (probe $i)"; return 0; fi
    sleep 55
  done
  note "TPU never came up after $max_min probes"
  return 1
}

commit_artifact() {
  # $1 = path, $2 = short description
  git add "$1" "$LOG" 2>/dev/null
  git commit -q -m "measurements: $2

No-Verification-Needed: on-device measurement artifact, no source change" \
    && note "committed $1"
}

run_step() {
  # $1 timeout_s, $2 out_file, $3 description, rest = command
  local t=$1 out=$2 desc=$3; shift 3
  wait_tpu || return 1
  note "START $desc -> $out"
  timeout "$t" "$@" > "$out" 2> "/tmp/$(basename "$out").err"
  local rc=$?
  note "DONE  $desc rc=$rc ($(wc -c < "$out" 2>/dev/null) bytes)"
  if [ -s "$out" ]; then commit_artifact "$out" "$desc (rc=$rc)"; fi
  return $rc
}

wait_tpu "${1:-420}" || exit 1

# 1. Headline: all five families in one bench.py run (VERDICT #1/#4).
EYEGAZE_BENCH_BUDGET_S=3300 run_step 3600 measurements/bench_full_r4.json \
  "bench_full_r4 (five-family bench.py)" python bench.py

# 2. ART batch x q-chunk sweep (VERDICT #5) — 13 XLA programs; the relay
#    compile queue has been seen at ~7 min/program under load.
run_step 5400 measurements/art_batch_sweep_r4.json \
  "art_batch_sweep_r4 (batch x qchunk shootout)" \
  python scripts/bench_art_batch.py --batches 16,32,64 --chunks 0,128,256

# 3. Serving storm: serialized vs dynamic batching (VERDICT #7).
run_step 1800 measurements/bench_serving_r4.json \
  "bench_serving_r4 (request-storm p50/p99)" \
  python scripts/bench_serving.py

# 4/5. Per-component profile at both batch sizes (VERDICT #2).
run_step 3000 measurements/profile_components_16.json \
  "profile_components_16" python scripts/profile_components.py --trials 16
run_step 3000 measurements/profile_components_64.json \
  "profile_components_64" python scripts/profile_components.py --trials 64

# 6. ViT batch sweep (VERDICT #2).
run_step 3000 measurements/vit_batch_sweep.json \
  "vit_batch_sweep (ViT-B batch 32/64/128)" \
  python scripts/bench_vit_batch.py --batches 32,64,128

# 7. Full-scale rehearsal; preserve its report as a BENCH-grade artifact
#    (VERDICT weak #5). runs/ is disposable — clear before re-driving.
wait_tpu || exit 1
rm -rf runs/rehearsal_r4
note "START rehearsal_full_scale"
timeout 7200 python scripts/rehearsal_full_scale.py --root runs/rehearsal_r4 \
  > /tmp/rehearsal_r4.out 2>&1
rc=$?
note "DONE  rehearsal rc=$rc"
if [ -f runs/rehearsal_r4/rehearsal_report.json ]; then
  cp runs/rehearsal_r4/rehearsal_report.json measurements/rehearsal_report_r4.json
  commit_artifact measurements/rehearsal_report_r4.json "rehearsal_report_r4 (rc=$rc)"
fi

note "BATTERY COMPLETE"
