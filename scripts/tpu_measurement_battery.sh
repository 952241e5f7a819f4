#!/bin/bash
# Wait for the axon TPU relay, then run the measurement battery and drop the
# artifacts into the repo (driver commits uncommitted work at round end).
cd /root/repo
probe() {
  # Assert the default device really is the TPU: if the axon plugin fails to
  # register (or PALLAS_AXON_POOL_IPS is unset) jax silently falls back to
  # CPU, the matmul still succeeds, and the battery would record CPU timings
  # as TPU artifacts.  device_kind is 'TPU v5 lite' on the relay chip.
  timeout 120 python -c "
import jax, numpy as np, jax.numpy as jnp
d = jax.devices()[0]
assert 'tpu' in (d.device_kind + ' ' + d.platform).lower(), d
x = jnp.ones((4,4)) @ jnp.ones((4,4))
assert np.asarray(x)[0,0] == 4.0
print('TPU_UP')
" 2>/dev/null | grep -q TPU_UP
}
echo "[battery] waiting for TPU relay..."
for i in $(seq 1 400); do
  if probe; then echo "[battery] TPU up after $i probes"; break; fi
  sleep 60
done
probe || { echo "[battery] TPU never came back"; exit 1; }

mkdir -p measurements
echo "[battery] 1/5 flash-attention shootout"
timeout 2400 python scripts/bench_flash_attn.py --sweep-blocks > measurements/flash_attn_r3.json 2>/tmp/flash_r3.err
echo "[battery] flash rc=$?"
echo "[battery] 2/5 component profile 16 trials"
timeout 3000 python scripts/profile_components.py --trials 16 > measurements/profile_components_16.json 2>/tmp/prof_r3_16.err
echo "[battery] prof16 rc=$?"
echo "[battery] 3/5 component profile 64 trials"
timeout 3000 python scripts/profile_components.py --trials 64 > measurements/profile_components_64.json 2>/tmp/prof_r3_64.err
echo "[battery] prof64 rc=$?"
echo "[battery] 4/5 ViT batch sweep"
timeout 3000 python scripts/bench_vit_batch.py --batches 32,64,128 > measurements/vit_batch_sweep.json 2>/tmp/vit_sweep.err
echo "[battery] vitsweep rc=$?"
echo "[battery] 5/5 bench.py"
timeout 3600 python bench.py > measurements/bench_full_r3.json 2>/tmp/bench_r3.err
echo "[battery] bench rc=$?"
echo "[battery] DONE"
