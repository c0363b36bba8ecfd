#!/bin/bash
# Round-4 on-chip queue #2 — follow-ups to the SSUB/arity A/Bs:
#   (1) any-hit (occluded) A/B for the RFW_SSUB winner (queue #1 only
#       timed closest: SSUB=8 won sorted 4.43 vs 3.00, coherent ~tied),
#   (2) end-to-end bench at SSUB=8 (queue #1 step 11 ran SSUB=4),
#   (3) two-phase items kernel baseline (SSUB-pinned to 8-tiles — the
#       number tells us whether propagating SSUB there is worth it),
#   (4) NEE potential-vs-power crossover sweep (VERDICT item 8),
#   (5) physics steady state (device instance-motion path, zero host
#       TLAS repack — VERDICT item 6 measurement).
set -u
mkdir -p /tmp/chipq2
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

step() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "/tmp/chipq2/${name}.log" 2>&1
  echo "--- $name exit=$? tail:"
  tail -5 "/tmp/chipq2/${name}.log"
}

ok=0
for i in 1 2 3; do
  timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
print('TPU OK', float(np.asarray(jnp.sum(jnp.ones((128,128))))))" && { ok=1; break; }
  echo "probe $i failed; retrying in 60s"; sleep 60
done
[ "$ok" = "1" ] || { echo "TUNNEL STILL DOWN"; exit 1; }

# 1. any-hit A/B: default stream width vs SSUB=8
step 20_occl_def python tools/bench_traverse.py --occluded --cases coherent,sorted
step 21_occl_s8 env RFW_SSUB=8 python tools/bench_traverse.py --occluded --cases coherent,sorted

# 2. end-to-end at the kernel A/B winner
step 22_bench_s8 env RFW_SSUB=8 python bench.py --spp 4 --width 1920 --height 1080

# 3. two-phase items kernel baseline (bounce-ray path)
step 23_items python tools/bench_items.py

# 4. NEE crossover sweep (VERDICT item 8)
step 24_nee_sweep python tools/bench_nee.py --sweep --width 512 --height 288 --frames 8 --counts 4,16,32,64

# 5. physics steady state on the device-motion path
step 25_physics python examples/physics.py --frames 24 --size 256x128 --spp 1
step 26_physics_hostpath env RFW_DEVICE_MOTION=0 python examples/physics.py --frames 24 --size 256x128 --spp 1

# 6. gather cost curve: table size x dtype x index locality (prices the
#    atlas-pool size effect and the bf16-tables VERDICT item)
step 27_gather_sweep python tools/ubench_gather.py --sweep-size --rays 2073600
