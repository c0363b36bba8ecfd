#!/bin/bash
# Round-3 on-chip experiment queue — run when the axon tunnel returns.
# Each step logs to /tmp/chipq/NN_name.log; steps are serialized (ONE chip).
set -u
mkdir -p /tmp/chipq
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

step() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "/tmp/chipq/${name}.log" 2>&1
  echo "--- $name exit=$? tail:"
  tail -5 "/tmp/chipq/${name}.log"
}

# 0. probe (tunnel init can take 60s+ when flaky; retry a few times)
ok=0
for i in 1 2 3; do
  timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
print('TPU OK', float(np.asarray(jnp.sum(jnp.ones((128,128))))))" && { ok=1; break; }
  echo "probe $i failed; retrying in 60s"; sleep 60
done
[ "$ok" = "1" ] || { echo "TUNNEL STILL DOWN"; exit 1; }

# 0b. kernel-change gate: interpret mode has passed while the chip
# miscompiled (CLAUDE.md) — the lean any-hit kernel must pass on the real
# backend before any numbers count
step 00_check python tools/check_traverse.py

# 1. headline bench (post gather-elimination commit)
step 01_bench python bench.py --spp 4 --width 1920 --height 1080

# 2. fresh 1080p stage table (ROUND3.md says rerun post-6.74)
step 02_profile python tools/profile_e2e.py --width 1920 --height 1080

# 3. (R,3) lane-tax microbenchmark
step 03_layout python tools/ubench_layout.py

# 4. kernel sweeps: NSTREAM on sorted bounce + occluded populations
RFW_NSTREAM=4 step 04_trav_ns4 python tools/bench_traverse.py \
  --cases sorted --occluded --reps 3
RFW_NSTREAM=8 step 05_trav_ns8 python tools/bench_traverse.py \
  --cases sorted --occluded --reps 3
RFW_NSTREAM=16 step 05b_trav_ns16 python tools/bench_traverse.py \
  --cases sorted --occluded --reps 3
RFW_NSTREAM=32 step 05c_trav_ns32 python tools/bench_traverse.py \
  --cases sorted --occluded --reps 3

# 5. end-to-end A/Bs (sort key, NSTREAM, classic-vs-twophase cross)
RFW_SORT_KEY=morton step 06_bench_morton python bench.py --spp 4 \
  --width 1920 --height 1080
RFW_NSTREAM=8 step 07_bench_ns8 python bench.py --spp 4 \
  --width 1920 --height 1080
RFW_SORT_KEY=morton RFW_NSTREAM=8 step 08_bench_morton_ns8 \
  python bench.py --spp 4 --width 1920 --height 1080
RFW_SORT_KEY=morton RFW_TWO_PHASE=0 step 09_bench_morton_classic \
  python bench.py --spp 4 --width 1920 --height 1080

echo "=== queue complete ==="
