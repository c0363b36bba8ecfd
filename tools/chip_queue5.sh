#!/bin/bash
# Round-4 on-chip queue #5: consolidated re-run of the queue-3/4 steps
# whose logs were lost before recording (items width A/B, classic-kernel
# stream-shape A/Bs, two-phase-shadow bench A/B, animated decomposition,
# NEE 16/64 crossover, HBM safety at the SSUB=8 default).
set -u
LOGDIR=${LOGDIR:-/tmp/chipq5}
mkdir -p "$LOGDIR"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

step() {
  local name="$1"; shift
  local tmo="$1"; shift
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" > "$LOGDIR/${name}.log" 2>&1
  echo "--- $name exit=$? tail:"
  tail -8 "$LOGDIR/${name}.log"
}

ok=0
for i in 1 2 3; do
  timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
print('TPU OK', float(np.asarray(jnp.sum(jnp.ones((128,128))))))" && { ok=1; break; }
  echo "probe $i failed; retrying in 60s"; sleep 60
done
[ "$ok" = "1" ] || { echo "TUNNEL STILL DOWN"; exit 1; }

# 0. session anchor: default bench (SSUB=8, TP shadow on)
step 50_bench_anchor 2400 python bench.py --spp 4 --width 1920 --height 1080

# 1. items kernel stream-width A/B (sorted bounce rays, the real workload)
step 51_items_s2 2400 python tools/bench_items.py --fused --breakdown
step 52_items_s4 2400 env RFW_SSUB_ITEMS=4 python tools/bench_items.py --fused --breakdown
step 53_items_s8 2400 env RFW_SSUB_ITEMS=8 python tools/bench_items.py --fused --breakdown

# 2. fewer-streams x wider-tiles: per-iteration cost tracks compiled code
#    size (NSTREAM-unrolled); SSUB widens at CONSTANT code. NSTREAM=2
#    halves phase-1/3 code at the same or 2x rays/program.
step 54_oracle_n2s16 1200 env RFW_NSTREAM=2 RFW_SSUB=16 python tools/check_traverse.py
step 55_trav_n2s16 2400 env RFW_NSTREAM=2 RFW_SSUB=16 python tools/bench_traverse.py --occluded --cases coherent,sorted
step 56_trav_n2s8 2400 env RFW_NSTREAM=2 RFW_SSUB=8 python tools/bench_traverse.py --cases coherent,sorted
step 57_trav_n4s16 2400 env RFW_NSTREAM=4 RFW_SSUB=16 python tools/bench_traverse.py --cases coherent,sorted

# 3. two-phase bounce shadow A/B: default-on already anchored in step 50
step 58_bench_notpsh 2400 env RFW_TP_SHADOW=0 python bench.py --spp 4 --width 1920 --height 1080

# 4. animated frame decomposition: fixed cost vs scaling
step 59_anim_256 2400 python examples/animated.py --size 256x128 --frames 12 --spp 1
step 60_anim_512 2400 python examples/animated.py --size 512x256 --frames 12 --spp 1

# 5. HBM-streamed tier safety at the new SSUB=8 default
step 61_hbm_s8 2400 python tools/bench_hbm.py

# 6. NEE crossover continuation (compiles grow with L; generous budget)
step 62_nee_16 5400 python tools/bench_nee.py --sweep --frames 8 --counts 16
step 63_nee_64 5400 python tools/bench_nee.py --sweep --frames 8 --counts 64
echo "QUEUE5 DONE"
