#!/bin/bash
# Round-4 on-chip queue #8: decision benches first (they pick the
# shipped defaults), then the VERDICT measurement items, then NEE.
# Context (queue 6, same session):
#   - classic-kernel shape grid: n2s16 beats/ties n4s8 and n4s16
#     everywhere (24.83 coh closest / 41.2 coh occluded / 4.49 sorted
#     closest / 10.54 sorted occluded) at HALF the unrolled code.
#   - two-phase items stack (214-220 ms) LOSES to classic SSUB=8
#     (170 ms) on 0.52M sorted bounce rays; e2e flip measured here.
set -u
LOGDIR=${LOGDIR:-/tmp/chipq8}
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

# 1. e2e decision benches (anchor this session: 8.86 with all defaults)
step 90_bench_tp0 2400 env RFW_TWO_PHASE=0 python bench.py --spp 4 --width 1920 --height 1080
step 91_bench_shape 2400 env RFW_NSTREAM=2 RFW_SSUB=16 python bench.py --spp 4 --width 1920 --height 1080
step 92_bench_combo 2400 env RFW_TWO_PHASE=0 RFW_TP_SHADOW=0 RFW_NSTREAM=2 RFW_SSUB=16 python bench.py --spp 4 --width 1920 --height 1080

# 2. animated steady state (round-2 target <= 60 ms/frame at 256x128)
step 93_anim_256 2400 python examples/animated.py --size 256x128 --frames 12 --spp 1

# 3. device instance-motion WIN regime: 128 instances, device vs host
step 94_phys_dev128 2400 env RFW_DEVICE_MOTION=1 python examples/physics.py --size 256x128 --spp 1 --frames 16 --balls 128
step 95_phys_host128 2400 env RFW_DEVICE_MOTION=0 python examples/physics.py --size 256x128 --spp 1 --frames 16 --balls 128

# 4. HBM-streamed tier safety at current defaults
step 96_hbm 2400 python tools/bench_hbm.py

# 5. NEE crossover continuation (compiles grow with L; long budgets)
step 97_nee_16 5400 python tools/bench_nee.py --sweep --frames 8 --counts 16
step 98_nee_64 5400 python tools/bench_nee.py --sweep --frames 8 --counts 64
echo "QUEUE8 DONE"
