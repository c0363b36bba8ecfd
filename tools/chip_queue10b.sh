#!/bin/bash
# Round-5 queue #10 remainder (steps 112-114 never ran — session died).
#  - NEE 16-light crossover: first run of the batched (L,R) potential
#    scoring on chip; round-4 blew three 40-min compile budgets on the
#    unrolled form (VERDICT round-3 item 8).
#  - profile_dynamics + animated: decompose the 6.2 s dirty-skin frames
#    after the 2-blob light upload fix.
set -u
LOGDIR=${LOGDIR:-/tmp/chipq10}
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

step 112_nee16 7200 python tools/bench_nee.py --sweep --counts 16
step 113_profile_dyn 2400 python tools/profile_dynamics.py --size 256x128 --reps 4
step 114_anim 2400 python examples/animated.py --size 256x128 --frames 8 --spp 1
echo "QUEUE10B DONE"
