#!/bin/bash
# Round-5 on-chip queue #10, ordered by value.
#  - bench anchor: fresh session + the batched-potential wavefront change
#    invalidates the render_sample cache entry; this is the round-5
#    same-session reference for every later A/B.
#  - split-shape A/B: NSTREAM_ITEMS decoupling landed at the end of round
#    4 but the classic-n2s16 + items-n4 combination was never measured
#    (round-4 queue 8 predicted ~+2% e2e on top of the two-phase default).
#  - NEE 16-light crossover: the batched (L,R) potential scoring now
#    compiles flat in L — the measurement that blew three round-4 compile
#    budgets should finally run (VERDICT round-3 item 8).
#  - profile_dynamics + animated: decompose the 6.2 s dirty-skin frames
#    (queue-9 never completed these steps before the round ended).
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

step 110_bench_anchor 3600 python bench.py --spp 4 --width 1920 --height 1080
step 111_bench_n2s16 3600 env RFW_NSTREAM=2 RFW_SSUB=16 python bench.py --spp 4 --width 1920 --height 1080
step 112_nee16 3600 python tools/bench_nee.py --sweep --counts 16
step 113_profile_dyn 2400 python tools/profile_dynamics.py --size 256x128 --reps 4
step 114_anim 2400 python examples/animated.py --size 256x128 --frames 8 --spp 1
echo "QUEUE10 DONE"
