#!/bin/bash
# Round-4 on-chip queue #9: session endgame, ordered by value.
#  - tp_shadow marginal: the one default still unmeasured (queue-6 step
#    66 crashed on the SMEM sinst bug before recording it).
#  - profile_dynamics: decomposes the animated demo's 6.2 s dirty-skin
#    frames (CPU repro showed NO retraces and ~zero device-compute
#    delta, so the gap is tunnel dispatch/transfer — this measures
#    lights per-field vs 2-blob upload, dirty sync+exec, quiescent vs
#    dirty full frames on the real tunnel; scene mirrors animated.py so
#    step-93's compile cache hits).
#  - animated re-run: direct before/after of the upload_lights fix
#    against step 93's 6.1-7.0 s dirty frames.
#  - deep-ladder A/B (VERDICT 7 measurement): cornell 4 bounces, honest
#    clock, sub-floor rungs on vs off.
# NEE 16/64 crossover is dropped for the session: three queue attempts
# hit compile budgets (the potential path unrolls L scoring rows; the
# 16-light compile alone exceeded a 40-min step). Recorded in ROUND4.md.
set -u
LOGDIR=${LOGDIR:-/tmp/chipq9}
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
  tail -10 "$LOGDIR/${name}.log"
}

step 101_bench_notpsh 2400 env RFW_TP_SHADOW=0 python bench.py --spp 4 --width 1920 --height 1080
step 104_profile_dyn 2400 python tools/profile_dynamics.py --size 256x128 --reps 4
step 105_anim_after 2400 python examples/animated.py --size 256x128 --frames 8 --spp 1
step 102_ladder_on 1800 python examples/cornell.py --size 512 --spp 4 --bounces 4 --honest --out /tmp/lad_on.png
step 103_ladder_off 1800 env RFW_DEEP_LADDER=0 python examples/cornell.py --size 512 --spp 4 --bounces 4 --honest --out /tmp/lad_off.png
echo "QUEUE9 DONE"
