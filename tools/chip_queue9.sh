#!/bin/bash
# Round-4 on-chip queue #9: final session slack, ordered by value.
#  - bench_hbm: safety gate for the auto-selected pallas_hbm tier at the
#    SSUB=8 default shape (the tier last ran on-chip at SSUB=2).
#  - tp_shadow marginal: queue-6 step 66 crashed on the SMEM sinst bug
#    before recording it; two-phase closest stays ON (8.86 vs 8.43), the
#    shadow half is the one default still unmeasured.
#  - deep-ladder A/B (VERDICT 7 measurement): cornell, 4 bounces,
#    honest clock, sub-floor rungs on vs off.
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
  tail -8 "$LOGDIR/${name}.log"
}

step 100_hbm 1800 python tools/bench_hbm.py
step 101_bench_notpsh 1800 env RFW_TP_SHADOW=0 python bench.py --spp 4 --width 1920 --height 1080
step 102_ladder_on 1800 python examples/cornell.py --size 512 --spp 4 --bounces 4 --honest --out /tmp/lad_on.png
step 103_ladder_off 1800 env RFW_DEEP_LADDER=0 python examples/cornell.py --size 512 --spp 4 --bounces 4 --honest --out /tmp/lad_off.png
echo "QUEUE9 DONE"
