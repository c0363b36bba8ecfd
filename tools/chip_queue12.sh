#!/bin/bash
# Round-5 queue #12: refresh the stage decomposition at the CURRENT
# defaults (the round-4 stage table predates the SSUB=8 flip) and close
# the ~185 ms of previously-unaccounted per-sample glue with exact
# config-bisection deltas (bounce block, sobol marginal).
set -u
LOGDIR=${LOGDIR:-/tmp/chipq12}
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
  tail -12 "$LOGDIR/${name}.log"
}

step 130_bench 2400 python bench.py --spp 4
step 131_profile 3600 python tools/profile_e2e.py --width 1920 --height 1080 --reps 2
step 132_bisect 6000 python tools/bisect_e2e.py --reps 3
echo "QUEUE12 DONE"
