#!/bin/bash
# Round-5 queue #15 (final): stage decomposition at the shipped defaults
# + the queue-11 leftovers + the round-close bench.
set -u
LOGDIR=${LOGDIR:-/tmp/chipq15}
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
  tail -6 "$LOGDIR/${name}.log"
}

step 160_probe 180 python -c "import jax, jax.numpy as jnp, numpy as np; print('probe', np.asarray(jnp.sum(jnp.arange(1024.0))))"
step 161_bench_final 2400 python bench.py --spp 4
step 162_profile 3000 python tools/profile_e2e.py --width 1920 --height 1080 --reps 2
step 163_ladder_on 2400 python examples/cornell.py --size 512 --spp 4 --bounces 4 --honest --out /tmp/lad_on.png
step 164_ladder_off 2400 env RFW_DEEP_LADDER=0 python examples/cornell.py --size 512 --spp 4 --bounces 4 --honest --out /tmp/lad_off.png
step 165_anim 2400 python examples/animated.py --size 256x128 --frames 10 --spp 1
step 166_bisect 4800 python tools/bisect_e2e.py --reps 3 --configs anchor,b0
echo "QUEUE15 DONE"
