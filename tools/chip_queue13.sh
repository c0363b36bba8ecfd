#!/bin/bash
# Round-5 queue #13: dense items tier A/Bs (the round's kernel change),
# then the refreshed stage decomposition (queue-12 plan), then the
# leftover queue-11 measurements. Ordered by value-per-compile so a
# flaky tunnel still yields the dense story first.
set -u
LOGDIR=${LOGDIR:-/tmp/chipq13}
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

step 139_probe 180 python -c "import jax, jax.numpy as jnp, numpy as np; print('probe', np.asarray(jnp.sum(jnp.arange(1024.0))))"
# anchor pins the PRE-change program (dense off == round-4 HLO, warm cache)
step 140_bench_anchor 2400 env RFW_DENSE_ITEMS=0 python bench.py --spp 4
step 141_items_dense 3600 env RFW_DENSE_ITEMS=1 python tools/bench_items.py --fused --skip-main
step 142_items_walk 2400 env RFW_DENSE_ITEMS=0 python tools/bench_items.py --fused --skip-main
step 143_e2e_dense 3600 env RFW_DENSE_ITEMS=1 python bench.py --spp 4
step 144_e2e_dense8k 3600 env RFW_DENSE_ITEMS=1 RFW_DENSE_MAX_TRIS=8192 python bench.py --spp 4
# round-4 turned tp_shadow OFF because classic any-hit beat the items
# stack; the dense tier changes the items stack's cost — re-flip A/B
step 144b_e2e_dense_tpsh 3600 env RFW_DENSE_ITEMS=1 RFW_TP_SHADOW=1 python bench.py --spp 4
step 145_profile 3600 python tools/profile_e2e.py --width 1920 --height 1080 --reps 2
step 146_bisect 6000 python tools/bisect_e2e.py --reps 3
step 147_ladder_on 2400 python examples/cornell.py --size 512 --spp 4 --bounces 4 --honest --out /tmp/lad_on.png
step 148_ladder_off 2400 env RFW_DEEP_LADDER=0 python examples/cornell.py --size 512 --spp 4 --bounces 4 --honest --out /tmp/lad_off.png
step 149_anim 2400 python examples/animated.py --size 256x128 --frames 10 --spp 1
echo "QUEUE13 DONE"
