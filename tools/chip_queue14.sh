#!/bin/bash
# Round-5 queue #14: dense-tier v2 (foreign-run gating) decision benches.
# v1 results (queue 13): anchor 9.22, dense@4096 9.07, dense@8192 9.18,
# items tool dense 2.26 vs walk 2.44 — the dual-kernel tax was foreign
# runs paying full init/set_obj in both kernels. v2 gates that out; the
# walk path's HLO changed too, so it gets its own re-anchor.
set -u
LOGDIR=${LOGDIR:-/tmp/chipq14}
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

step 150_probe 180 python -c "import jax, jax.numpy as jnp, numpy as np; print('probe', np.asarray(jnp.sum(jnp.arange(1024.0))))"
step 151_items_v2 2400 env RFW_DENSE_ITEMS=1 python tools/bench_items.py --fused --skip-main
step 152_e2e_v2_8k 3600 env RFW_DENSE_ITEMS=1 RFW_DENSE_MAX_TRIS=8192 python bench.py --spp 4
step 153_e2e_v2_4k 3600 env RFW_DENSE_ITEMS=1 python bench.py --spp 4
step 154_e2e_v2_walk 3600 env RFW_DENSE_ITEMS=0 python bench.py --spp 4
echo "QUEUE14 DONE"
