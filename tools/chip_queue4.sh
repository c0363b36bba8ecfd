#!/bin/bash
# Round-4 on-chip queue #4: NEE crossover continuation (the 16/64-light
# potential compiles blew queue-2's step budget) + any follow-ups.
set -u
mkdir -p /tmp/chipq4
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

step() {
  local name="$1"; shift
  local tmo="$2"; shift 0
  echo "=== $name: $* ==="
  timeout 5400 "$@" > "/tmp/chipq4/${name}.log" 2>&1
  echo "--- $name exit=$? tail:"
  tail -6 "/tmp/chipq4/${name}.log"
}

ok=0
for i in 1 2 3; do
  timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
print('TPU OK', float(np.asarray(jnp.sum(jnp.ones((128,128))))))" && { ok=1; break; }
  echo "probe $i failed; retrying in 60s"; sleep 60
done
[ "$ok" = "1" ] || { echo "TUNNEL STILL DOWN"; exit 1; }

# one count per step so a single slow compile cannot starve the rest
step 50_nee_16 x python tools/bench_nee.py --sweep --width 512 --height 288 --frames 8 --counts 16
step 51_nee_64 x python tools/bench_nee.py --sweep --width 512 --height 288 --frames 8 --counts 64
