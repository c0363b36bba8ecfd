#!/bin/bash
# Round-3 on-chip experiment queue — run when the axon tunnel is up.
# Each step logs to /tmp/chipq/NN_name.log; steps are serialized (ONE chip).
#
# This edition: measure the material-carried texture metadata change
# (4 fewer per-lane gathers/vertex), capture the 1080p stage table +
# shading sub-stage marginals that direct the next light+disney work,
# and close the VERDICT item-3 gate (animated steady state on chip).
set -u
mkdir -p /tmp/chipq
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

step() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "/tmp/chipq/${name}.log" 2>&1
  echo "--- $name exit=$? tail:"
  tail -5 "/tmp/chipq/${name}.log"
}

# 0. probe (tunnel init can take 60s+ when flaky; retry a few times)
ok=0
for i in 1 2 3; do
  timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
print('TPU OK', float(np.asarray(jnp.sum(jnp.ones((128,128))))))" && { ok=1; break; }
  echo "probe $i failed; retrying in 60s"; sleep 60
done
[ "$ok" = "1" ] || { echo "TUNNEL STILL DOWN"; exit 1; }

# 1. headline bench with the carried-metadata material fetch
step 01_bench python bench.py --spp 4 --width 1920 --height 1080

# 2. fresh 1080p stage table
step 02_profile python tools/profile_e2e.py --width 1920 --height 1080

# 3. shading sub-stage marginal costs (directs the light+disney work)
step 03_shading python tools/profile_shading.py --width 1920 --height 1080

# 4. VERDICT item-3 gate: animated steady state on chip at 256x128
step 04_animated python examples/animated.py --size 256x128 --frames 24
