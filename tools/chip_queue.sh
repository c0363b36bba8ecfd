#!/bin/bash
# Round-4 on-chip experiment queue — run when the axon tunnel is up.
# Each step logs to /tmp/chipq/NN_name.log; steps are serialized (ONE chip).
#
# This edition: (1) validate the still-unvalidated round-3 auto_chunk kernel
# change behind the cheap traversal oracle gate (ADVICE r3 item 5), (2)
# capture the stage table + headline the VERDICT asked for, (3) A/B the
# wide-arity supernode collapse (RFW_WIDE_ARITY=16/32 vs 8) on the
# traversal microbench before promoting a default, (4) the animated
# steady-state gate.
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

# 1. oracle gate: on-chip kernel vs brute force (cheap; guards auto_chunk
#    and any kernel edit that landed tunnel-down before we trust timings)
step 01_oracle python tools/check_traverse.py

# 2. headline bench at the default (auto_chunk active) and pinned-16 A/B
step 02_bench python bench.py --spp 4 --width 1920 --height 1080
RFW_CHUNK_TILES=16 step 03_bench_chunk16 python bench.py --spp 4 --width 1920 --height 1080

# 3. fresh 1080p stage table + shading sub-stage marginals
step 04_profile python tools/profile_e2e.py --width 1920 --height 1080
step 05_shading python tools/profile_shading.py --width 1920 --height 1080

# 4. wide-arity supernode A/B on the traversal microbench (kernel-only),
#    gated by the oracle at each arity before timing
RFW_WIDE_ARITY=16 step 06_oracle_a16 python tools/check_traverse.py
RFW_WIDE_ARITY=16 step 07_trav_a16 python tools/bench_traverse.py
RFW_WIDE_ARITY=32 step 08_oracle_a32 python tools/check_traverse.py
RFW_WIDE_ARITY=32 step 09_trav_a32 python tools/bench_traverse.py
step 10_trav_a8 python tools/bench_traverse.py

# 5. winner end-to-end (edit arity per 06-10 results before running)
RFW_WIDE_ARITY=16 step 11_bench_a16 python bench.py --spp 4 --width 1920 --height 1080

# 6. VERDICT item-4 gate: animated steady state on chip at 256x128
step 12_animated python examples/animated.py --size 256x128 --frames 24
