#!/bin/bash
# Round-3 on-chip experiment queue — run when the axon tunnel returns.
# Each step logs to /tmp/chipq/NN_name.log; steps are serialized (ONE chip).
#
# This edition: validate the VMEM-adaptive grid-step batch (auto_chunk —
# pica gets 64-tile steps vs the old fixed 16, cutting the ~650us/step
# fixed cost 4x on trace + occluded), then capture the shading sub-stage
# table that directs the next light+disney work.
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

# 0b. kernel-change gate: batch sizes changed (auto_chunk) — the kernels
# must agree with the oracle on the REAL backend before any numbers count
step 00_check python tools/check_traverse.py

# 1. headline bench, auto chunk (expect > 7.60 from the step-count cut)
step 01_bench_auto python bench.py --spp 4 --width 1920 --height 1080

# 2. pinned-chunk controls: the old default + ladder shape
RFW_CHUNK_TILES=16 step 02_bench_c16 python bench.py --spp 4 \
  --width 1920 --height 1080
RFW_CHUNK_TILES=32 step 03_bench_c32 python bench.py --spp 4 \
  --width 1920 --height 1080

# 3. fresh 1080p stage table under auto chunk
step 04_profile python tools/profile_e2e.py --width 1920 --height 1080

# 4. shading sub-stage marginal costs (directs the light+disney work)
step 05_shading python tools/profile_shading.py --width 1920 --height 1080

# 5. bf16 elementwise throughput probe (go/no-go for bf16 shading math)
step 06_layout python tools/ubench_layout.py

echo "=== queue complete ==="
