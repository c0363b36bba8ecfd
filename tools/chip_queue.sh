#!/bin/bash
# Round-4 on-chip experiment queue — run when the axon tunnel is up.
# Each step logs to /tmp/chipq/NN_name.log; steps are serialized (ONE chip).
#
# This edition (oracle gate 01 already PASSED on chip — auto_chunk + the
# deprecation fixes are validated): (1) headline bench + stage table the
# VERDICT asked for, (2) A/B the two kernel-ceiling levers — supernode
# arity (RFW_WIDE_ARITY=16 repack) and stream width (RFW_SSUB=4/8: more
# ray sublanes per walk, constant phase-1/3 instruction count) — each
# gated by the traversal oracle before timing, (3) the animated
# steady-state gate (round-2 target <=60ms/frame at 256x128).
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

# 1. headline bench at the default and the kernel-only baseline to beat
step 02_bench python bench.py --spp 4 --width 1920 --height 1080
step 10_trav_a8 python tools/bench_traverse.py

# 2. stream-width A/B (RFW_SSUB): oracle gate, then kernel-only timing.
#    Sim says 1024-ray streams need 2.34x fewer program-iterations on
#    bounce rays; phases 1/3 are constant-instruction in SSUB.
step 13_oracle_s4 env RFW_SSUB=4 python tools/check_traverse.py
step 14_trav_s4 env RFW_SSUB=4 python tools/bench_traverse.py
step 15_oracle_s8 env RFW_SSUB=8 python tools/check_traverse.py
step 16_trav_s8 env RFW_SSUB=8 python tools/bench_traverse.py

# 3. wide-arity supernode A/B (kernel-only), oracle-gated per arity
step 06_oracle_a16 env RFW_WIDE_ARITY=16 python tools/check_traverse.py
step 07_trav_a16 env RFW_WIDE_ARITY=16 python tools/bench_traverse.py

# 4. cross: wide arity x stream width (the two levers are orthogonal:
#    fewer dependent fetches per ray x more rays per fetch)
step 17_trav_a16s4 env RFW_WIDE_ARITY=16 RFW_SSUB=4 python tools/bench_traverse.py

# 5. fresh 1080p stage table + shading sub-stage marginals
step 04_profile python tools/profile_e2e.py --width 1920 --height 1080
step 05_shading python tools/profile_shading.py --width 1920 --height 1080

# 6. winner end-to-end (edit knobs per A/B results before running)
step 11_bench_best env RFW_SSUB=4 python bench.py --spp 4 --width 1920 --height 1080

# 7. VERDICT item-4 gate: animated steady state on chip at 256x128
step 12_animated python examples/animated.py --size 256x128 --frames 24
