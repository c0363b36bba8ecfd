#!/bin/bash
# Round-4 on-chip queue #3: items-kernel stream-width A/B + animated
# frame decomposition.
#   (1) two-phase items kernel at SSUB_ITEMS=2 (canonical) / 4 / 8 —
#       oracle-gated (test_twophase CPU parity already green at all
#       three widths; the on-chip check is check_traverse + bench_items).
#   (2) animated.py at two sizes and spp=1 vs 2 to split fixed per-frame
#       cost from scaling cost (the 256x128 steady state is ~248 ms vs
#       the <=60 ms round-2 target; need to know what the floor is).
set -u
mkdir -p /tmp/chipq3
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

step() {
  local name="$1"; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "/tmp/chipq3/${name}.log" 2>&1
  echo "--- $name exit=$? tail:"
  tail -6 "/tmp/chipq3/${name}.log"
}

ok=0
for i in 1 2 3; do
  timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
print('TPU OK', float(np.asarray(jnp.sum(jnp.ones((128,128))))))" && { ok=1; break; }
  echo "probe $i failed; retrying in 60s"; sleep 60
done
[ "$ok" = "1" ] || { echo "TUNNEL STILL DOWN"; exit 1; }

# 1. items kernel stream-width A/B (sorted bounce rays, the real workload)
step 30_items_s2 python tools/bench_items.py --fused --breakdown
step 31_items_s4 env RFW_SSUB_ITEMS=4 python tools/bench_items.py --fused --breakdown
step 32_items_s8 env RFW_SSUB_ITEMS=8 python tools/bench_items.py --fused --breakdown

# 2. end-to-end with the combined winners (edit before running if the
#    A/Bs above disagree with the expectation SSUB=8 + SSUB_ITEMS=4)
step 33_bench_combo env RFW_SSUB=8 RFW_SSUB_ITEMS=4 python bench.py --spp 4 --width 1920 --height 1080

# 3. animated frame decomposition: fixed cost vs scaling
step 34_anim_1spp python examples/animated.py --size 256x128 --frames 12 --spp 1
step 35_anim_512 python examples/animated.py --size 512x256 --frames 12 --spp 1

# 4. fewer-streams x wider-tiles: per-iteration cost tracks compiled code
#    size (NSTREAM-unrolled); SSUB widens at CONSTANT code. NSTREAM=2
#    halves phase-1/3 code at the same 4096 rays/program (overlap drops
#    to 2-way, but if code streaming binds, net wins).
step 36_oracle_n2s16 env RFW_NSTREAM=2 RFW_SSUB=16 python tools/check_traverse.py
step 37_trav_n2s16 env RFW_NSTREAM=2 RFW_SSUB=16 python tools/bench_traverse.py --occluded --cases coherent,sorted
step 38_trav_n2s8 env RFW_NSTREAM=2 RFW_SSUB=8 python tools/bench_traverse.py --cases coherent,sorted
step 39_trav_n1s16 env RFW_NSTREAM=1 RFW_SSUB=16 python tools/bench_traverse.py --cases coherent,sorted

# 5. HBM-streamed tier safety at the new SSUB=8 default (4x step buffers;
#    auto_chunk must still fit the 500k-tri resident arrays)
step 40_hbm_s8 python tools/bench_hbm.py

# 6. two-phase any-hit (bounce shadow rays): on-chip verify + A/B vs the
#    classic occlusion at NEE-like finite t limits, then end-to-end
step 41_tp_occl python tools/bench_traverse.py --tp-occluded --cases sorted,coherent
step 42_bench_tpsh python bench.py --spp 4 --width 1920 --height 1080
step 43_bench_notpsh env RFW_TP_SHADOW=0 python bench.py --spp 4 --width 1920 --height 1080
