#!/bin/bash
# Round-5 queue #11: the two measurements still open after queue 10.
#  - animated.py re-run: direct before/after of the 2-blob upload_lights
#    fix against round-4 step 93's 6.1-7.0 s dirty-skin frames
#    (profile_dynamics already bounds the fixed frame at ~200 ms; this
#    is the demo-loop confirmation). Queue-10's attempt spent its budget
#    on the 345 s cold compile; the cache is warm now.
#  - deep-ladder A/B (VERDICT r3 item 7 measurement): cornell 4 bounces,
#    honest clock, sub-18.75% prefix rungs on (default) vs off.
set -u
LOGDIR=${LOGDIR:-/tmp/chipq11}
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

step 120_anim 3600 python examples/animated.py --size 256x128 --frames 10 --spp 1
step 121_ladder_on 2400 python examples/cornell.py --size 512 --spp 4 --bounces 4 --honest --out /tmp/lad_on.png
step 122_ladder_off 2400 env RFW_DEEP_LADDER=0 python examples/cornell.py --size 512 --spp 4 --bounces 4 --honest --out /tmp/lad_off.png
echo "QUEUE11 DONE"
