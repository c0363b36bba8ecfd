"""Stage-by-stage timing of the FUSED two-phase pipeline on chip.

Times each internal stage of ops.traverse_items.twophase_closest_fused in
isolation (dense/pallas phase A, compact, pack-sort, slot gather, phase-B
kernel, merge) so optimization targets the measured bottleneck, not the
projected one. Honest scalar-reduce timing throughout (CLAUDE.md).

Usage: python tools/bench_fused_stages.py [--width 1920 --height 1080
                                           --K 8 --items-per-ray 1.5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--K", type=int, default=8)
    ap.add_argument("--items-per-ray", type=float, default=1.5)
    ap.add_argument("--case", default="sorted",
                    choices=["coherent", "sorted", "unsorted"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from rfw_tpu.accel.lbvh import morton_codes
    from rfw_tpu.ops.traverse import (
        CHUNK_TILES, LANE, LANES, NSTREAM, SUB,
        pallas_closest_hit, prepare_pallas_scene,
    )
    from rfw_tpu.ops.traverse_items import (
        STILE, _compact_entries, _pack_compact, _run_items_arrays,
    )
    from rfw_tpu.render.twophase import dense_tlas_entries
    from rfw_tpu.render.wavefront import _block_swizzle, camera_rays

    W, H = args.width, args.height
    R, K = W * H, args.K
    sdev, dmats, atlas, dlights, view = build_scene(W, H)
    ps = jax.jit(prepare_pallas_scene)(sdev)
    jax.block_until_ready(ps.tri_t)

    key = jax.random.PRNGKey(3)
    px, py, _ = _block_swizzle(W, H, 1024)
    o_coh, d_coh = camera_rays(view, W, H, key, (px, py))
    hit0 = pallas_closest_hit(ps, o_coh, d_coh)
    pos = o_coh + jnp.where(hit0.prim >= 0, hit0.t, 1.0)[:, None] * d_coh
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, (R,)) * 2 - 1
    phi = jax.random.uniform(k2, (R,)) * 2 * np.pi
    s = jnp.sqrt(jnp.maximum(1 - z * z, 0.0))
    d_inc = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=1)
    o_inc = pos + d_inc * 1e-3
    if args.case == "coherent":
        o, d = o_coh, d_coh
    elif args.case == "unsorted":
        o, d = o_inc, d_inc
    else:
        mn, mx = sdev.tlas_min[0], sdev.tlas_max[0]
        octant = ((d_inc[:, 0] >= 0).astype(jnp.int32)
                  + 2 * (d_inc[:, 1] >= 0).astype(jnp.int32)
                  + 4 * (d_inc[:, 2] >= 0).astype(jnp.int32))
        cell = morton_codes(o_inc, mn, mx).astype(jnp.int32)
        skey = octant * (1 << 27) + (cell >> 5)
        (_, sox, soy, soz, sdx, sdy, sdz) = jax.lax.sort(
            (skey, o_inc[:, 0], o_inc[:, 1], o_inc[:, 2],
             d_inc[:, 0], d_inc[:, 1], d_inc[:, 2]), num_keys=1)
        o = jnp.stack([sox, soy, soz], axis=1)
        d = jnp.stack([sdx, sdy, sdz], axis=1)
    o = jax.block_until_ready(jnp.asarray(o))
    d = jax.block_until_ready(jnp.asarray(d))

    results = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        np.asarray(fn())
        print(f"{name}: first {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn())
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best * 1e3, 1)
        print(f"{name:12s} {best*1e3:8.1f} ms", file=sys.stderr)

    n_inst = sdev.inst_matrix.shape[0]
    Ccap = max(LANES, -(-int(R * args.items_per_ray) // LANES) * LANES)
    C = -(-(Ccap + n_inst * STILE) // LANES) * LANES
    print(f"R={R} I={n_inst} Ccap={Ccap} C={C} ({C/1e6:.2f}M slots)",
          file=sys.stderr)

    dense = jax.jit(lambda bmn, bmx, o_, d_: dense_tlas_entries(
        bmn, bmx, o_, d_, K=K))
    timed("A.dense", lambda: jnp.sum(
        dense(ps.inst_box_min, ps.inst_box_max, o, d).inst))

    ents = jax.block_until_ready(
        dense(ps.inst_box_min, ps.inst_box_max, o, d))
    compact = jax.jit(lambda e: _compact_entries(e, Ccap)[0])
    timed("B1.compact", lambda: jnp.sum(compact(ents.inst)))

    citem = jax.block_until_ready(compact(ents.inst))
    inst_flat = ents.inst.reshape(-1)
    packf = jax.jit(lambda ci, fl: _pack_compact(ci, fl, n_inst, C)[0])
    timed("B2.sortpack", lambda: jnp.sum(packf(citem, inst_flat)))

    slot_item, stream_inst, _, _ = jax.block_until_ready(jax.jit(
        lambda ci, fl: _pack_compact(ci, fl, n_inst, C))(citem, inst_flat))

    def gather_rays(slot_item):
        ray_id = jnp.maximum(slot_item, 0) // K
        o_s = o[ray_id]
        d_s = d[ray_id]
        tl_s = jnp.where(slot_item >= 0, jnp.float32(1e30), -jnp.inf)
        return o_s, d_s, tl_s

    gj = jax.jit(gather_rays)
    timed("B3.gather", lambda: jnp.sum(gj(slot_item)[0]))

    o_s, d_s, tl_s = jax.block_until_ready(gj(slot_item))
    T = C // LANES
    o4 = jax.block_until_ready(
        o_s.reshape(T, SUB, LANE, 3).transpose(0, 3, 1, 2))
    d4 = jax.block_until_ready(
        d_s.reshape(T, SUB, LANE, 3).transpose(0, 3, 1, 2))
    tl3 = jax.block_until_ready(tl_s.reshape(T, SUB, LANE))
    sinst = stream_inst.reshape(T, NSTREAM)
    batch = min(CHUNK_TILES, T)
    pad = -(-T // batch) * batch - T
    if pad:
        o4 = jnp.concatenate([o4, jnp.zeros((pad,) + o4.shape[1:], o4.dtype)])
        d4 = jnp.concatenate([d4, jnp.ones((pad,) + d4.shape[1:], d4.dtype)])
        tl3 = jnp.concatenate(
            [tl3, jnp.full((pad,) + tl3.shape[1:], -jnp.inf, tl3.dtype)])
        sinst = jnp.concatenate(
            [sinst, jnp.full((pad, NSTREAM), -1, sinst.dtype)])
    meta = jnp.asarray([[int(ps.tlas_root), int(ps.n_tri), int(ps.n_inst), 0]],
                       jnp.int32)
    timed("C.kernel", lambda: jnp.sum(_run_items_arrays(
        meta, ps.scene_t, ps.tri_t, ps.inst_t, ps.root_t, sinst,
        o4, d4, tl3, batch=batch)[0]))
    occ = int(np.asarray(jnp.sum((stream_inst >= 0).astype(jnp.int32))))
    results["occupied_streams"] = occ
    print(f"occupied streams {occ}/{C // STILE}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
