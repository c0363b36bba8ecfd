"""On-chip two-phase (phase A+B items) vs classic kernel, pica bounce rays.

The round-3 go/no-go measurement: times the full two-phase pipeline
(jnp TLAS entries -> instance-sorted item packing -> fixed-instance
Pallas walks -> min-t merge, ops/traverse_items.py) against the classic
two-level kernel on the SAME sorted bounce-ray population bench_traverse
uses, and counts result disagreements on non-truncated rays with
device-side reductions (the tunnel moves ~26-60MB/s; never pull full
arrays to time or compare).

Honest timing: clock stops after np.asarray(scalar) — block_until_ready
does not block over the axon tunnel (CLAUDE.md).

Usage: python tools/bench_items.py [--width 960 --height 544 --reps 3
                                    --K 8 --items-per-ray 3.0]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--K", type=int, default=8)
    ap.add_argument("--items-per-ray", type=float, default=3.0,
                    help="item capacity allowance (mean measured: 1.09)")
    ap.add_argument("--case", default="sorted",
                    choices=["coherent", "sorted", "unsorted"])
    ap.add_argument("--breakdown", action="store_true",
                    help="also time phase A / pack / kernel in isolation")
    ap.add_argument("--skip-main", action="store_true",
                    help="skip the classic/twophase end-to-end timings "
                         "(fast re-runs of single breakdown stages)")
    ap.add_argument("--pallas-A", action="store_true",
                    help="with --breakdown: also time the Pallas phase-A "
                         "kernel and count entry-set disagreements")
    ap.add_argument("--fused", action="store_true",
                    help="time the round-3 fused path "
                         "(twophase_closest_fused / _with_fallback) "
                         "instead of the round-2 eager pipeline")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from rfw_tpu.accel.lbvh import morton_codes
    from rfw_tpu.ops.traverse import (
        LANES, pallas_closest_hit, prepare_pallas_scene,
    )
    from rfw_tpu.ops.traverse_items import pallas_twophase_closest_hit
    from rfw_tpu.render.wavefront import _block_swizzle, camera_rays

    W, H = args.width, args.height
    R = W * H
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

    cap_tiles = max(1, int(args.items_per_ray * R) // LANES) + 16
    print(f"R={R} K={args.K} capacity={cap_tiles} tiles "
          f"({cap_tiles * LANES / 1e6:.2f}M slots)", file=sys.stderr)

    results = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        np.asarray(fn())  # compile + warm
        print(f"{name}: first call {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn())
            best = min(best, time.perf_counter() - t0)
        mrays = R / best / 1e6
        results[name] = round(mrays, 2)
        print(f"{name:9s} {best*1e3:8.1f} ms {mrays:8.2f} Mrays/s",
              file=sys.stderr)

    if not args.skip_main:
        timed("classic", lambda: jnp.sum(pallas_closest_hit(ps, o, d).t))

    if args.fused:
        from rfw_tpu.ops.traverse_items import (
            twophase_closest_fused, twophase_closest_with_fallback,
        )

        ni = sdev.inst_matrix.shape[0]
        fused = jax.jit(functools.partial(
            twophase_closest_fused, K=args.K,
            items_per_ray=args.items_per_ray, n_inst_static=ni))
        fusedf = jax.jit(functools.partial(
            twophase_closest_with_fallback, K=args.K,
            items_per_ray=args.items_per_ray, n_inst_static=ni))
        timed("fused", lambda: jnp.sum(fused(ps, o, d)[0].t))
        timed("fused+fb", lambda: jnp.sum(fusedf(ps, o, d).t))

        # agreement of the fallback-complete path vs classic (device-side)
        ref = pallas_closest_hit(ps, o, d)
        got = fusedf(ps, o, d)
        mask_mis = jnp.sum(((ref.prim >= 0) != (got.prim >= 0))
                           .astype(jnp.int32))
        both = (ref.prim >= 0) & (got.prim >= 0)
        t_mis = jnp.sum((both & (jnp.abs(ref.t - got.t) > 1e-3))
                        .astype(jnp.int32))
        _, trunc = fused(ps, o, d)
        results["trunc_frac"] = round(float(np.asarray(jnp.mean(
            trunc.astype(jnp.float32)))), 4)
        results["mask_mismatch"] = int(np.asarray(mask_mis))
        results["t_mismatch"] = int(np.asarray(t_mis))
        print(f"trunc {results['trunc_frac']}  mask_mis "
              f"{results['mask_mismatch']}  t_mis {results['t_mismatch']}",
              file=sys.stderr)
        print(json.dumps(results))
        return

    def two():
        hit, trunc = pallas_twophase_closest_hit(
            ps, sdev, o, d, K=args.K, capacity_tiles=cap_tiles)
        return jnp.sum(hit.t)

    if not args.skip_main:
        timed("twophase", two)

    if args.breakdown:
        # isolate the pipeline stages (every sub-jit shares shapes with the
        # full-path call above, so nothing recompiles)
        from rfw_tpu.ops.traverse import CHUNK_TILES, SUB, LANE, NSTREAM
        from rfw_tpu.ops.traverse_items import (
            _pack_items, _run_items_arrays, STILE,
        )
        from rfw_tpu.render.twophase import tlas_entries

        twf = jnp.asarray(sdev.tlas_wide_f)
        twi = jnp.asarray(sdev.tlas_wide_i)
        timed("A.entries", lambda: jnp.sum(
            tlas_entries(twf, twi, o, d, K=args.K).inst))

        if args.pallas_A:
            from rfw_tpu.ops.traverse_entries import pallas_tlas_entries
            timed("A.pallas", lambda: jnp.sum(
                pallas_tlas_entries(ps, o, d, K=args.K).inst))
            gp = pallas_tlas_entries(ps, o, d, K=args.K)
            gj = tlas_entries(twf, twi, o, d, K=args.K)
            ent_mis = jnp.sum((jnp.sort(gp.inst, axis=1)
                               != jnp.sort(gj.inst, axis=1)).any(axis=1)
                              .astype(jnp.int32))
            results["A_entry_set_mismatch"] = int(np.asarray(ent_mis))
            print(f"A.pallas entry-set mismatches "
                  f"{results['A_entry_set_mismatch']}", file=sys.stderr)

        ents = tlas_entries(twf, twi, o, d, K=args.K)
        inst_flat = jax.block_until_ready(ents.inst.reshape(-1))
        C = cap_tiles * LANES
        n_inst = int(ps.n_inst)
        timed("B.pack", lambda: jnp.sum(
            _pack_items(inst_flat, n_inst, C)[0]))

        slot_item, stream_inst, _ = _pack_items(inst_flat, n_inst, C)
        ray_id = jnp.maximum(slot_item, 0) // args.K
        o_s = o[ray_id]
        d_s = d[ray_id]
        tl_s = jnp.where(slot_item >= 0, jnp.float32(1e30), -jnp.inf)
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
            o4 = jnp.concatenate(
                [o4, jnp.zeros((pad,) + o4.shape[1:], o4.dtype)])
            d4 = jnp.concatenate(
                [d4, jnp.ones((pad,) + d4.shape[1:], d4.dtype)])
            tl3 = jnp.concatenate(
                [tl3, jnp.full((pad,) + tl3.shape[1:], -jnp.inf, tl3.dtype)])
            sinst = jnp.concatenate(
                [sinst, jnp.full((pad, NSTREAM), -1, sinst.dtype)])
        meta = jnp.asarray(
            [[int(ps.tlas_root), int(ps.n_tri), n_inst, 0]], jnp.int32)
        timed("C.kernel", lambda: jnp.sum(_run_items_arrays(
            meta, ps.scene_t, ps.tri_t, ps.inst_t, ps.root_t, sinst,
            o4, d4, tl3, batch=batch)[0]))
        occupied = int(np.asarray(jnp.sum((stream_inst >= 0)
                                          .astype(jnp.int32))))
        print(f"occupied streams {occupied}/{C // STILE}", file=sys.stderr)
        results["occupied_streams"] = occupied

    if args.skip_main:
        print(json.dumps(results))
        return

    # agreement on non-truncated rays (device-side counts only)
    ref = pallas_closest_hit(ps, o, d)
    got, trunc = pallas_twophase_closest_hit(
        ps, sdev, o, d, K=args.K, capacity_tiles=cap_tiles)
    ok = ~trunc
    mask_mis = jnp.sum((ok & ((ref.prim >= 0) != (got.prim >= 0))
                        ).astype(jnp.int32))
    both = ok & (ref.prim >= 0) & (got.prim >= 0)
    t_mis = jnp.sum((both & (jnp.abs(ref.t - got.t) > 1e-3)
                     ).astype(jnp.int32))
    results["trunc_frac"] = round(float(np.asarray(jnp.mean(
        trunc.astype(jnp.float32)))), 4)
    results["mask_mismatch"] = int(np.asarray(mask_mis))
    results["t_mismatch"] = int(np.asarray(t_mis))
    print(f"trunc {results['trunc_frac']}  mask_mis "
          f"{results['mask_mismatch']}  t_mis {results['t_mismatch']}",
          file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
