"""Kernel-only traversal microbenchmark (real TPU).

Times pallas_closest_hit / pallas_occluded on the flagship pica scene for
three ray populations:
  coherent   — primary camera rays in swizzled pixel blocks (best case)
  sorted     — uniform-sphere directions from first-hit origins, re-tiled
               by (direction octant, origin morton) like the integrator's
               sort_secondary pass (realistic bounce-ray case)
  unsorted   — the same rays in pixel order (worst case)

Honest timing: the clock stops after np.asarray(...) — block_until_ready
does NOT block over the axon tunnel (CLAUDE.md). min-of-N repetitions.

Usage: python tools/bench_traverse.py [--width 1920 --height 1080 --reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--occluded", action="store_true",
                    help="also time the any-hit kernel")
    ap.add_argument("--tp-occluded", action="store_true",
                    help="also time + verify the two-phase any-hit "
                         "(ray-binned items kernel) vs the classic "
                         "occlusion at NEE-like finite t limits")
    ap.add_argument("--stats", action="store_true",
                    help="also report per-program while-iteration counts")
    ap.add_argument("--cases", default="coherent,sorted,unsorted",
                    help="comma list of ray populations to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from rfw_tpu.accel.lbvh import morton_codes
    from rfw_tpu.ops.traverse import (
        pallas_closest_hit, pallas_occluded, prepare_pallas_scene,
        pallas_scene_bytes,
    )
    from rfw_tpu.render.wavefront import _block_swizzle, camera_rays

    W, H = args.width, args.height
    R = W * H
    sdev, dmats, atlas, dlights, view = build_scene(W, H)
    print(f"scene: {sdev.tri_v0.shape[0]} arena tris, "
          f"{pallas_scene_bytes(sdev)/1e6:.1f}MB kernel footprint",
          file=sys.stderr)
    ps = jax.jit(prepare_pallas_scene)(sdev)
    jax.block_until_ready(ps.tri_t)

    key = jax.random.PRNGKey(3)
    px, py, _ = _block_swizzle(W, H, 1024)
    o_coh, d_coh = camera_rays(view, W, H, key, (px, py))

    # first hits -> bounce-like rays: uniform sphere directions
    hit = pallas_closest_hit(ps, o_coh, d_coh)
    pos = o_coh + jnp.where(hit.prim >= 0, hit.t, 1.0)[:, None] * d_coh
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, (R,)) * 2 - 1
    phi = jax.random.uniform(k2, (R,)) * 2 * np.pi
    s = jnp.sqrt(jnp.maximum(1 - z * z, 0.0))
    d_inc = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=1)
    o_inc = pos + d_inc * 1e-3

    mn, mx = sdev.tlas_min[0], sdev.tlas_max[0]
    octant = ((d_inc[:, 0] >= 0).astype(jnp.int32)
              + 2 * (d_inc[:, 1] >= 0).astype(jnp.int32)
              + 4 * (d_inc[:, 2] >= 0).astype(jnp.int32))
    cell = morton_codes(o_inc, mn, mx).astype(jnp.int32)
    skey = octant * (1 << 27) + (cell >> 5)
    (_, sox, soy, soz, sdx, sdy, sdz) = jax.lax.sort(
        (skey, o_inc[:, 0], o_inc[:, 1], o_inc[:, 2],
         d_inc[:, 0], d_inc[:, 1], d_inc[:, 2]), num_keys=1)
    o_srt = jnp.stack([sox, soy, soz], axis=1)
    d_srt = jnp.stack([sdx, sdy, sdz], axis=1)

    # sortedD: direction-major key — 12 bits of direction morton over
    # 3 + 9 bits of origin cell (vs the integrator's octant + 25-bit
    # origin morton). Tests whether bounce-ray divergence is direction-
    # or origin-dominated.
    dm = morton_codes((d_inc + 1.0) * 0.5, jnp.zeros(3), jnp.ones(3))
    keyd = (dm.astype(jnp.int32) >> 18 << 18) + (cell >> 12)
    (_, dox, doy, doz, ddx, ddy, ddz) = jax.lax.sort(
        (keyd, o_inc[:, 0], o_inc[:, 1], o_inc[:, 2],
         d_inc[:, 0], d_inc[:, 1], d_inc[:, 2]), num_keys=1)
    o_srtd = jnp.stack([dox, doy, doz], axis=1)
    d_srtd = jnp.stack([ddx, ddy, ddz], axis=1)

    wanted = set(args.cases.split(","))
    cases = [(n, o, d) for n, o, d in
             [("coherent", o_coh, d_coh),
              ("sorted", o_srt, d_srt),
              ("sortedD", o_srtd, d_srtd),
              ("unsorted", o_inc, d_inc)] if n in wanted]
    results = {}
    for name, o, d in cases:
        o = jax.block_until_ready(jnp.asarray(o))
        d = jax.block_until_ready(jnp.asarray(d))
        # device->host transfers over this tunnel run at ~26 MB/s: pulling
        # the full (R,) hit array would add ~300ms of TRANSFER to every
        # sample. Reduce to a scalar on device; np.asarray pulls 4 bytes
        # (a ~30ms dispatch floor remains — subtract nothing, it is real
        # per-call latency any host-driven pipeline pays).
        fns = [("closest",
                lambda: jnp.sum(pallas_closest_hit(ps, o, d).t))]
        if args.occluded:
            fns.append(("occluded",
                        lambda: jnp.sum(pallas_occluded(ps, o, d, 1e26))))
        if args.tp_occluded:
            from rfw_tpu.ops.traverse_items import (
                twophase_occluded_with_fallback,
            )

            # NEE-like finite limits: distance toward a fixed in-scene
            # point (the first light's position region) per ray
            lp = 0.5 * (mn + mx) + jnp.asarray([0.0, 0.25, 0.0]) * (mx - mn)
            tl_nee = jnp.linalg.norm(lp[None] - o, axis=1)
            ni = int(sdev.inst_matrix.shape[0])
            fns.append(("occl_cl_nee",
                        lambda: jnp.sum(pallas_occluded(ps, o, d, tl_nee))))
            fns.append(("occl_tp_nee",
                        lambda: jnp.sum(twophase_occluded_with_fallback(
                            ps, o, d, tl_nee, n_inst_static=ni))))
        for fname, fn in fns:
            np.asarray(fn())  # compile + warm
            best = np.inf
            for _ in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(fn())
                best = min(best, time.perf_counter() - t0)
            mrays = R / best / 1e6
            results[f"{name}.{fname}"] = round(mrays, 2)
            print(f"{name:9s} {fname:9s} {best*1e3:8.1f} ms "
                  f"{mrays:8.2f} Mrays/s", file=sys.stderr)
        if args.tp_occluded:
            a = np.asarray(pallas_occluded(ps, o, d, tl_nee))
            b = np.asarray(twophase_occluded_with_fallback(
                ps, o, d, tl_nee, n_inst_static=ni))
            mism = int((a != b).sum())
            results[f"{name}.occl_mismatch"] = mism
            print(f"{name:9s} occl tp-vs-classic mismatches {mism}/{R}",
                  file=sys.stderr)
        if args.stats:
            from rfw_tpu.ops.traverse import LANES
            hs = pallas_closest_hit(ps, o, d, stats=True)
            iters = np.asarray(hs.u).reshape(-1, LANES)[:, 0]
            t_closest = R / (results[f"{name}.closest"] * 1e6)  # seconds
            per_iter_us = t_closest / (R // LANES) / max(iters.mean(), 1) * 1e6
            print(f"{name:9s} iters/program: mean {iters.mean():.0f} "
                  f"p50 {np.percentile(iters,50):.0f} "
                  f"p95 {np.percentile(iters,95):.0f} "
                  f"max {iters.max():.0f}  (~{per_iter_us:.2f} us/iter)",
                  file=sys.stderr)
            results[f"{name}.iters_mean"] = round(float(iters.mean()), 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
