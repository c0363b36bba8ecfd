"""On-chip traversal correctness check: Pallas kernel (real TPU) vs the
numpy brute-force oracle on a subsample of pica primary rays.

Interpret mode has passed while the chip miscompiled (Mosaic dot_general at
K=4, round 2) — this script is the gate a traversal-kernel change must pass
on the REAL backend before it lands.

Usage: python tools/check_traverse.py [--rays 4096 --width 480 --height 270]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--oracle-rays", type=int, default=4096,
                    help="oracle subsample size (numpy brute force is "
                    "O(rays x tris) on one core)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from rfw_tpu.ops.traverse import pallas_closest_hit, prepare_pallas_scene
    from rfw_tpu.render.intersect import brute_force_closest
    from rfw_tpu.render.wavefront import _block_swizzle, camera_rays

    W, H = args.width, args.height
    R = W * H
    sdev, dmats, atlas, dlights, view = build_scene(W, H)
    ps = jax.jit(prepare_pallas_scene)(sdev)

    key = jax.random.PRNGKey(7)
    px, py, _ = _block_swizzle(W, H, 1024)
    o, d = camera_rays(view, W, H, key, (px, py))
    hit = pallas_closest_hit(ps, o, d)
    t = np.asarray(hit.t)
    prim = np.asarray(hit.prim)
    inst = np.asarray(hit.inst)

    # oracle on host: object-space rays per hit instance would be exact;
    # instead transform triangles to world per instance (same as tests)
    o_np = np.asarray(o)
    d_np = np.asarray(d)
    inst_m = np.asarray(sdev.inst_matrix)
    inst_mesh = np.asarray(sdev.inst_mesh)
    tri_mesh = np.asarray(sdev.tri_mesh)
    v0 = np.asarray(sdev.tri_v0)
    e1 = np.asarray(sdev.tri_e1)
    e2 = np.asarray(sdev.tri_e2)
    v0s, e1s, e2s = [], [], []
    for i in range(inst_m.shape[0]):
        m = inst_m[i]
        sel = tri_mesh == inst_mesh[i]
        v0s.append(v0[sel] @ m[:3, :3].T + m[:3, 3])
        e1s.append(e1[sel] @ m[:3, :3].T)
        e2s.append(e2[sel] @ m[:3, :3].T)
    wv0 = np.concatenate(v0s)
    we1 = np.concatenate(e1s)
    we2 = np.concatenate(e2s)

    n_sub = min(args.oracle_rays, R)
    sub = np.linspace(0, R - 1, n_sub).astype(np.int64)
    t_ref, p_ref, _, _ = brute_force_closest(
        o_np[sub], d_np[sub], wv0, we1, we2)
    mask = prim[sub] >= 0
    ref_mask = p_ref >= 0
    mm = int((mask != ref_mask).sum())
    both = mask & ref_mask
    terr = (np.abs(t[sub][both] - t_ref[both])
            / np.maximum(np.abs(t_ref[both]), 1e-6))
    print(f"oracle rays {n_sub}: mask mismatches {mm}/{n_sub} "
          f"({100.0*mm/n_sub:.3f}%), rel t err max {terr.max():.2e} "
          f"mean {terr.mean():.2e}")
    ok = mm <= max(1, n_sub // 2048) and terr.max() < 1e-3

    # any-hit kernel: occluded(tlim) must agree with the closest-hit t.
    # tlim slices through the scene so both outcomes are well represented;
    # rays whose t is within epsilon of tlim are excluded (legit f32 tie).
    from rfw_tpu.ops.traverse import pallas_occluded

    tlim = jnp.where(jnp.asarray(t) < 1e20,
                     jnp.asarray(t) * 1.5, jnp.float32(8.0))
    occ = np.asarray(pallas_occluded(ps, o, d, tlim))
    expect = t < np.asarray(tlim)
    near_tie = np.abs(t - np.asarray(tlim)) < 1e-3 * np.maximum(t, 1.0)
    omm = int((occ != expect)[~near_tie].sum())
    print(f"any-hit: occluded mismatches {omm}/{R - int(near_tie.sum())}")
    ok = ok and omm <= max(1, R // 100000)
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
