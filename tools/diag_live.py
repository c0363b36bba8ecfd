"""Diagnostics for shading compaction: live-lane fraction after each
bounce on the bench scene, plus a fine-grained split of the material+atlas
stage (mat block fetch vs each texture-map bilinear fetch).

Honest scalar-reduce timing throughout (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from rfw_tpu.ops.traverse import pallas_closest_hit, prepare_pallas_scene
    from rfw_tpu.render.atlas import sample_bilinear
    from rfw_tpu.render.wavefront import (
        RenderConfig, _block_swizzle, _fetch_rows, camera_rays,
        tex_kinds_mask, render_sample,
    )

    W, H = args.width, args.height
    R = W * H
    sdev, dmats, atlas, dlights, view = build_scene(W, H)
    print("tex_mask =", tex_kinds_mask(dmats.tex), file=sys.stderr)
    print("n_mats =", dmats.color.shape[0],
          "atlas texels =", atlas.texels.shape, file=sys.stderr)
    ps = jax.jit(prepare_pallas_scene)(sdev)
    jax.block_until_ready(ps.tri_t)

    key = jax.random.PRNGKey(3)
    px, py, _ = _block_swizzle(W, H, 1024)
    o, d = camera_rays(view, W, H, key, (px, py))
    hit0 = pallas_closest_hit(ps, o, d)
    prim = np.asarray(hit0.prim)
    live1 = float((prim >= 0).mean())
    print(f"primary hit fraction (= bounce-1 live): {live1:.4f}",
          file=sys.stderr)

    # live fraction after bounce 1: resample a cosine-ish direction and
    # retrace (approximates the integrator's bounce-1 front)
    t = np.asarray(hit0.t)
    pos = o + jnp.where(hit0.prim >= 0, hit0.t, 1.0)[:, None] * d
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, (R,)) * 2 - 1
    phi = jax.random.uniform(k2, (R,)) * 2 * np.pi
    s = jnp.sqrt(jnp.maximum(1 - z * z, 0.0))
    d2 = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=1)
    tl = jnp.where(hit0.prim >= 0, jnp.float32(1e30), 0.0)
    hit1 = pallas_closest_hit(ps, pos + d2 * 1e-3, d2, tl)
    prim1 = np.asarray(hit1.prim)
    live2 = float((prim1 >= 0).mean())
    print(f"bounce-1 hit fraction (= bounce-2 live upper bound): {live2:.4f}",
          file=sys.stderr)

    results = {"live_b1": round(live1, 4), "live_b2": round(live2, 4)}

    # ---- material+atlas fine split --------------------------------------
    mat_id = jnp.asarray(sdev.tri_mat)[jnp.maximum(hit0.prim, 0)]
    uv = jnp.stack([jnp.abs(o[:, 0]) % 1.0, jnp.abs(o[:, 1]) % 1.0], 1)
    lod = jnp.zeros(R)

    def timed(name, fn):
        f = jax.jit(fn)
        np.asarray(f())  # compile
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(f())
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best * 1e3, 1)
        print(f"{name:18s} {best*1e3:8.1f} ms", file=sys.stderr)

    blk_tbl = jnp.concatenate(
        [dmats.color, dmats.params, dmats.absorption[:, :3]], axis=1)
    timed("mat_block", lambda: jnp.sum(_fetch_rows(blk_tbl, mat_id)))
    tex = dmats.tex[mat_id]
    timed("one_bilinear", lambda: jnp.sum(
        sample_bilinear(atlas, dmats.tex[mat_id][:, 0], uv, lod)))
    timed("two_bilinear", lambda: jnp.sum(
        sample_bilinear(atlas, dmats.tex[mat_id][:, 0], uv, lod)
        + sample_bilinear(atlas, dmats.tex[mat_id][:, 1], uv, lod)))

    # ---- real-hit material stage (scattered uv/lod, like the render) ----
    from rfw_tpu.render.wavefront import _fetch_material, _shading_basis

    def mat_real(tex_mask):
        def f():
            basis = _shading_basis(sdev, hit0, d)
            lodr = jnp.log2(jnp.maximum(
                hit0.t * view[16] * basis["lodf"] * 1024.0, 1e-6))
            return _fetch_material(
                dmats, atlas, sdev, jnp.maximum(hit0.prim, 0), basis["uv"],
                lodr, basis["entering"], tex_mask)[0].base_color
        return f

    timed("mat_real_m5", mat_real(5))
    timed("mat_real_m15", mat_real(15))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
