"""Atlas-sampling cost decomposition on the bench scene.

profile_shading.py showed the quad-row texel gather at ~50ms/2M rays with
RANDOMIZED indices — a locality worst case. This tool separates:

  texel_real      quad gather at the REAL vertex-0 uv pattern (coherent)
  texel_shuf      same indices randomly permuted (bounce-vertex worst case)
  texel_sortidx   shuffled indices pre-sorted ascending (locality ceiling —
                  what a uv-sort before the gather could recover)
  meta_gathers    the 6 per-lane metadata gathers sample_bilinear does
                  (mip_count/width0/offset/width/height/srgb)
  bilinear_full   one full sample_bilinear (diffuse map, real uvs)
  unpack_math     RGBA unpack + bilinear lerp math on a fixed quad
  sortpair        one (key + 3 operand) lax.sort at R lanes (what adding a
                  uv-sort would cost)

Honest scalar-reduce timing, --iters amortization over the ~25ms tunnel
dispatch floor. Usage: python tools/ubench_atlas.py [--width 1920
--height 1080 --iters 8 --reps 3]
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from rfw_tpu.ops.traverse import pallas_closest_hit, prepare_pallas_scene
    from rfw_tpu.render.atlas import _unpack_rgba, sample_bilinear
    from rfw_tpu.render.disney import v3_split
    from rfw_tpu.render.wavefront import (
        _block_swizzle, _shading_basis_c, camera_rays,
    )

    W, H = args.width, args.height
    R = W * H
    IT = args.iters
    sdev, dmats, atlas, dlights, view = build_scene(W, H)
    ps = jax.jit(prepare_pallas_scene)(sdev)
    jax.block_until_ready(ps.tri_t)

    key = jax.random.PRNGKey(3)
    px, py, _ = _block_swizzle(W, H, 1024)
    o, d = camera_rays(view, W, H, key, (px, py))
    hit = pallas_closest_hit(ps, o, d)
    basis = jax.jit(
        lambda h, dd: _shading_basis_c(sdev, h, v3_split(dd)))(hit, d)
    NTEX = int(atlas.texels.shape[0])

    # real diffuse-map state at vertex 0
    mat_id = basis["mat_id"]
    tex0 = jnp.round(dmats.tex.astype(jnp.float32)[mat_id][:, 0]).astype(
        jnp.int32)
    uv_u, uv_v = basis["uv"]
    lod = jnp.zeros(R, jnp.float32)

    # the real texel index stream sample_bilinear would gather (mip 0)
    t = jnp.maximum(tex0, 0)
    off = atlas.offset[t, 0]
    w_ = atlas.width[t, 0]
    h_ = atlas.height[t, 0]
    u_w = uv_u - jnp.floor(uv_u)
    v_w = uv_v - jnp.floor(uv_v)
    xi = jnp.mod(jnp.floor(u_w * w_.astype(jnp.float32) - 0.5).astype(
        jnp.int32), w_)
    yi = jnp.mod(jnp.floor(v_w * h_.astype(jnp.float32) - 0.5).astype(
        jnp.int32), h_)
    idx_real = off + yi * w_ + xi
    idx_real = jnp.asarray(np.asarray(idx_real))  # materialize
    perm = np.random.default_rng(0).permutation(R)
    idx_shuf = jnp.asarray(np.asarray(idx_real)[perm])
    idx_sorted = jnp.asarray(np.sort(np.asarray(idx_shuf)))

    def timed(name, fn, *a):
        f = jax.jit(fn)
        np.asarray(jnp.sum(sum(jax.tree.leaves(jax.tree.map(
            lambda x: jnp.sum(x.astype(jnp.float32)), f(*a))))))
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(jnp.sum(sum(jax.tree.leaves(jax.tree.map(
                lambda x: jnp.sum(x.astype(jnp.float32)), f(*a))))))
            best = min(best, time.perf_counter() - t0)
        per = best / IT * 1e3
        print(f"{name:16s} {per:8.2f} ms/app   ({best*1e3:7.1f} ms / {IT})",
              file=sys.stderr)
        return per

    res = {}

    def g_quad(idx, stride):
        acc = jnp.zeros((R,), jnp.float32)
        for i in range(IT):
            q = atlas.texels[(idx + i * stride) % NTEX]
            acc = acc + (q[:, 0] & 0xFF).astype(jnp.float32)
        return acc

    # stride 0: the SAME index stream every iteration (cache-warm ceiling);
    # stride 1: nudged one row (locality preserved, defeats CSE)
    res["texel_real"] = timed("texel_real", lambda i: g_quad(i, 1), idx_real)
    res["texel_shuf"] = timed("texel_shuf", lambda i: g_quad(i, 1), idx_shuf)
    res["texel_sortidx"] = timed(
        "texel_sortidx", lambda i: g_quad(i, 1), idx_sorted)

    def meta(tt):
        acc = jnp.zeros((R,), jnp.float32)
        for i in range(IT):
            ti = (tt + i) % atlas.mip_count.shape[0]
            mc = atlas.mip_count[ti]
            w0 = atlas.width[ti, 0]
            of = atlas.offset[ti, 1]
            ww = atlas.width[ti, 1]
            hh = atlas.height[ti, 1]
            sg = atlas.srgb[ti]
            acc = (acc + mc.astype(jnp.float32) + w0.astype(jnp.float32)
                   + of.astype(jnp.float32) + ww.astype(jnp.float32)
                   + hh.astype(jnp.float32) + sg.astype(jnp.float32))
        return acc

    res["meta_gathers"] = timed("meta_gathers", meta, t)

    def bil(uu):
        acc = jnp.zeros((R,), jnp.float32)
        u_cur = uu
        for i in range(IT):
            c = sample_bilinear(atlas, tex0, (u_cur, uv_v), lod)
            acc = acc + c[:, 0] + c[:, 2]
            u_cur = u_cur + 1e-4
        return acc

    res["bilinear_full"] = timed("bilinear_full", bil, uv_u)

    quad0 = atlas.texels[idx_real]

    def unpack(q):
        acc = jnp.zeros((R,), jnp.float32)
        fx = uv_u[:, None]
        fy = uv_v[:, None]
        qq = q
        for i in range(IT):
            c00 = _unpack_rgba(qq[:, 0])
            c10 = _unpack_rgba(qq[:, 1])
            c01 = _unpack_rgba(qq[:, 2])
            c11 = _unpack_rgba(qq[:, 3])
            c = (c00 * (1 - fx) + c10 * fx) * (1 - fy) \
                + (c01 * (1 - fx) + c11 * fx) * fy
            acc = acc + c[:, 0] + c[:, 3]
            qq = qq + jnp.uint32(1)
        return acc

    res["unpack_math"] = timed("unpack_math", unpack, quad0)

    def sortpair(k):
        acc = jnp.zeros((R,), jnp.float32)
        kk = k
        for i in range(IT):
            out = jax.lax.sort((kk, uv_u, uv_v, lod), num_keys=1)
            acc = acc + out[1] + out[3]
            kk = kk + out[0] % 7
        return acc

    res["sortpair"] = timed("sortpair", sortpair, idx_shuf)

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
