"""Sub-stage profile of the SHADING path on the bench scene.

profile_e2e.py's stages nest (light+disney re-runs basis+material), so the
marginal cost of each ingredient is invisible. This tool isolates each one
with an --iters amortization loop (the axon tunnel has a ~25ms dispatch
floor; per-iteration perturbation defeats CSE) and honest scalar-reduce
timing. Output: ms per ONE application at R rays.

Stages:
  gather_tri_shade   the (T,32) tri_shade row gather (basis input)
  gather_atlas       one quad-row texel-pool gather + bilinear unpack
  onehot_inst        instance-block fetch via one-hot MXU matmul
  onehot_mat         material-block fetch via one-hot MXU matmul
  basis_math         _shading_basis_c minus its two fetches (math only)
  sample_light       _sample_light_c (potential pick, bench light set)
  disney_eval        disney_eval_c
  disney_pdf         disney_pdf_c
  disney_sample      disney_sample_c (includes its eval+pdf calls)
  sobol3             one sample_slot(R,3) draw
  frame_tolocal      tangent frame + 2x to_local

Usage (real chip): python tools/profile_shading.py [--width 1920
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
    from rfw_tpu.render import disney
    from rfw_tpu.render.disney import v3_split
    from rfw_tpu.render.sampler import sample_slot
    from rfw_tpu.render.wavefront import (
        _block_swizzle, _fetch_material_c, _fetch_rows, _sample_light_c,
        _shading_basis_c, camera_rays,
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
    hit = jax.tree.map(jnp.asarray, hit)
    T = int(sdev.tri_shade.shape[0])
    NTEX = int(atlas.texels.shape[0])

    ks = jax.random.split(key, 8)
    u3 = jax.random.uniform(ks[0], (R, 3))
    wo0 = jax.random.uniform(ks[1], (R, 3), minval=0.1) * jnp.array([1, 1, 1.0])
    wo0 = wo0 / jnp.linalg.norm(wo0, axis=1, keepdims=True)
    wi0 = jax.random.uniform(ks[2], (R, 3), minval=0.05)
    wi0 = wi0 / jnp.linalg.norm(wi0, axis=1, keepdims=True)
    prim0 = jnp.maximum(hit.prim, 0)
    pid = (py * W + px).astype(jnp.int32)

    # realistic MatParams: fetch once (outside timing)
    basis0 = jax.jit(
        lambda h, dd: _shading_basis_c(sdev, h, v3_split(dd)))(hit, d)
    params0 = jax.jit(lambda b: _fetch_material_c(
        dmats, atlas, b["mat_id"], b["uv"], jnp.zeros(R), b["entering"], 1
    )[0])(basis0)
    jax.block_until_ready(params0.metallic)

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
        print(f"{name:18s} {per:8.2f} ms/app   ({best*1e3:7.1f} ms / {IT})",
              file=sys.stderr)
        return per

    res = {}

    # ---- gathers -----------------------------------------------------------
    def g_tri(idx):
        acc = jnp.zeros((R,), jnp.float32)
        for i in range(IT):
            rows = sdev.tri_shade[(idx + i * 9973) % T]
            acc = acc + rows[:, 0] + rows[:, 31]
        return acc

    res["gather_tri_shade"] = timed("gather_tri_shade", g_tri, prim0)

    def g_atlas(idx):
        acc = jnp.zeros((R,), jnp.float32)
        for i in range(IT):
            q = atlas.texels[(idx + i * 65537) % NTEX]
            acc = acc + (q[:, 0] & 0xFF).astype(jnp.float32)
        return acc

    res["gather_atlas"] = timed("gather_atlas", g_atlas, prim0)

    # ---- one-hot fetches ---------------------------------------------------
    n_inst = sdev.inst_matrix.shape[0]
    inst_blk = jnp.concatenate(
        [sdev.inst_normal.reshape(n_inst, 9),
         sdev.inst_matrix[:, :3, :3].reshape(n_inst, 9),
         sdev.inst_matrix[:, :3, 3]], axis=1)

    def g_inst(idx):
        acc = jnp.zeros((R,), jnp.float32)
        for i in range(IT):
            m = _fetch_rows(inst_blk, (idx + i) % n_inst)
            acc = acc + m[:, 0] + m[:, 20]
        return acc

    res["onehot_inst"] = timed("onehot_inst", g_inst,
                               jnp.maximum(hit.inst, 0))

    n_mat = dmats.color.shape[0]
    mat_blk = jnp.concatenate(
        [dmats.color, dmats.params, dmats.absorption[:, :3],
         dmats.tex.astype(jnp.float32)], axis=1)

    def g_mat(idx):
        acc = jnp.zeros((R,), jnp.float32)
        for i in range(IT):
            m = _fetch_rows(mat_blk, (idx + i) % n_mat)
            acc = acc + m[:, 0] + m[:, 28]
        return acc

    res["onehot_mat"] = timed("onehot_mat", g_mat, basis0["mat_id"])

    # ---- full basis & its math-only core ----------------------------------
    def basis_full(h, dd):
        acc = jnp.zeros((R,), jnp.float32)
        hh = h
        for i in range(IT):
            b = _shading_basis_c(sdev, hh, v3_split(dd))
            acc = acc + b["ns"][0] + b["uv"][0] + b["lodf"]
            hh = hh._replace(u=hh.u + 1e-6 * acc)
        return acc

    res["basis_full"] = timed("basis_full", basis_full, hit, d)

    # ---- light sampling ----------------------------------------------------
    pc = v3_split(o + d * hit.t[:, None])
    nsc = basis0["ns"]

    def light(u):
        acc = jnp.zeros((R,), jnp.float32)
        uu = u
        for i in range(IT):
            wi, dist, rop, is_delta, pdf_sa, z = _sample_light_c(
                dlights, pc, uu[:, 0], uu[:, 1], uu[:, 2], nsc)
            acc = acc + wi[0] + dist + rop[0] + pdf_sa + z
            uu = jnp.abs(jnp.sin(uu + acc[:, None] * 1e-9))
        return acc

    res["sample_light"] = timed("sample_light", light, u3)

    # ---- disney ------------------------------------------------------------
    woc, wic = v3_split(wo0), v3_split(wi0)

    def ev(w):
        acc = jnp.zeros((R,), jnp.float32)
        wc = v3_split(w)
        for i in range(IT):
            f = disney.disney_eval_c(params0, woc, wc)
            acc = acc + f[0] + f[1] + f[2]
            wc = (wc[0] + acc * 1e-12, wc[1], wc[2])
        return acc

    res["disney_eval"] = timed("disney_eval", ev, wi0)

    def pdf(w):
        acc = jnp.zeros((R,), jnp.float32)
        wc = v3_split(w)
        for i in range(IT):
            acc = acc + disney.disney_pdf_c(params0, woc, wc)
            wc = (wc[0] + acc * 1e-12, wc[1], wc[2])
        return acc

    res["disney_pdf"] = timed("disney_pdf", pdf, wi0)

    def smp(u):
        acc = jnp.zeros((R,), jnp.float32)
        uu = u
        for i in range(IT):
            wi, f, pdf_b, delta = disney.disney_sample_c(
                params0, woc, uu[:, 0], uu[:, 1], uu[:, 2])
            acc = acc + wi[0] + f[0] + pdf_b
            uu = jnp.abs(jnp.sin(uu + acc[:, None] * 1e-9))
        return acc

    res["disney_sample"] = timed("disney_sample", smp, u3)

    # ---- sampler -----------------------------------------------------------
    def sob(si):
        acc = jnp.zeros((R,), jnp.float32)
        for i in range(IT):
            u = sample_slot(si + i, pid, 2 + i, 3)
            acc = acc + u[:, 0] + u[:, 1] + u[:, 2]
        return acc

    res["sobol3"] = timed("sobol3", sob, jnp.uint32(5))

    # ---- frame + to_local --------------------------------------------------
    def frame(nv):
        acc = jnp.zeros((R,), jnp.float32)
        nc = v3_split(nv)
        for i in range(IT):
            t, bt = disney.build_tangent_frame_c(nc)
            a = disney.to_local_c(t, bt, nc, woc)
            b = disney.to_local_c(t, bt, nc, wic)
            acc = acc + a[0] + b[2]
            nc = disney.v3_normalize(
                (nc[0] + acc * 1e-12, nc[1], nc[2]))
        return acc

    res["frame_tolocal"] = timed("frame_tolocal", frame, wo0)

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
