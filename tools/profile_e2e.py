"""Per-stage honest timing of the integrator on the bench scene.

Times each stage of render_sample as an isolated jitted function on
realistic data (bench config geometry, real hits), min-of-N with
np.asarray timing. The sum won't equal the fused end-to-end (XLA fuses
some of this), but the ranking tells us what to attack.

Stages run the COMPONENT-FORM (_c) code paths — the same code the fused
integrator executes (wavefront.py migrated in round 3; the batched (R,3)
wrappers exist only for tools/tests compatibility).

Usage: python tools/profile_e2e.py [--width 960 --height 544 --reps 3]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from rfw_tpu.accel.lbvh import morton_codes
    from rfw_tpu.ops.traverse import (
        pallas_closest_hit, pallas_occluded, prepare_pallas_scene,
    )
    from rfw_tpu.render import disney
    from rfw_tpu.render.disney import v3_split, v3_stack
    from rfw_tpu.render.wavefront import (
        RenderConfig, _block_swizzle, _fetch_material_c,
        _sample_light_c, _shading_basis_c, camera_rays, render_sample,
    )

    W, H = args.width, args.height
    R = W * H
    sdev, dmats, atlas, dlights, view = build_scene(W, H)
    ps = jax.jit(prepare_pallas_scene)(sdev)
    jax.block_until_ready(ps.tri_t)

    key = jax.random.PRNGKey(3)
    px, py, _ = _block_swizzle(W, H, 1024)
    o, d = camera_rays(view, W, H, key, (px, py))
    hit = pallas_closest_hit(ps, o, d)
    hit = jax.tree.map(jnp.asarray, hit)

    @jax.jit
    def _reduce(tree):
        # scalar-reduce on device: the tunnel moves ~26 MB/s, so pulling
        # any (R,...) output would swamp the stage being measured
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(tree))

    def timeit(name, fn, *a, **kw):
        np.asarray(_reduce(fn(*a, **kw)))
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(_reduce(fn(*a, **kw)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s} {best*1e3:9.1f} ms", file=sys.stderr)
        return best

    results = {}

    from rfw_tpu.render.wavefront import tex_kinds_mask

    # full end-to-end single sample — bench-identical static config
    cfg = RenderConfig(max_bounces=1, clamp=100.0, sampler="sobol",
                       tex_mask=tex_kinds_mask(dmats.tex),
                       has_area_lights=bool(np.asarray(dlights.n_area)[0] > 0))
    results["render_sample(1b)"] = timeit(
        "render_sample 1-bounce", lambda: render_sample(
            sdev, dmats, atlas, dlights, view, key, W, H, cfg,
            sample_index=jnp.uint32(1)))

    # primary trace (coherent)
    results["trace_primary"] = timeit(
        "trace closest (coherent)", lambda: pallas_closest_hit(ps, o, d))

    # shadow trace from first hits toward a fixed point (anyhit)
    pos = o + jnp.where(hit.prim >= 0, hit.t, 1.0)[:, None] * d
    wi = jnp.array([0.3, 0.9, 0.3], jnp.float32)[None]
    wi = jnp.broadcast_to(wi / jnp.linalg.norm(wi), (R, 3))
    results["trace_occluded"] = timeit(
        "trace occluded (anyhit)", lambda: pallas_occluded(
            ps, pos + wi * 1e-3, wi, 10.0))

    # the 9-operand sort + unsort pair
    @jax.jit
    def sort_block(o, d, lim):
        octant = ((d[:, 0] >= 0).astype(jnp.int32)
                  + 2 * (d[:, 1] >= 0).astype(jnp.int32)
                  + 4 * (d[:, 2] >= 0).astype(jnp.int32))
        cell = morton_codes(o, sdev.tlas_min[0], sdev.tlas_max[0]).astype(jnp.int32)
        k = octant * (1 << 27) + (cell >> 5)
        ids = jnp.arange(k.shape[0], dtype=jnp.int32)
        (_, ox, oy, oz, dx, dy, dz, tl, sid) = jax.lax.sort(
            (k, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             lim, ids), num_keys=1)
        (_, t2, p2, i2, u2, v2) = jax.lax.sort(
            (sid, ox, oy, oz, dx, dy), num_keys=1)
        return t2

    results["sort_pair"] = timeit(
        "sort 9-op + unsort 6-op", lambda: sort_block(
            pos, d, jnp.ones(R)))

    # shading basis (vertex-attribute gathers) — component form
    @functools.partial(jax.jit)
    def basis_fn(hit, d):
        return _shading_basis_c(sdev, hit, v3_split(d))

    results["shading_basis"] = timeit(
        "shading basis (gathers)", lambda: basis_fn(hit, d))

    # material fetch + atlas sampling (bench tex_mask; includes basis)
    @jax.jit
    def mat_fn(hit):
        basis = _shading_basis_c(sdev, hit, v3_split(d))
        lod = jnp.zeros(R)
        p = _fetch_material_c(
            dmats, atlas, basis["mat_id"], basis["uv"], lod,
            basis["entering"], cfg.tex_mask)[0]
        return p.base_c

    results["material+atlas"] = timeit(
        "material fetch + atlas", lambda: mat_fn(hit))

    # light sampling + disney eval/pdf/sample — component form
    @jax.jit
    def shade_fn(hit, d):
        dc = v3_split(d)
        basis = _shading_basis_c(sdev, hit, dc)
        lod = jnp.zeros(R)
        params, emission, n_ts, _, _ = _fetch_material_c(
            dmats, atlas, basis["mat_id"], basis["uv"], lod,
            basis["entering"], cfg.tex_mask)
        ns = basis["ns"]
        zero = jnp.zeros(R)
        pos_c = (zero, zero, zero)
        u = jax.random.uniform(key, (R, 3))
        wi_l, dist_l, rad, is_delta, pdf_sa, _ = _sample_light_c(
            dlights, pos_c, u[:, 0], u[:, 1], u[:, 2], ns)
        wo = disney.to_local_c(basis["tan"], basis["bitan"], ns,
                               (-dc[0], -dc[1], -dc[2]))
        wi_local = disney.to_local_c(basis["tan"], basis["bitan"], ns, wi_l)
        f = disney.disney_eval_c(params, wo, wi_local)
        pdf = disney.disney_pdf_c(params, wo, wi_local)
        wi_b, f_b, pdf_b, delta = disney.disney_sample_c(
            params, wo, u[:, 0], u[:, 1], u[:, 2])
        return (f[0] + f_b[0] + pdf + pdf_b,
                f[1] + f_b[1], f[2] + f_b[2])

    results["light+disney"] = timeit(
        "light sample + disney", lambda: shade_fn(hit, d))

    # ---- previously-unaccounted glue stages (round 5) ----------------
    from rfw_tpu.render.sampler import sample_slot
    from rfw_tpu.render.wavefront import camera_rays_c

    pid = (py * W + px).astype(jnp.int32) if px is not None else \
        jnp.arange(R, dtype=jnp.int32)

    @jax.jit
    def cam_fn(si):
        cam_uv = sample_slot(si, pid, 0, 2)
        lens_uv = sample_slot(si, pid, 1, 2)
        ro, rd = camera_rays_c(view, W, H, key, (px, py),
                               jitter=(cam_uv, lens_uv))
        return ro[0] + rd[0]

    results["camera+sobol2"] = timeit(
        "camera rays + 2 sobol slots", cam_fn, jnp.uint32(1))

    @jax.jit
    def sobol_fn(si):
        # the 1-bounce integrator draws 4 more 3-wide slots (v0 NEE+BSDF,
        # v1 NEE at the final vertex, + spare) — price one 3-wide slot
        return sample_slot(si, pid, 2, 3)

    results["sobol_slot3"] = timeit(
        "one 3-wide sobol slot", sobol_fn, jnp.uint32(1))

    # v0 compaction sort: 16-operand, and the output restore: 4-operand
    f1 = jnp.ones(R, jnp.float32)

    @jax.jit
    def v0sort_fn(k16):
        out = jax.lax.sort(
            (k16, hit.t, hit.prim, hit.inst, hit.u, hit.v,
             f1, f1, f1, o[:, 0], o[:, 1], o[:, 2],
             d[:, 0], d[:, 1], d[:, 2], pid), num_keys=1)
        return out[1]

    key16 = jnp.where(hit.prim >= 0, hit.prim >> 4, jnp.int32(1 << 30))
    results["v0_sort16"] = timeit(
        "v0 compact sort (16-op)", v0sort_fn, key16)

    @jax.jit
    def outsort_fn(p):
        out = jax.lax.sort((p, f1, f1, f1), num_keys=1)
        return out[1]

    results["out_sort4"] = timeit(
        "output pid sort (4-op)", outsort_fn, pid)

    import json
    print(json.dumps({k: round(v * 1e3, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
