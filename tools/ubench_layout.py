"""Layout microbenchmark: is (R,3) vector math paying the TPU lane tax?

A (R,3) f32 array tiles its minormost dim onto the 128-lane vector
registers — 3 useful lanes out of 128 — UNLESS XLA's fusion flattens the
buffer into 1D elementwise loops. Whether that rescue actually happens on
this stack (and whether [:,None] broadcasts or reductions along the 3-dim
break it) decides if the integrator's shading math (wavefront.py/disney.py,
everything (R,3)) should be restructured component-wise.

Cases, all honest scalar-reduce timed (CLAUDE.md):
  rgb_madd     pure elementwise on (R,3)
  cmp_madd     same math on 3 separate (R,) components
  rgb_bcast    (R,3) * (R,1) broadcast chain (the common integrator shape)
  cmp_bcast    components * (R,) — no broadcast needed
  rgb_dot      sum over the 3-dim ((R,3)->(R,)) + renormalize chain
  cmp_dot      same from components
  disney_like  ~40-op elementwise chain on (R,3) vs components

Usage (real chip): python tools/ubench_layout.py [--n 2073600 --reps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def clock(fn, *args, reps=5):
    import jax.numpy as jnp

    outs = fn(*args)  # compile
    _ = np.asarray(sum(jnp.sum(o) for o in outs))
    best = 1e30
    for _i in range(reps):
        t0 = time.perf_counter()
        outs = fn(*args)
        _ = np.asarray(sum(jnp.sum(o) for o in outs))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1920 * 1080)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=512, help="chain length; keep total work far above the ~25ms tunnel dispatch floor")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    R = args.n
    IT = args.iters
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    a3 = jax.random.uniform(ks[0], (R, 3)) + 0.1
    b3 = jax.random.uniform(ks[1], (R, 3)) + 0.1
    c3 = jax.random.uniform(ks[2], (R, 3)) + 0.1
    s1 = jax.random.uniform(ks[3], (R,)) + 0.1
    ax, ay, az = (a3[:, 0], a3[:, 1], a3[:, 2])
    bx, by, bz = (b3[:, 0], b3[:, 1], b3[:, 2])
    cx, cy, cz = (c3[:, 0], c3[:, 1], c3[:, 2])
    for v in (a3, b3, c3, s1, ax, ay, az, bx, by, bz, cx, cy, cz):
        v.block_until_ready()

    @jax.jit
    def rgb_madd(a, b, c):
        x = a
        for _ in range(IT):
            x = x * b + c
        return (x,)

    @jax.jit
    def cmp_madd(ax, ay, az, bx, by, bz, cx, cy, cz):
        xs = [ax, ay, az]
        for _ in range(IT):
            xs = [xs[0] * bx + cx, xs[1] * by + cy, xs[2] * bz + cz]
        return tuple(xs)

    @jax.jit
    def rgb_bcast(a, b, s):
        x = a
        for _ in range(IT):
            x = x * s[:, None] + b * (1.0 - s[:, None])
            s = jnp.maximum(x[:, 0], 1e-3)
        return (x,)

    @jax.jit
    def cmp_bcast(ax, ay, az, bx, by, bz, s):
        xs = [ax, ay, az]
        for _ in range(IT):
            xs = [xs[0] * s + bx * (1.0 - s), xs[1] * s + by * (1.0 - s),
                  xs[2] * s + bz * (1.0 - s)]
            s = jnp.maximum(xs[0], 1e-3)
        return tuple(xs)

    @jax.jit
    def rgb_dot(a, b):
        x = a
        for _ in range(IT // 2):
            d = jnp.sum(x * b, axis=-1, keepdims=True)
            x = x / jnp.maximum(jnp.abs(d), 1e-6)
        return (x,)

    @jax.jit
    def cmp_dot(ax, ay, az, bx, by, bz):
        xs = [ax, ay, az]
        for _ in range(IT // 2):
            d = xs[0] * bx + xs[1] * by + xs[2] * bz
            inv = 1.0 / jnp.maximum(jnp.abs(d), 1e-6)
            xs = [xs[0] * inv, xs[1] * inv, xs[2] * inv]
        return tuple(xs)

    def _disney_chain(base, rough, ndl, ndv, ndh, ldh):
        # a GTR2/Smith/Schlick-shaped elementwise chain (per channel)
        alpha = jnp.maximum(rough * rough, 1e-3)
        a2 = alpha * alpha
        denom = ndh * ndh * (a2 - 1.0) + 1.0
        d = a2 / jnp.maximum(np.pi * denom * denom, 1e-9)
        fh = (1.0 - ldh) ** 5
        f = base + (1.0 - base) * fh
        gl = ndl / jnp.maximum(
            ndl * (1.0 - a2 * 0.5) + a2 * 0.5, 1e-6)
        gv = ndv / jnp.maximum(
            ndv * (1.0 - a2 * 0.5) + a2 * 0.5, 1e-6)
        return f * (d * gl * gv / jnp.maximum(4.0 * ndl * ndv, 1e-6))

    @jax.jit
    def disney_rgb(base3, s):
        ndl = jnp.maximum(s, 1e-4)
        out = base3
        for _ in range(max(IT // 16, 1)):
            out = _disney_chain(
                jnp.clip(out, 0.0, 1.0), s[:, None], ndl[:, None],
                ndl[:, None], ndl[:, None], ndl[:, None])
        return (out,)

    @jax.jit
    def disney_cmp(bx, by, bz, s):
        ndl = jnp.maximum(s, 1e-4)
        outs = (bx, by, bz)
        for _ in range(max(IT // 16, 1)):
            outs = tuple(
                _disney_chain(jnp.clip(b, 0.0, 1.0), s, ndl, ndl, ndl, ndl)
                for b in outs)
        return outs

    @jax.jit
    def cmp_madd_bf16(ax, ay, az, bx, by, bz, cx, cy, cz):
        # bf16 throughput probe: same chain in bfloat16 — decides whether
        # the shading stages (all (R,) f32 elementwise today) should drop
        # to bf16 where precision allows
        xs = [v.astype(jnp.bfloat16) for v in (ax, ay, az)]
        bs = [v.astype(jnp.bfloat16) for v in (bx, by, bz)]
        cs = [v.astype(jnp.bfloat16) for v in (cx, cy, cz)]
        for _ in range(IT):
            xs = [xs[j] * bs[j] + cs[j] for j in range(3)]
        return tuple(x.astype(jnp.float32) for x in xs)

    @jax.jit
    def disney_cmp_bf16(bx, by, bz, s):
        s = s.astype(jnp.bfloat16)
        ndl = jnp.maximum(s, jnp.bfloat16(1e-4))
        outs = tuple(v.astype(jnp.bfloat16) for v in (bx, by, bz))
        for _ in range(max(IT // 16, 1)):
            outs = tuple(
                _disney_chain(jnp.clip(b, 0.0, 1.0), s, ndl, ndl, ndl, ndl)
                for b in outs)
        return tuple(x.astype(jnp.float32) for x in outs)

    @jax.jit
    def mixed_madd(a, b, c):
        # boundary-conversion cost probe: split (R,3) -> components,
        # compute the same 16-madd chain, restack to (R,3)
        xs = [a[:, 0], a[:, 1], a[:, 2]]
        bs = [b[:, 0], b[:, 1], b[:, 2]]
        cs = [c[:, 0], c[:, 1], c[:, 2]]
        for _ in range(IT):
            xs = [xs[j] * bs[j] + cs[j] for j in range(3)]
        return (jnp.stack(xs, axis=1),)

    res = {}
    res["rgb_madd"] = clock(rgb_madd, a3, b3, c3, reps=args.reps)
    res["mixed_madd"] = clock(mixed_madd, a3, b3, c3, reps=args.reps)
    res["cmp_madd"] = clock(cmp_madd, ax, ay, az, bx, by, bz, cx, cy, cz,
                            reps=args.reps)
    res["rgb_bcast"] = clock(rgb_bcast, a3, b3, s1, reps=args.reps)
    res["cmp_bcast"] = clock(cmp_bcast, ax, ay, az, bx, by, bz, s1,
                             reps=args.reps)
    res["rgb_dot"] = clock(rgb_dot, a3, b3, reps=args.reps)
    res["cmp_dot"] = clock(cmp_dot, ax, ay, az, bx, by, bz, reps=args.reps)
    res["disney_rgb"] = clock(disney_rgb, a3, s1, reps=args.reps)
    res["disney_cmp"] = clock(disney_cmp, ax, ay, az, s1, reps=args.reps)
    res["cmp_madd_bf16"] = clock(cmp_madd_bf16, ax, ay, az, bx, by, bz,
                                 cx, cy, cz, reps=args.reps)
    res["disney_cmp_bf16"] = clock(disney_cmp_bf16, ax, ay, az, s1,
                                   reps=args.reps)

    print(f"R={R}  (times ms, min of {args.reps})")
    for pair in (("rgb_madd", "cmp_madd"), ("rgb_madd", "mixed_madd"),
                 ("rgb_bcast", "cmp_bcast"),
                 ("rgb_dot", "cmp_dot"), ("disney_rgb", "disney_cmp"),
                 ("cmp_madd", "cmp_madd_bf16"),
                 ("disney_cmp", "disney_cmp_bf16")):
        r, c = pair
        print(f"  {r:14s} {res[r]*1e3:8.2f}   {c:15s} {res[c]*1e3:8.2f}"
              f"   ratio = {res[r]/max(res[c],1e-9):.2f}x")


if __name__ == "__main__":
    main()
