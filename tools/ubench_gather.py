"""Cost model for XLA gathers / one-hot matmuls / searchsorted on this TPU.

The integrator is gather-bound, but isolated stage timings swing 2x on the
shared tunnel and imply contradictory per-row costs. This pins down the
primitive costs (min-of-N, honest np.asarray timing, all in one process so
relative numbers are trustworthy):

  g_small_int   (R,) gather of (32,6) i32 rows       (material tex ids)
  g_small_f32   (R,) gather of (32,23) f32 rows      (material block)
  g_mid_f32     (R,) gather of (2048,18) f32 rows    (instance matrices)
  g_big32_f32   (R,) gather of (128k,32) f32 rows    (tri_shade record)
  g_big3_f32    (R,) gather of (128k,3) f32 rows     (old vtx gather)
  g_pool_f32    (R,) gather of (16M,) f32 flat pool  (atlas texel taps)
  onehot_small  (R,32)@(32,23) HIGHEST               (matmul alternative)
  onehot_mid    (R,2048)@(2048,18) HIGHEST
  searchsorted  (R,) into (64,) cdf

Usage: python tools/ubench_gather.py [--rays 518400 --reps 5]

--sweep-size (round 4): the flagship-profile marginals broke the "flat in
table size" assumption — one random quad-row gather on the 190MB atlas
pool costs 49.3 ms/2.07M rays vs 10.4 for the 10MB tri_shade record. The
sweep prices (R,) row gathers against (a) table size 0.5MB..192MB, (b)
row dtype f32 vs bf16 (does halving the row bytes halve the cost, i.e.
is the bf16-tables VERDICT item worth anything on gathers), and (c)
index locality (random vs sorted indices — what ray re-tiling buys the
shading gathers).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sweep_size(args):
    import jax
    import jax.numpy as jnp

    R = args.rays
    rng = np.random.default_rng(0)
    out = {}
    # (rows, cols, dtype) grid: 16B/row u32 quads (atlas-shaped) across
    # sizes, and 32-col records in f32 vs bf16 (tri_shade-shaped)
    cases = []
    for n in (32 * 1024, 256 * 1024, 2 * 1024 * 1024, 12 * 1024 * 1024):
        cases.append((f"u32x4_{n//1024}k", n, 4, np.uint32))
    for n in (64 * 1024, 1024 * 1024, 4 * 1024 * 1024):
        cases.append((f"f32x32_{n//1024}k", n, 32, np.float32))
        cases.append((f"bf16x32_{n//1024}k", n, 32, "bf16"))

    for name, n, c, dt in cases:
        if dt == "bf16":
            tbl = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32),
                              dtype=jnp.bfloat16)
        elif dt == np.uint32:
            tbl = jnp.asarray(
                rng.integers(0, 2**32, (n, c), dtype=np.uint64)
                .astype(np.uint32))
        else:
            tbl = jnp.asarray(rng.normal(size=(n, c)).astype(dt))
        idx_r = rng.integers(0, n, R).astype(np.int32)
        for loc, idx in (("rand", idx_r), ("sorted", np.sort(idx_r))):
            di = jnp.asarray(idx)

            @jax.jit
            def g(i, tbl=tbl):
                r = tbl[i]
                return jnp.sum(r[:, 0].astype(jnp.float32)) + jnp.sum(
                    r[:, -1].astype(jnp.float32))

            np.asarray(g(di))
            best = np.inf
            for _ in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(g(di))
                best = min(best, time.perf_counter() - t0)
            mb = n * c * (2 if dt == "bf16" else 4) / 1e6
            key = f"{name}_{loc}"
            out[key] = round(best / R * 1e9, 2)
            print(f"{key:22s} {best*1e3:8.2f} ms  ({out[key]:7.2f} ns/row, "
                  f"table {mb:7.1f} MB)", file=sys.stderr)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=518400)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sweep-size", action="store_true",
                    help="table-size x dtype x locality gather cost curve")
    args = ap.parse_args()

    if args.sweep_size:
        sweep_size(args)
        return

    import jax
    import jax.numpy as jnp

    R = args.rays
    rng = np.random.default_rng(0)

    t_small_i = jnp.asarray(rng.integers(0, 100, (32, 6)).astype(np.int32))
    t_small_f = jnp.asarray(rng.normal(size=(32, 23)).astype(np.float32))
    t_mid_f = jnp.asarray(rng.normal(size=(2048, 18)).astype(np.float32))
    t_big32 = jnp.asarray(rng.normal(size=(131072, 32)).astype(np.float32))
    t_big3 = jnp.asarray(rng.normal(size=(131072, 3)).astype(np.float32))
    t_pool = jnp.asarray(rng.normal(size=(16 * 1024 * 1024,)).astype(np.float32))
    cdf = jnp.asarray(np.sort(rng.random(64).astype(np.float32)))

    idx_small = jnp.asarray(rng.integers(0, 32, R).astype(np.int32))
    idx_mid = jnp.asarray(rng.integers(0, 2048, R).astype(np.int32))
    idx_big = jnp.asarray(rng.integers(0, 131072, R).astype(np.int32))
    idx_pool = jnp.asarray(rng.integers(0, 16 * 1024 * 1024, R).astype(np.int32))
    u = jnp.asarray(rng.random(R).astype(np.float32))

    @jax.jit
    def g_small_int(i):
        return t_small_i[i].sum()

    @jax.jit
    def g_small_f32(i):
        return t_small_f[i].sum()

    @jax.jit
    def g_mid_f32(i):
        return t_mid_f[i].sum()

    @jax.jit
    def g_big32(i):
        return t_big32[i].sum()

    @jax.jit
    def g_big3(i):
        return t_big3[i].sum()

    @jax.jit
    def g_pool(i):
        return t_pool[i].sum()

    @jax.jit
    def onehot_small(i):
        oh = (i[:, None] == jnp.arange(32, dtype=i.dtype)[None]).astype(jnp.float32)
        return jax.lax.dot_general(
            oh, t_small_f, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST).sum()

    @jax.jit
    def onehot_mid(i):
        oh = (i[:, None] == jnp.arange(2048, dtype=i.dtype)[None]).astype(jnp.float32)
        return jax.lax.dot_general(
            oh, t_mid_f, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST).sum()

    @jax.jit
    def ssorted(x):
        return jnp.searchsorted(cdf, x, side="right").sum()

    fns = [
        ("g_small_int", g_small_int, idx_small),
        ("g_small_f32", g_small_f32, idx_small),
        ("g_mid_f32", g_mid_f32, idx_mid),
        ("g_big32_f32", g_big32, idx_big),
        ("g_big3_f32", g_big3, idx_big),
        ("g_pool_f32", g_pool, idx_pool),
        ("onehot_small", onehot_small, idx_small),
        ("onehot_mid", onehot_mid, idx_mid),
        ("searchsorted", ssorted, u),
    ]
    out = {}
    for name, fn, arg in fns:
        np.asarray(fn(arg))
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn(arg))
            best = min(best, time.perf_counter() - t0)
        ns_row = best / R * 1e9
        out[name] = round(best * 1e3, 2)
        print(f"{name:14s} {best*1e3:8.2f} ms  ({ns_row:7.1f} ns/row)",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
