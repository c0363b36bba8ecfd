"""On-chip micro-benchmark: isolate the per-leaf dense-test cost.

The traversal stats (bench_traverse --stats) showed coherent programs cost
~785us for ~23 while-iterations — ~34us/iter, vs ~3us/iter marginal on
deep incoherent walks. Hypothesis: the dense treelet test (record select +
(TREELET,1)x(1,128) broadcast madds + epilogue) is 10-30us per visit, not
the ~1us the vreg-op count suggests, because of Mosaic relayouts. This
kernel times each candidate stage in a sequential fori_loop with all data
resident in VMEM (no dependent fetches), min-of-reps, honest np.asarray.

Variants:
  full      — record select + madds + epilogue + reduce (the real test)
  noselect  — group 0's record directly (measures the 8-way one-hot select)
  madds     — transform madds + reduce only (no select, no epilogue)
  epilogue  — reciprocal/compare/reduce only (no select, no madds)
  fetch     — dependent VMEM fetch chain (the round-1 ~1.5us baseline)

Usage: python tools/ubench_leaf.py [--iters 512 --reps 3]
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
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rfw_tpu.ops.traverse import LANE, TLANES, TGROUPS, SSUB
    from rfw_tpu.accel.bvh_cpu import TREELET
    from rfw_tpu.render.intersect import T_MIN

    def make_kernel(variant: str, iters: int):
        def kernel(tri_ref, obj_ref, t_ref, out_ref):
            out_ref[0] = t_ref[0]

            def body(j, _):
                # data-dependent group index (prevents hoisting): from the
                # running t values
                g = jax.lax.convert_element_type(
                    out_ref[0, 0, 0], jnp.int32) % TGROUPS
                gb = (j * 7) % (tri_ref.shape[1] // LANE)
                base = pl.multiple_of(gb * LANE, LANE)
                blockk = tri_ref[:, pl.ds(base, LANE)]
                if variant == "noselect":
                    rec = blockk[:, 0:TLANES]
                else:
                    rec = jnp.where(g == 0, blockk[:, 0:TLANES], 0.0)
                    for gg in range(1, TGROUPS):
                        rec = rec + jnp.where(
                            g == gg,
                            blockk[:, TLANES * gg:TLANES * (gg + 1)], 0.0)
                ax = (rec[:, 0:1], rec[:, 1:2], rec[:, 2:3], rec[:, 3:4])
                ay = (rec[:, 4:5], rec[:, 5:6], rec[:, 6:7], rec[:, 7:8])
                az = (rec[:, 8:9], rec[:, 9:10], rec[:, 10:11], rec[:, 11:12])
                for s in range(SSUB):
                    rsl = slice(s, s + 1)
                    ox = obj_ref[0, rsl, :]
                    oy = obj_ref[1, rsl, :]
                    oz = obj_ref[2, rsl, :]
                    dx = obj_ref[3, rsl, :]
                    dy = obj_ref[4, rsl, :]
                    dz = obj_ref[5, rsl, :]
                    if variant == "epilogue":
                        opu = ox * 1.0
                        opv = oy * 1.0
                        opw = oz * 1.0
                        dpu = dx * 1.0
                        dpv = dy * 1.0
                        dpw = dz * 1.0
                        # broadcast to (TREELET, LANE) once
                        opu = jnp.broadcast_to(opu, (TREELET, LANE))
                        opv = jnp.broadcast_to(opv, (TREELET, LANE))
                        opw = jnp.broadcast_to(opw, (TREELET, LANE))
                        dpu = jnp.broadcast_to(dpu, (TREELET, LANE))
                        dpv = jnp.broadcast_to(dpv, (TREELET, LANE))
                        dpw = jnp.broadcast_to(dpw, (TREELET, LANE))
                    else:
                        opu = ax[0] * ox + ax[1] * oy + ax[2] * oz + ax[3]
                        opv = ay[0] * ox + ay[1] * oy + ay[2] * oz + ay[3]
                        opw = az[0] * ox + az[1] * oy + az[2] * oz + az[3]
                        dpu = ax[0] * dx + ax[1] * dy + ax[2] * dz
                        dpv = ay[0] * dx + ay[1] * dy + ay[2] * dz
                        dpw = az[0] * dx + az[1] * dy + az[2] * dz
                    if variant == "madds":
                        tmin = jnp.min(opu + opv + opw + dpu + dpv + dpw,
                                       axis=0, keepdims=True)
                        t_ref[0, rsl, :] = t_ref[0, rsl, :] + tmin * 1e-30
                        continue
                    r0 = pl.reciprocal(dpw, approx=True)
                    rw = r0 * (2.0 - dpw * r0)
                    tq = -opw * rw
                    uq = opu + tq * dpu
                    vq = opv + tq * dpv
                    tcur = t_ref[0, rsl, :]
                    ok = ((uq >= -1e-7) & (vq >= -1e-7)
                          & (uq + vq <= 1 + 1e-7)
                          & (tq > T_MIN) & (tq < tcur))
                    score = jnp.where(ok, tq, jnp.float32(np.inf))
                    tmin = jnp.min(score, axis=0, keepdims=True)
                    hit_any = tmin < tcur
                    jio = jax.lax.broadcasted_iota(
                        jnp.int32, (TREELET, LANE), 0)
                    jwin = jnp.min(jnp.where(score == tmin, jio, TREELET),
                                   axis=0, keepdims=True)
                    onehot = jio == jwin
                    uwin = jnp.sum(jnp.where(onehot, uq, 0.0),
                                   axis=0, keepdims=True)
                    t_ref[0, rsl, :] = jnp.where(
                        hit_any, tmin + uwin * 1e-30, tcur)
                return 0

            jax.lax.fori_loop(0, iters, body, 0)
            out_ref[0] = t_ref[0]

        return kernel

    def make_fetch_kernel(iters: int):
        def kernel(tri_ref, obj_ref, t_ref, out_ref):
            out_ref[0] = t_ref[0]

            def body(j, idx):
                # dependent fetch chain: next index derives from the data
                base = pl.multiple_of(
                    (idx % (tri_ref.shape[1] // LANE)) * LANE, LANE)
                blockk = tri_ref[:, pl.ds(base, LANE)]
                v = blockk[0:1, 0:1]
                return (idx * 1103515245 + 12345
                        + jax.lax.convert_element_type(
                            v[0, 0] * 0.0, jnp.int32)) % 65521

            jax.lax.fori_loop(0, iters, body, jnp.int32(1))
            out_ref[0] = t_ref[0] + 1.0

        return kernel

    # build inputs: a fake treelet arena (64 groups) + one sub-tile of rays
    rng = np.random.default_rng(0)
    n_grp = 64
    tri = jnp.asarray(
        rng.normal(size=(TREELET, n_grp * LANE)).astype(np.float32))
    obj = jnp.asarray(rng.normal(size=(9, SSUB, LANE)).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("variant", "iters"))
    def run2(tri, obj, variant, iters):
        if variant == "fetch":
            kernel = make_fetch_kernel(iters)
        else:
            kernel = make_kernel(variant, iters)

        def wrapped(tri_ref, obj_ref, out_ref, t_ref):
            t_ref[0] = jnp.abs(obj_ref[0]) * 100.0  # plausible t values
            kernel(tri_ref, obj_ref, t_ref, out_ref)

        return pl.pallas_call(
            wrapped,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=jax.ShapeDtypeStruct((1, SSUB, LANE), jnp.float32),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, SSUB, LANE), jnp.float32)],
            interpret=args.interpret,
        )(tri, obj)

    results = {}
    for variant in ["full", "noselect", "madds", "epilogue", "fetch"]:
        times = {}
        for iters in (args.iters, args.iters * 2):
            np.asarray(run2(tri, obj, variant, iters))  # warm
            best = np.inf
            for _ in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(run2(tri, obj, variant, iters))
                best = min(best, time.perf_counter() - t0)
            times[iters] = best
        per_iter = (times[args.iters * 2] - times[args.iters]) / args.iters
        results[variant] = per_iter * 1e6
        print(f"{variant:9s} {per_iter*1e6:8.3f} us/iter "
              f"(call {times[args.iters]*1e3:.2f} ms @ {args.iters})",
              file=sys.stderr)
    import json
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
