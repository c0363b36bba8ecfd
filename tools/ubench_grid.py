"""Isolate the per-grid-step fixed cost of the traversal pallas_call.

KMAX sweep showed ~770us/program of fixed overhead (KMAX=1 == full time on
coherent rays). This benchmarks the SAME call shape (grid, block specs,
scene operands, scratch) with progressively stripped kernel bodies:

  trivial  — write outputs from inputs, never touch scene refs
  init     — the real kernel's prologue only (output init + 4x set_obj)
  onestep  — prologue + exactly one full while-loop body compiled in
             (KMAX=1 measured separately confirms this)

If `trivial` already costs ~700us/program, the overhead is the Mosaic
pipeline / axon per-step cost and the fix is fewer-longer programs
(batch B sub-tiles per program). If `trivial` is fast but `init` is not,
the prologue is the cost. Usage: python tools/ubench_grid.py
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
    ap.add_argument("--tiles", type=int, default=512,
                    help="grid programs to run (x1024 rays)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import build_scene
    from rfw_tpu.ops.traverse import (
        LANE, NSTREAM, SSUB, STACK_DEPTH, SUB, prepare_pallas_scene,
    )

    sdev, *_ = build_scene(640, 360)
    ps = jax.jit(prepare_pallas_scene)(sdev)
    jax.block_until_ready(ps.tri_t)

    T = args.tiles
    rng = np.random.default_rng(0)
    o4 = jnp.asarray(rng.normal(size=(T, 3, SUB, LANE)).astype(np.float32))
    d4 = jnp.asarray(rng.normal(size=(T, 3, SUB, LANE)).astype(np.float32))
    tl3 = jnp.asarray(np.full((T, SUB, LANE), 1e26, np.float32))
    meta = jnp.asarray([[ps.tlas_root, ps.n_tri, ps.n_inst, 0]], jnp.int32)

    def make_kernel(variant):
        def kernel(meta_ref, scene_ref, tri_ref, inst_ref, root_ref,
                   o_ref, d_ref, tlim_ref,
                   t_ref, prim_ref, iout_ref, u_ref, v_ref,
                   obj_ref, stack_ref):
            lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
            n_inst = meta_ref[0, 2]

            t_ref[0] = jnp.minimum(tlim_ref[0], 1e30)
            prim_ref[0] = jnp.full((SUB, LANE), -1, jnp.int32)
            iout_ref[0] = jnp.full((SUB, LANE), -1, jnp.int32)
            u_ref[0] = jnp.zeros((SUB, LANE), jnp.float32)
            v_ref[0] = jnp.zeros((SUB, LANE), jnp.float32)
            if variant == "trivial":
                return

            def fetch_col(ref, idx):
                base = pl.multiple_of((idx // LANE) * LANE, LANE)
                block = ref[:, pl.ds(base, LANE)]
                onehot = lane_iota == (idx - base)
                return jnp.sum(jnp.where(onehot, block, jnp.zeros_like(block)),
                               axis=1, keepdims=True)

            def set_obj(k, inst):
                i = jnp.where(inst < 0, n_inst, inst)
                col = fetch_col(inst_ref, i)
                m = [col[r, 0] for r in range(12)]
                sl = slice(k * SSUB, (k + 1) * SSUB)
                wox = o_ref[0, 0, sl, :]
                woy = o_ref[0, 1, sl, :]
                woz = o_ref[0, 2, sl, :]
                wdx = d_ref[0, 0, sl, :]
                wdy = d_ref[0, 1, sl, :]
                wdz = d_ref[0, 2, sl, :]
                obj_ref[0, sl, :] = m[0] * wox + m[1] * woy + m[2] * woz + m[3]
                obj_ref[1, sl, :] = m[4] * wox + m[5] * woy + m[6] * woz + m[7]
                obj_ref[2, sl, :] = m[8] * wox + m[9] * woy + m[10] * woz + m[11]
                dx = m[0] * wdx + m[1] * wdy + m[2] * wdz
                dy = m[4] * wdx + m[5] * wdy + m[6] * wdz
                dz = m[8] * wdx + m[9] * wdy + m[10] * wdz
                obj_ref[3, sl, :] = dx
                obj_ref[4, sl, :] = dy
                obj_ref[5, sl, :] = dz
                obj_ref[6, sl, :] = 1.0 / dx
                obj_ref[7, sl, :] = 1.0 / dy
                obj_ref[8, sl, :] = 1.0 / dz

            for k in range(NSTREAM):
                set_obj(k, jnp.int32(-1))
            if variant == "init":
                return

            if variant == "whiletriv":
                # a data-dependent while loop with a trivial body: tests
                # whether the loop's mere presence serializes the pipeline
                def body(c):
                    t_ref[0] = t_ref[0] * 0.9999
                    return c + 1

                jax.lax.while_loop(
                    lambda c: c < meta_ref[0, 2] % 7 + 4, body, jnp.int32(0))
                return

            if variant == "fetch8":
                # 8 dependent scene fetches (the per-program floor a real
                # 8-deep walk would pay with zero vector work)
                def body(i, idx):
                    col = fetch_col(scene_ref, idx % scene_ref.shape[1])
                    return idx + 1 + col[48, 0] % 2

                jax.lax.fori_loop(0, 8, body, jnp.int32(0))
                return

        return kernel

    @functools.partial(jax.jit, static_argnames=("variant",))
    def run(meta, ps, o4, d4, tl3, variant):
        T = o4.shape[0]
        kernel = make_kernel(variant)
        meta_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        scene_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        tile3 = pl.BlockSpec((1, 3, SUB, LANE), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        tile1 = pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        out_shapes = (
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),
        )
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[meta_spec] + [scene_spec] * 3 + [smem_spec]
            + [tile3, tile3, tile1],
            out_specs=(tile1, tile1, tile1, tile1, tile1),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((9, SUB, LANE), jnp.float32),
                pltpu.SMEM((NSTREAM, STACK_DEPTH, 2), jnp.int32),
            ],
        )(meta, ps.scene_t, ps.tri_t, ps.inst_t, ps.root_t, o4, d4, tl3)

    import json
    results = {}
    for variant in ("trivial", "init", "whiletriv", "fetch8"):
        np.asarray(run(meta, ps, o4, d4, tl3, variant)[0])  # compile+warm
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(run(meta, ps, o4, d4, tl3, variant)[0])
            best = min(best, time.perf_counter() - t0)
        per_prog = best / T * 1e6
        results[variant] = round(per_prog, 2)
        print(f"{variant:8s} {best*1e3:8.1f} ms  {per_prog:8.2f} us/program",
              file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
