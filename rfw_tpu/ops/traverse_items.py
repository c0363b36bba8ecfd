"""Pallas phase-B kernel: per-item single-BLAS walks (two-phase traversal).

Round-3 groundwork for the incoherent-ray gap (docs/ROUND2.md "Still
open"). Phase A (render.twophase.tlas_entries, jnp) walks ONLY the TLAS
per bounce ray and emits each ray's K nearest instance entries. This
module is phase B: the (ray, entry) items are sorted by instance and
scattered into sub-tile-aligned runs, so every (SSUB, LANE) stream
sub-tile walks EXACTLY ONE BLAS from its root — coherent by
construction, which is what the shared-stack kernel needs (wall time per
sub-tile scales with the visit UNION of its rays).

The kernel is a strict subset of ops.traverse: same transposed scene
columns (PallasScene, unchanged), same dense treelet leaf test, same
8-wide internal descent — minus the TLAS level and minus mid-walk
instance switching (each stream's instance is fixed for the whole walk,
read once from SMEM). Less code per grid step also means a lower fixed
step cost (the ~650us fixed cost is code-size-driven; see
docs/ROUND2.md cost-model facts).

Measured go/no-go stats backing this design (tools/bench_traverse on
real pica bounce rays): 1.09 items/ray mean at K=8, p50 = 0, full-list
truncation 0.7%, items concentrated per instance (#0: 36%) -> long
single-instance runs, negligible expansion cost.

Reference anchor: the reference's two-level MBVH traversal
(backends/gpu-rt intersection.glsl:106-167); the ray-by-BLAS binning is
the TPU-specific addition (no per-warp stacks to hide divergence with).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rfw_tpu.accel.bvh_cpu import TREELET
from rfw_tpu.ops.traverse import (
    LANE,
    PallasScene,
    STACK_DEPTH,
    TGROUPS,
    TLANES,
    TSHIFT,
    KERNEL_MAX_ITERS,
    auto_chunk,
)
# the items pipeline runs its OWN stream shape (RFW_NSTREAM_ITEMS x
# RFW_SSUB_ITEMS), decoupled from the classic kernel's RFW_NSTREAM —
# see traverse.NSTREAM_TP for the measured coupling cost. Its stream
# WIDTH (sublanes per single-instance run) is its own knob: the classic
# kernel's RFW_SSUB A/B showed phases 1/3 are constant-instruction in
# the sub-tile height ((2,128) ops burn a full (8,128) vreg), so wider
# runs serve more rays per instruction. The cost here is run-alignment
# padding (every same-instance run pads to a STILE boundary:
# n_inst * STILE worst-case extra slots) plus the SSUB-unrolled dense
# leaf test. RFW_SSUB_ITEMS overrides for A/B.
from rfw_tpu.ops.traverse import NSTREAM_TP as NSTREAM
from rfw_tpu.render.intersect import Hit, T_MAX, T_MIN

import os as _os

SSUB = int(_os.environ.get("RFW_SSUB_ITEMS", str(max(1, 8 // NSTREAM))))
# sub-8-row tiles (NSTREAM*SSUB < 8) waste full (8,128) vregs per the
# cost note above — reject override combos that build them
assert SSUB in (1, 2, 4, 8) and NSTREAM * SSUB >= 8, \
    f"RFW_SSUB_ITEMS={SSUB} (NSTREAM_ITEMS={NSTREAM}: need NSTREAM*SSUB >= 8)"
SUB = NSTREAM * SSUB
LANES = SUB * LANE

#: items per stream sub-tile; every run of same-instance items is padded
#: to a STILE boundary so each stream walks exactly one BLAS
STILE = SSUB * LANE

#: instance-arena threshold for the dense (R,I) phase-A scan; above it the
#: quadratic slab grid loses to the Pallas TLAS-walk kernel
DENSE_A_MAX_INST = int(__import__("os").environ.get("RFW_DENSE_A_MAX", "512"))


def _items_chunk(ps: PallasScene, tri_hbm: bool,
                 any_hit: bool = False) -> int:
    """VMEM-adaptive grid-step batch for the items kernel (closest-hit
    step planes match the classic kernel: 7 in + 5 out; the lean any-hit
    variant is 7 in + 1 out + 1 scratch t plane; sinst is SMEM)."""
    scratch_b = 4 * (10 if any_hit else 9) * SUB * LANE
    resident = 4 * (ps.scene_t.size + ps.inst_t.size + ps.root_t.size)
    if tri_hbm:
        scratch_b += 4 * NSTREAM * TREELET * LANE
    else:
        resident += 4 * ps.tri_t.size
    planes = 8 if any_hit else 12
    return auto_chunk(resident, 4 * planes * SUB * LANE, scratch_b)


class _W(NamedTuple):
    """Per-stream fixed-instance walk state."""

    node: jax.Array
    sp: jax.Array
    done: jax.Array


def _items_kernel_factory(batch: int, tri_hbm: bool = False,
                          arity: int = 8, any_hit: bool = False):
    """One fixed-instance shared-stack walk per stream. Stream k's
    instance comes from sinst_ref[tile, k] (SMEM); its walk starts at
    that instance's BLAS root and never re-enters the TLAS.

    any_hit mirrors the classic lean occlusion kernel (ops.traverse):
    the only OUTPUT is prim (>= 0 == occluded flag), t stays a scratch
    plane holding the per-lane limit, occluded lanes are masked out of
    leaf and slab tests, and a stream retires early once every lane it
    owns is occluded."""

    def kernel(*refs):
        if any_hit:
            (meta_ref, scene_ref, tri_ref, inst_ref, root_ref, sinst_ref,
             o_ref, d_ref, tlim_ref, prim_out,
             t_scratch, obj_ref, stack_ref, *hbm_scratch) = refs
        else:
            (meta_ref, scene_ref, tri_ref, inst_ref, root_ref, sinst_ref,
             o_ref, d_ref, tlim_ref,
             t_out, prim_out, iout_out, u_out, v_out,
             obj_ref, stack_ref, *hbm_scratch) = refs
        if tri_hbm:
            tri_stage, tri_sems = hbm_scratch
        n_inst = meta_ref[0, 2]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        n_grp = tri_ref.shape[1] // LANE

        def fetch_col(ref, idx):
            # same one-hot aligned-block fetch as ops.traverse.fetch_col
            base = pl.multiple_of((idx // LANE) * LANE, LANE)
            block = ref[:, pl.ds(base, LANE)]
            is_int = jnp.issubdtype(block.dtype, jnp.integer)
            block_i = block if is_int else jax.lax.bitcast_convert_type(
                block, jnp.int32
            )
            onehot = lane_iota == (idx - base)
            col_i = jnp.sum(
                jnp.where(onehot, block_i, jnp.zeros_like(block_i)),
                axis=1, keepdims=True,
            )
            return col_i if is_int else jax.lax.bitcast_convert_type(
                col_i, jnp.float32
            )

        def tile_walk(b, o_ref, d_ref, tlim_ref, t_ref, prim_ref,
                      iout_ref, u_ref, v_ref):
            insts = [sinst_ref[b, k] for k in range(NSTREAM)]

            def safe_inv(x):
                return 1.0 / jnp.where(jnp.abs(x) < 1e-20,
                                       jnp.where(x < 0, -1e-20, 1e-20), x)

            def set_obj(k, inst):
                i = jnp.where(inst < 0, n_inst, inst)
                col = fetch_col(inst_ref, i)  # (16,1)
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
                obj_ref[6, sl, :] = safe_inv(dx)
                obj_ref[7, sl, :] = safe_inv(dy)
                obj_ref[8, sl, :] = safe_inv(dz)

            # per-stream gated init + object transform: empty runs (pack
            # padding, or runs routed to the dense kernel) skip the
            # instance-matrix fetch and all output/scratch writes — their
            # output rows stay unwritten, which every consumer masks
            # (slot_item >= 0 guards the merges; foreign rows are merged
            # away by the dense/walk class mask)
            for k in range(NSTREAM):
                @pl.when(insts[k] >= 0)
                def _(k=k):
                    sl = slice(k * SSUB, (k + 1) * SSUB)
                    t_ref[0, sl, :] = jnp.minimum(tlim_ref[0, sl, :], T_MAX)
                    prim_ref[0, sl, :] = jnp.full((SSUB, LANE), -1,
                                                  jnp.int32)
                    if not any_hit:
                        iout_ref[0, sl, :] = jnp.full((SSUB, LANE), -1,
                                                      jnp.int32)
                        u_ref[0, sl, :] = jnp.zeros((SSUB, LANE),
                                                    jnp.float32)
                        v_ref[0, sl, :] = jnp.zeros((SSUB, LANE),
                                                    jnp.float32)
                    set_obj(k, insts[k])

            def body(carry):
                walks, iters = carry
                new_walks = []

                # ---- phase 1: pop + node fetch, all streams back-to-back
                popped = []
                for k in range(NSTREAM):
                    w = walks[k]
                    do_pop = (w.node == -1) & ~w.done
                    sp = jnp.where(do_pop, w.sp - 1, w.sp)
                    spc = jnp.maximum(sp, 0)
                    node = jnp.where(do_pop, stack_ref[k, spc], w.node)
                    popped.append(w._replace(node=node, sp=sp))

                cols = [
                    fetch_col(scene_ref, jnp.maximum(popped[k].node, 0))
                    for k in range(NSTREAM)
                ]

                # ---- phase 2: dense treelet leaf test (per-stream gated)
                firsts, blks, leafs = [], [], []
                for k in range(NSTREAM):
                    w = popped[k]
                    lv = jnp.maximum(-w.node - 2, 0)
                    leafs.append((w.node <= -2) & ~w.done)
                    firsts.append((lv >> TSHIFT) << TSHIFT)
                    blks.append(lv >> TSHIFT)

                if tri_hbm:
                    # start every leaf stream's treelet DMA before any
                    # waits so the HBM fetches overlap across streams
                    for k in range(NSTREAM):
                        @pl.when(leafs[k])
                        def _(k=k):
                            gb = jnp.minimum(blks[k] // TGROUPS, n_grp - 1)
                            base = pl.multiple_of(gb * LANE, LANE)
                            pltpu.make_async_copy(
                                tri_ref.at[:, pl.ds(base, LANE)],
                                tri_stage.at[k], tri_sems.at[k],
                            ).start()

                for k in range(NSTREAM):
                    @pl.when(leafs[k])
                    def _(k=k):
                        gb = jnp.minimum(blks[k] // TGROUPS, n_grp - 1)
                        base = pl.multiple_of(gb * LANE, LANE)
                        if tri_hbm:
                            pltpu.make_async_copy(
                                tri_ref.at[:, pl.ds(base, LANE)],
                                tri_stage.at[k], tri_sems.at[k],
                            ).wait()
                            blockk = tri_stage[k]
                        else:
                            blockk = tri_ref[:, pl.ds(base, LANE)]
                        g = blks[k] % TGROUPS
                        rec = jnp.where(g == 0, blockk[:, 0:TLANES], 0.0)
                        for gg in range(1, TGROUPS):
                            rec = rec + jnp.where(
                                g == gg,
                                blockk[:, TLANES * gg:TLANES * (gg + 1)], 0.0)
                        ax = (rec[:, 0:1], rec[:, 1:2], rec[:, 2:3], rec[:, 3:4])
                        ay = (rec[:, 4:5], rec[:, 5:6], rec[:, 6:7], rec[:, 7:8])
                        az = (rec[:, 8:9], rec[:, 9:10], rec[:, 10:11],
                              rec[:, 11:12])
                        for s in range(SSUB):
                            row = k * SSUB + s
                            rsl = slice(row, row + 1)
                            ox = obj_ref[0, rsl, :]
                            oy = obj_ref[1, rsl, :]
                            oz = obj_ref[2, rsl, :]
                            dx = obj_ref[3, rsl, :]
                            dy = obj_ref[4, rsl, :]
                            dz = obj_ref[5, rsl, :]
                            opu = ax[0] * ox + ax[1] * oy + ax[2] * oz + ax[3]
                            opv = ay[0] * ox + ay[1] * oy + ay[2] * oz + ay[3]
                            opw = az[0] * ox + az[1] * oy + az[2] * oz + az[3]
                            dpu = ax[0] * dx + ax[1] * dy + ax[2] * dz
                            dpv = ay[0] * dx + ay[1] * dy + ay[2] * dz
                            dpw = az[0] * dx + az[1] * dy + az[2] * dz
                            r0 = pl.reciprocal(dpw, approx=True)
                            rw = r0 * (2.0 - dpw * r0)
                            tq = -opw * rw
                            uq = opu + tq * dpu
                            vq = opv + tq * dpv
                            tcur = t_ref[0, rsl, :]
                            ok = (
                                (uq >= -1e-7) & (vq >= -1e-7)
                                & (uq + vq <= 1 + 1e-7)
                                & (tq > T_MIN) & (tq < tcur)
                            )
                            if any_hit:
                                ok = ok & (prim_ref[0, rsl, :] < 0)
                                occl = jnp.any(ok, axis=0, keepdims=True)
                                prim_ref[0, rsl, :] = jnp.where(
                                    occl, firsts[k], prim_ref[0, rsl, :])
                                continue
                            score = jnp.where(ok, tq, jnp.float32(np.inf))
                            tmin = jnp.min(score, axis=0, keepdims=True)
                            hit_any = tmin < tcur
                            jio = jax.lax.broadcasted_iota(
                                jnp.int32, (TREELET, LANE), 0)
                            jwin = jnp.min(
                                jnp.where(score == tmin, jio, TREELET),
                                axis=0, keepdims=True)
                            onehot = jio == jwin
                            uwin = jnp.sum(jnp.where(onehot, uq, 0.0),
                                           axis=0, keepdims=True)
                            vwin = jnp.sum(jnp.where(onehot, vq, 0.0),
                                           axis=0, keepdims=True)
                            t_ref[0, rsl, :] = jnp.where(hit_any, tmin, tcur)
                            prim_ref[0, rsl, :] = jnp.where(
                                hit_any, firsts[k] + jwin, prim_ref[0, rsl, :])
                            iout_ref[0, rsl, :] = jnp.where(
                                hit_any, insts[k], iout_ref[0, rsl, :])
                            u_ref[0, rsl, :] = jnp.where(
                                hit_any, uwin, u_ref[0, rsl, :])
                            v_ref[0, rsl, :] = jnp.where(
                                hit_any, vwin, v_ref[0, rsl, :])

                # ---- phase 3: arity-wide internal test + nearest-first push
                for k in range(NSTREAM):
                    w = popped[k]
                    col = cols[k]
                    boxf = jax.lax.bitcast_convert_type(
                        col[0:6 * arity], jnp.float32)
                    sl = slice(k * SSUB, (k + 1) * SSUB)
                    ox = obj_ref[0, sl, :]
                    oy = obj_ref[1, sl, :]
                    oz = obj_ref[2, sl, :]
                    ix = obj_ref[6, sl, :]
                    iy = obj_ref[7, sl, :]
                    iz = obj_ref[8, sl, :]
                    t_best = t_ref[0, sl, :]
                    dead = prim_ref[0, sl, :] >= 0 if any_hit else None

                    is_int = (w.node >= 0) & ~w.done

                    def child_entry(code, cnt):
                        # BLAS-only: a negative child is always a treelet leaf
                        payload = -code - 1
                        blas_entry = -(payload
                                       + jnp.minimum(cnt - 1, TREELET - 1)) - 2
                        return jnp.where(code < 0, blas_entry, code)

                    next_code = jnp.int32(-1)
                    sp = w.sp
                    for c in range(arity):
                        mnx = boxf[6 * c + 0:6 * c + 1, 0:1]
                        mny = boxf[6 * c + 1:6 * c + 2, 0:1]
                        mnz = boxf[6 * c + 2:6 * c + 3, 0:1]
                        mxx = boxf[6 * c + 3:6 * c + 4, 0:1]
                        mxy = boxf[6 * c + 4:6 * c + 5, 0:1]
                        mxz = boxf[6 * c + 5:6 * c + 6, 0:1]
                        tx0 = (mnx - ox) * ix
                        tx1 = (mxx - ox) * ix
                        ty0 = (mny - oy) * iy
                        ty1 = (mxy - oy) * iy
                        tz0 = (mnz - oz) * iz
                        tz1 = (mxz - oz) * iz
                        tn = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1),
                                        jnp.minimum(ty0, ty1)),
                            jnp.minimum(tz0, tz1),
                        )
                        tf = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.maximum(tz0, tz1),
                        )
                        okl = (tn <= tf) & (tf > T_MIN) & (tn < t_best)
                        if any_hit:
                            okl = okl & ~dead
                        hitk = jnp.any(okl) & is_int

                        e_code = child_entry(
                            col[6 * arity + c, 0], col[7 * arity + c, 0])
                        do_push = hitk & (next_code != -1)

                        @pl.when(do_push)
                        def _(k=k, sp=sp, next_code=next_code):
                            slot = jnp.minimum(sp, STACK_DEPTH - 1)
                            stack_ref[k, slot] = next_code

                        sp = jnp.where(do_push,
                                       jnp.minimum(sp + 1, STACK_DEPTH), sp)
                        next_code = jnp.where(hitk, e_code, next_code)

                    was_int = w.node >= 0
                    node = jnp.where(was_int & ~w.done, next_code,
                                     jnp.int32(-1))
                    exhausted = (node == -1) & (sp <= 0)
                    done = w.done | exhausted
                    if any_hit:
                        done = done | jnp.all(prim_ref[0, sl, :] >= 0)
                    new_walks.append(w._replace(node=node, sp=sp, done=done))

                return tuple(new_walks), iters + 1

            def cond(carry):
                walks, iters = carry
                fin = walks[0].done
                for k in range(1, NSTREAM):
                    fin = fin & walks[k].done
                return (~fin) & (iters < KERNEL_MAX_ITERS)

            init = []
            for k in range(NSTREAM):
                inst = insts[k]
                iid = jnp.clip(inst, 0, jnp.maximum(n_inst - 1, 0))
                root = root_ref[0, iid]
                empty = inst < 0
                init.append(_W(node=jnp.where(empty, jnp.int32(-1), root),
                               sp=jnp.int32(0), done=empty))
            jax.lax.while_loop(cond, body, (tuple(init), jnp.int32(0)))

        def per_batch(b, _):
            s = pl.ds(b, 1)
            if any_hit:
                tile_walk(b, o_ref.at[s], d_ref.at[s], tlim_ref.at[s],
                          t_scratch, prim_out.at[s], None, None, None)
            else:
                tile_walk(b, o_ref.at[s], d_ref.at[s], tlim_ref.at[s],
                          t_out.at[s], prim_out.at[s], iout_out.at[s],
                          u_out.at[s], v_out.at[s])
            return 0

        jax.lax.fori_loop(0, batch, per_batch, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "batch",
                                              "tri_hbm", "any_hit"))
def _run_items_arrays(meta, scene_t, tri_t, inst_t, root_t, sinst,
                      o4, d4, tl3, interpret: bool = False, batch: int = 1,
                      tri_hbm: bool = False, any_hit: bool = False):
    T = o4.shape[0]
    assert T % batch == 0
    # supernode arity rides the scene_t row count (8 i32 rows per child)
    kernel = _items_kernel_factory(batch, tri_hbm, scene_t.shape[0] // 8,
                                   any_hit)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scene_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tri_spec = (pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY) if tri_hbm
                else scene_spec)
    # windowed SMEM with 8-row step groups: each grid step only needs its
    # own batch rows (the full table can't ride SMEM whole — SMEM
    # allocates ~128B per scalar, so (2640, 4) i32 is 1.35MB against the
    # 1MB budget at 1080p capacities), but a (batch, NSTREAM) block with
    # batch % 8 != 0 fails Mosaic's divisibility rule (batch=12 at
    # RFW_SSUB_ITEMS=8). So step i's rows live at i*batch8 in a repacked
    # (steps*batch8, NSTREAM) array with batch8 = batch rounded up to 8;
    # when batch is already a multiple of 8 this is the identity layout.
    batch8 = -(-batch // 8) * 8
    if batch8 != batch:
        sinst = jnp.pad(
            sinst.reshape(T // batch, batch, NSTREAM),
            ((0, 0), (0, batch8 - batch), (0, 0)), constant_values=-1,
        ).reshape(T // batch * batch8, NSTREAM)
    sinst_spec = pl.BlockSpec((batch8, NSTREAM), lambda i: (i, 0),
                              memory_space=pltpu.SMEM)
    tile3 = pl.BlockSpec((batch, 3, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    tile1 = pl.BlockSpec((batch, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    if any_hit:
        out_shapes = jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32)  # prim
    else:
        out_shapes = (
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),  # t
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),  # prim
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),  # inst
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),  # u
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),  # v
        )
    scratch = ([pltpu.VMEM((1, SUB, LANE), jnp.float32)] if any_hit
               else []) + [
        pltpu.VMEM((9, SUB, LANE), jnp.float32),
        pltpu.SMEM((NSTREAM, STACK_DEPTH), jnp.int32),
    ]
    if tri_hbm:
        scratch += [
            pltpu.VMEM((NSTREAM, TREELET, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((NSTREAM,)),
        ]
    return pl.pallas_call(
        kernel,
        grid=(T // batch,),
        in_specs=[smem_spec, scene_spec, tri_spec, scene_spec,
                  smem_spec, sinst_spec]
        + [tile3, tile3, tile1],
        out_specs=tile1 if any_hit else (tile1,) * 5,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(meta, scene_t, tri_t, inst_t, root_t, sinst, o4, d4, tl3)


#: dense items tier: instances whose mesh has at most this many triangles
#: run an ALL-TREELET dense test instead of the BLAS walk. Their runs
#: replace the latency-bound while-iterations (pop + dependent node
#: fetch + 8-child slab test each) with nblk <= MAX/512 sequential
#: aligned block fetches + pure VPU treelet tests: the fetch index is a
#: loop counter, so nothing in the chain is latency-bound, and a whole
#: (TREELET, 128) block (8 treelets = 512 triangles) tests against the
#: run's items in ~64 broadcast-madd epilogues. Mesh tri ranges are
#: TREELET-aligned (pack._align_leaf_tris), so treelet groups never
#: span meshes and one scalar in-range gate per group suffices.
#:
#: MEASURED OFF by default (docs/ROUND5.md queues 13/14): on the pica
#: bounce population the tier is parity with the walk at best — items
#: tool 2.29 vs 2.44 Mrays/s, e2e 9.21 (all-dense) vs 9.22 anchor —
#: consistent with the round-4 wide-arity lesson that per-iteration
#: cost on this toolchain is instruction-streaming-bound: the dense
#: kernel's fatter iterations (16 treelet-group epilogues per block per
#: stream) cost what the walk's thinner ones do, and the second
#: pallas_call adds a compile to every program. RFW_DENSE_ITEMS=1
#: opts in (exactness is proven: bit-identical to the walk on chip).
DENSE_MAX_TRIS = int(_os.environ.get("RFW_DENSE_MAX_TRIS", "4096"))


def _dense_kernel_factory(batch: int, any_hit: bool = False):
    """All-treelet dense runs: stream k's instance comes from
    sinst_ref[tile, k] (SMEM, -1 = skip); its mesh's treelet range comes
    from the tlo/thi SMEM tables (ops.traverse.prepare_pallas_scene).
    Outputs/contract identical to _items_kernel_factory (closest form),
    so runs can be routed between the two kernels per instance class and
    the planes merged by the class mask."""

    def kernel(*refs):
        if any_hit:
            (meta_ref, tri_ref, inst_ref, tlo_ref, thi_ref, sinst_ref,
             o_ref, d_ref, tlim_ref, prim_out, t_scratch, obj_ref) = refs
        else:
            (meta_ref, tri_ref, inst_ref, tlo_ref, thi_ref, sinst_ref,
             o_ref, d_ref, tlim_ref,
             t_out, prim_out, iout_out, u_out, v_out, obj_ref) = refs
        n_inst = meta_ref[0, 2]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        n_grp = tri_ref.shape[1] // LANE

        def fetch_col(ref, idx):
            base = pl.multiple_of((idx // LANE) * LANE, LANE)
            block = ref[:, pl.ds(base, LANE)]
            onehot = lane_iota == (idx - base)
            return jnp.sum(jnp.where(onehot, block, jnp.zeros_like(block)),
                           axis=1, keepdims=True)

        def tile_dense(b, o_ref, d_ref, tlim_ref, t_ref, prim_ref,
                       iout_ref, u_ref, v_ref):
            insts = [sinst_ref[b, k] for k in range(NSTREAM)]

            def set_obj(k, inst):
                # world->object transform only: the dense test needs no
                # inverse-direction rows (no slab tests)
                i = jnp.where(inst < 0, n_inst, inst)
                col = fetch_col(inst_ref, i)  # (16,1)
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
                obj_ref[3, sl, :] = m[0] * wdx + m[1] * wdy + m[2] * wdz
                obj_ref[4, sl, :] = m[4] * wdx + m[5] * wdy + m[6] * wdz
                obj_ref[5, sl, :] = m[8] * wdx + m[9] * wdy + m[10] * wdz

            tlos, this_, blk0s, nbs = [], [], [], []
            for k in range(NSTREAM):
                # gated init + transform: foreign/empty runs (walk-class,
                # pack padding) write nothing — their rows are merged away
                # by the class mask / slot_item guards downstream
                @pl.when(insts[k] >= 0)
                def _(k=k):
                    sl = slice(k * SSUB, (k + 1) * SSUB)
                    t_ref[0, sl, :] = jnp.minimum(tlim_ref[0, sl, :],
                                                  T_MAX)
                    prim_ref[0, sl, :] = jnp.full((SSUB, LANE), -1,
                                                  jnp.int32)
                    if not any_hit:
                        iout_ref[0, sl, :] = jnp.full((SSUB, LANE), -1,
                                                      jnp.int32)
                        u_ref[0, sl, :] = jnp.zeros((SSUB, LANE),
                                                    jnp.float32)
                        v_ref[0, sl, :] = jnp.zeros((SSUB, LANE),
                                                    jnp.float32)
                    set_obj(k, insts[k])
                iid = jnp.clip(insts[k], 0, jnp.maximum(n_inst - 1, 0))
                tlo = tlo_ref[0, iid]
                thi = thi_ref[0, iid]
                blk0 = tlo // TGROUPS
                nb = jnp.where(insts[k] < 0, 0,
                               (thi + TGROUPS - 1) // TGROUPS - blk0)
                tlos.append(tlo)
                this_.append(thi)
                blk0s.append(blk0)
                nbs.append(nb)
            maxb = nbs[0]
            for k in range(1, NSTREAM):
                maxb = jnp.maximum(maxb, nbs[k])

            def body(c, _):
                for k in range(NSTREAM):
                    go = c < nbs[k]
                    if any_hit:
                        # early stream retirement: once every lane of the
                        # stream is occluded, remaining blocks are moot
                        sl = slice(k * SSUB, (k + 1) * SSUB)
                        go = go & ~jnp.all(prim_ref[0, sl, :] >= 0)

                    @pl.when(go)
                    def _(k=k):
                        gb = jnp.minimum(blk0s[k] + c, n_grp - 1)
                        base = pl.multiple_of(gb * LANE, LANE)
                        blockk = tri_ref[:, pl.ds(base, LANE)]
                        for gg in range(TGROUPS):
                            tt = gb * TGROUPS + gg
                            @pl.when((tt >= tlos[k]) & (tt < this_[k]))
                            def _(gg=gg, tt=tt, k=k, blockk=blockk):
                                rec = blockk[:, TLANES * gg:TLANES * (gg + 1)]
                                ax = (rec[:, 0:1], rec[:, 1:2],
                                      rec[:, 2:3], rec[:, 3:4])
                                ay = (rec[:, 4:5], rec[:, 5:6],
                                      rec[:, 6:7], rec[:, 7:8])
                                az = (rec[:, 8:9], rec[:, 9:10],
                                      rec[:, 10:11], rec[:, 11:12])
                                first = tt << TSHIFT
                                for s in range(SSUB):
                                    row = k * SSUB + s
                                    rsl = slice(row, row + 1)
                                    ox = obj_ref[0, rsl, :]
                                    oy = obj_ref[1, rsl, :]
                                    oz = obj_ref[2, rsl, :]
                                    dx = obj_ref[3, rsl, :]
                                    dy = obj_ref[4, rsl, :]
                                    dz = obj_ref[5, rsl, :]
                                    opu = (ax[0] * ox + ax[1] * oy
                                           + ax[2] * oz + ax[3])
                                    opv = (ay[0] * ox + ay[1] * oy
                                           + ay[2] * oz + ay[3])
                                    opw = (az[0] * ox + az[1] * oy
                                           + az[2] * oz + az[3])
                                    dpu = ax[0] * dx + ax[1] * dy + ax[2] * dz
                                    dpv = ay[0] * dx + ay[1] * dy + ay[2] * dz
                                    dpw = az[0] * dx + az[1] * dy + az[2] * dz
                                    r0 = pl.reciprocal(dpw, approx=True)
                                    rw = r0 * (2.0 - dpw * r0)
                                    tq = -opw * rw
                                    uq = opu + tq * dpu
                                    vq = opv + tq * dpv
                                    tcur = t_ref[0, rsl, :]
                                    ok = (
                                        (uq >= -1e-7) & (vq >= -1e-7)
                                        & (uq + vq <= 1 + 1e-7)
                                        & (tq > T_MIN) & (tq < tcur)
                                    )
                                    if any_hit:
                                        ok = ok & (prim_ref[0, rsl, :] < 0)
                                        occl = jnp.any(ok, axis=0,
                                                       keepdims=True)
                                        prim_ref[0, rsl, :] = jnp.where(
                                            occl, first,
                                            prim_ref[0, rsl, :])
                                        continue
                                    score = jnp.where(
                                        ok, tq, jnp.float32(np.inf))
                                    tmin = jnp.min(score, axis=0,
                                                   keepdims=True)
                                    hit_any = tmin < tcur
                                    jio = jax.lax.broadcasted_iota(
                                        jnp.int32, (TREELET, LANE), 0)
                                    jwin = jnp.min(
                                        jnp.where(score == tmin, jio,
                                                  TREELET),
                                        axis=0, keepdims=True)
                                    onehot = jio == jwin
                                    uwin = jnp.sum(
                                        jnp.where(onehot, uq, 0.0),
                                        axis=0, keepdims=True)
                                    vwin = jnp.sum(
                                        jnp.where(onehot, vq, 0.0),
                                        axis=0, keepdims=True)
                                    t_ref[0, rsl, :] = jnp.where(
                                        hit_any, tmin, tcur)
                                    prim_ref[0, rsl, :] = jnp.where(
                                        hit_any, first + jwin,
                                        prim_ref[0, rsl, :])
                                    iout_ref[0, rsl, :] = jnp.where(
                                        hit_any, insts[k],
                                        iout_ref[0, rsl, :])
                                    u_ref[0, rsl, :] = jnp.where(
                                        hit_any, uwin, u_ref[0, rsl, :])
                                    v_ref[0, rsl, :] = jnp.where(
                                        hit_any, vwin, v_ref[0, rsl, :])
                return 0

            jax.lax.fori_loop(0, maxb, body, 0)

        def per_batch(b, _):
            s = pl.ds(b, 1)
            if any_hit:
                tile_dense(b, o_ref.at[s], d_ref.at[s], tlim_ref.at[s],
                           t_scratch, prim_out.at[s], None, None, None)
            else:
                tile_dense(b, o_ref.at[s], d_ref.at[s], tlim_ref.at[s],
                           t_out.at[s], prim_out.at[s], iout_out.at[s],
                           u_out.at[s], v_out.at[s])
            return 0

        jax.lax.fori_loop(0, batch, per_batch, 0)

    return kernel


def _dense_chunk(ps: PallasScene, any_hit: bool = False) -> int:
    """VMEM-adaptive grid-step batch for the dense kernel: no supernode
    array, no stack — just the treelet arena + instance matrices + the
    (6, SUB, LANE) object-space scratch (+ the any-hit t plane)."""
    scratch_b = 4 * (7 if any_hit else 6) * SUB * LANE
    resident = 4 * (ps.tri_t.size + ps.inst_t.size
                    + ps.root_t.size + ps.tlo_t.size + ps.thi_t.size)
    planes = 8 if any_hit else 12
    return auto_chunk(resident, 4 * planes * SUB * LANE, scratch_b)


@functools.partial(jax.jit, static_argnames=("interpret", "batch",
                                              "any_hit"))
def _run_dense_arrays(meta, tri_t, inst_t, tlo_t, thi_t, sinst,
                      o4, d4, tl3, interpret: bool = False, batch: int = 1,
                      any_hit: bool = False):
    T = o4.shape[0]
    assert T % batch == 0
    kernel = _dense_kernel_factory(batch, any_hit)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    batch8 = -(-batch // 8) * 8
    if batch8 != batch:
        sinst = jnp.pad(
            sinst.reshape(T // batch, batch, NSTREAM),
            ((0, 0), (0, batch8 - batch), (0, 0)), constant_values=-1,
        ).reshape(T // batch * batch8, NSTREAM)
    sinst_spec = pl.BlockSpec((batch8, NSTREAM), lambda i: (i, 0),
                              memory_space=pltpu.SMEM)
    tile3 = pl.BlockSpec((batch, 3, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    tile1 = pl.BlockSpec((batch, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    if any_hit:
        out_shapes = jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32)  # prim
        out_specs = tile1
        scratch = [pltpu.VMEM((1, SUB, LANE), jnp.float32),
                   pltpu.VMEM((6, SUB, LANE), jnp.float32)]
    else:
        out_shapes = (
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),  # t
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),  # prim
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),  # inst
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),  # u
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),  # v
        )
        out_specs = (tile1,) * 5
        scratch = [pltpu.VMEM((6, SUB, LANE), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=(T // batch,),
        in_specs=[smem_spec, vmem_spec, vmem_spec, smem_spec, smem_spec,
                  sinst_spec] + [tile3, tile3, tile1],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(meta, tri_t, inst_t, tlo_t, thi_t, sinst, o4, d4, tl3)


def _compact_entries(ents_inst, compact_cap: int):
    """Scatter the valid (ray, entry) items of an (R,K) entry table into a
    dense compact buffer of static size `compact_cap` (ray-major order).

    Valid entries form a PREFIX of each ray's K-list (the K-nearest insert
    keeps ascending t with +inf empties), so item (r,k)'s compact position
    is exclusive_cumsum(counts)[r] + k — no sort needed. Returns
    (citem (compact_cap,) i32 item index r*K+k or -1,
     ray_overflow (R,) bool: ray had a valid item dropped)."""
    R, K = ents_inst.shape
    i32 = jnp.int32
    valid = ents_inst >= 0
    cnt = jnp.sum(valid.astype(i32), axis=1)
    offs = jnp.cumsum(cnt) - cnt  # exclusive
    dest = offs[:, None] + jnp.arange(K, dtype=i32)[None]
    ray_overflow = jnp.any(valid & (dest >= compact_cap), axis=1)
    dest = jnp.where(valid & (dest < compact_cap), dest, compact_cap)
    item_idx = jnp.arange(R * K, dtype=i32).reshape(R, K)
    citem = (jnp.full(compact_cap + 1, -1, i32)
             .at[dest.reshape(-1)].set(item_idx.reshape(-1))[:compact_cap])
    return citem, ray_overflow


def _pack_compact(citem, inst_flat, n_inst: int, capacity: int):
    """Instance-sort the COMPACT item buffer and scatter into STILE-aligned
    runs (same output contract as _pack_items but the sort touches only
    compact_cap slots, not R*K — the round-2 pack argsorted 4.2M mostly-
    empty slots for 181ms; this is the compact-before-sort fix).

    Returns (slot_item (C,), stream_inst (C/STILE,), cap_overflow_sorted
    (compact_cap,) bool + sitem (compact_cap,) for mapping overflow back
    to rays)."""
    Ccap = citem.shape[0]
    i32 = jnp.int32
    ckey = jnp.where(citem >= 0,
                     inst_flat[jnp.maximum(citem, 0)], n_inst).astype(i32)
    # stable: preserves ray-major order inside each instance run (phase-B
    # sub-tiles then hold consecutive rays — coherent origins)
    skey, sitem = jax.lax.sort((ckey, citem), num_keys=1, is_stable=True)

    counts = jnp.zeros(n_inst + 1, i32).at[ckey].add(1)
    padded = -(-counts[:n_inst] // STILE) * STILE
    starts = jnp.concatenate(
        [jnp.zeros(1, i32), jnp.cumsum(padded).astype(i32)])
    iota = jnp.arange(Ccap, dtype=i32)
    new = jnp.concatenate(
        [jnp.ones(1, bool), skey[1:] != skey[:-1]]
    ) if Ccap > 1 else jnp.ones(1, bool)
    run_start = jax.lax.cummax(jnp.where(new, iota, 0))
    rank = iota - run_start
    dest = starts[jnp.minimum(skey, n_inst)] + rank
    ok = (skey < n_inst) & (dest < capacity)
    cap_overflow = (skey < n_inst) & ~ok
    dest = jnp.where(ok, dest, capacity)
    slot_item = jnp.full(capacity + 1, -1, i32).at[dest].set(sitem)[:capacity]
    first = slot_item[jnp.arange(capacity // STILE, dtype=i32) * STILE]
    stream_inst = jnp.where(
        first >= 0, inst_flat[jnp.maximum(first, 0)], -1).astype(i32)
    return slot_item, stream_inst, cap_overflow, sitem


def twophase_closest_fused(ps: PallasScene, ray_o, ray_d, t_limit=T_MAX,
                           K: int = 8, items_per_ray: float = 1.5,
                           n_inst_static: int | None = None,
                           interpret: bool = False,
                           tri_hbm: bool = False,
                           dense: bool | None = None):
    """Fully-traceable two-phase closest hit: Pallas TLAS-entries kernel ->
    compact-before-sort pack -> fixed-instance Pallas item walks ->
    scatter-min per-ray merge. No host syncs (safe inside render_sample's
    jit); per-ray `t_limit` supported (dead lanes pass 0 and cost nothing
    in either kernel).

    Returns (Hit, truncated). `truncated` rays (full K-list with the best
    hit beyond the last kept entry, or items dropped at either static
    capacity) need a classic-kernel retrace —
    twophase_closest_with_fallback does that with a compacted buffer.

    Reference anchor: two-level MBVH traversal (backends/gpu-rt
    intersection.glsl:106-167); binning rays by BLAS is the TPU-specific
    design (docs/ROUND2.md two-phase plan + measurements)."""
    from rfw_tpu.ops.traverse_entries import pallas_tlas_entries
    from rfw_tpu.render.twophase import dense_tlas_entries

    R = ray_o.shape[0]
    i32 = jnp.int32
    # static instance alphabet for the counting/alignment arrays: the
    # instance-arena capacity (inst_box rows); root_t's SMEM lane padding
    # (2048) would over-size the per-instance STILE allowance badly
    n_inst = n_inst_static or ps.inst_box_min.shape[0]
    tl_ray = jnp.broadcast_to(jnp.asarray(t_limit, jnp.float32), (R,))

    if ps.inst_box_min.shape[0] <= DENSE_A_MAX_INST:
        # small instance pools: the dense (R,I) slab scan beats the TLAS
        # walk kernel outright (no dependent fetches, no visit unions)
        ents = dense_tlas_entries(ps.inst_box_min, ps.inst_box_max,
                                  ray_o, ray_d, tl_ray, K=K)
    else:
        ents = pallas_tlas_entries(ps, ray_o, ray_d, tl_ray, K=K,
                                   interpret=interpret)
    inst_flat = ents.inst.reshape(-1)

    # static capacities from the ray count: the kernel capacity covers the
    # compact items plus worst-case per-instance STILE alignment padding
    Ccap = max(LANES, -(-int(R * items_per_ray) // LANES) * LANES)
    C = Ccap + n_inst * STILE
    C = -(-C // LANES) * LANES

    citem, ray_ovf = _compact_entries(ents.inst, Ccap)
    slot_item, stream_inst, cap_ovf_sorted, sitem = _pack_compact(
        citem, inst_flat, n_inst, C)
    cap_ovf_ray = (jnp.zeros(R + 1, i32)
                   .at[jnp.where(cap_ovf_sorted, sitem // K, R)]
                   .max(cap_ovf_sorted.astype(i32))[:R] > 0)

    # per-slot world rays; empty slots get t_limit -inf (nothing passes).
    # ONE (R,7) table gather instead of three: XLA row-gather cost is per
    # ROW, not per element (measured 159ms for split o/d/tl gathers at
    # C=3.2M; fusing the table halves the row count)
    ray_id = jnp.maximum(slot_item, 0) // K
    od = jnp.concatenate([ray_o, ray_d, tl_ray[:, None]], axis=1)  # (R,7)
    od_s = od[ray_id]
    o_s = od_s[:, 0:3]
    d_s = od_s[:, 3:6]
    tl_s = jnp.where(slot_item >= 0, od_s[:, 6], -jnp.inf)

    T = C // LANES
    o4 = o_s.reshape(T, SUB, LANE, 3).transpose(0, 3, 1, 2)
    d4 = d_s.reshape(T, SUB, LANE, 3).transpose(0, 3, 1, 2)
    tl3 = tl_s.reshape(T, SUB, LANE)
    sinst = stream_inst.reshape(T, NSTREAM)

    batch = min(_items_chunk(ps, tri_hbm), T)
    n_steps = -(-T // batch)
    pad = n_steps * batch - T
    if pad:
        o4 = jnp.concatenate([o4, jnp.zeros((pad,) + o4.shape[1:], o4.dtype)])
        d4 = jnp.concatenate([d4, jnp.ones((pad,) + d4.shape[1:], d4.dtype)])
        tl3 = jnp.concatenate(
            [tl3, jnp.full((pad,) + tl3.shape[1:], -jnp.inf, tl3.dtype)])
        sinst = jnp.concatenate(
            [sinst, jnp.full((pad, NSTREAM), -1, sinst.dtype)])

    meta = jnp.stack([jnp.asarray(ps.tlas_root, i32),
                      jnp.asarray(ps.n_tri, i32),
                      jnp.asarray(ps.n_inst, i32),
                      jnp.zeros((), i32)])[None]
    if dense is None:
        dense = _os.environ.get("RFW_DENSE_ITEMS", "0") == "1"
    # SMEM prices scalars at ~128B each (docs/ROUND4.md): the two
    # (1, Ipad) range tables fit the ~1MB budget only up to one
    # 2048-lane bucket — bigger instance arenas keep the walk
    dense = dense and not tri_hbm and ps.tlo_t.shape[1] <= 2048
    if dense:
        # route each run by its instance's mesh size: small meshes take
        # the all-treelet dense kernel (sequential block fetches + pure
        # VPU treelet tests, no latency-bound walk), the rest keep the
        # BLAS walk. Both kernels run the full grid with foreign runs
        # masked to -1 (they exit before any traversal work), and the
        # planes merge by the class mask.
        tlo_s = ps.tlo_t[0, jnp.clip(sinst, 0, ps.tlo_t.shape[1] - 1)]
        thi_s = ps.thi_t[0, jnp.clip(sinst, 0, ps.thi_t.shape[1] - 1)]
        nt = thi_s - tlo_s
        dense_k = ((sinst >= 0) & (nt > 0)
                   & (nt <= DENSE_MAX_TRIS // TREELET))
        sinst_w = jnp.where(dense_k, -1, sinst)
        sinst_d = jnp.where(dense_k, sinst, -1)
        t_s, prim_s, inst_s, u_s, v_s = _run_items_arrays(
            meta, ps.scene_t, ps.tri_t, ps.inst_t, ps.root_t, sinst_w,
            o4, d4, tl3, interpret=interpret, batch=batch, tri_hbm=tri_hbm)
        batch_d = min(_dense_chunk(ps), o4.shape[0])
        pad_d = (-o4.shape[0]) % batch_d
        if pad_d:
            o4d = jnp.concatenate(
                [o4, jnp.zeros((pad_d,) + o4.shape[1:], o4.dtype)])
            d4d = jnp.concatenate(
                [d4, jnp.ones((pad_d,) + d4.shape[1:], d4.dtype)])
            tl3d = jnp.concatenate(
                [tl3, jnp.full((pad_d,) + tl3.shape[1:], -jnp.inf,
                               tl3.dtype)])
            sd = jnp.concatenate(
                [sinst_d, jnp.full((pad_d, NSTREAM), -1, sinst_d.dtype)])
        else:
            o4d, d4d, tl3d, sd = o4, d4, tl3, sinst_d
        t_d, prim_d, inst_d, u_d, v_d = _run_dense_arrays(
            meta, ps.tri_t, ps.inst_t, ps.tlo_t, ps.thi_t, sd,
            o4d, d4d, tl3d, interpret=interpret, batch=batch_d)
        n4 = o4.shape[0]
        dmask = jnp.repeat(dense_k, SSUB, axis=1)[:, :, None]
        t_s = jnp.where(dmask, t_d[:n4], t_s)
        prim_s = jnp.where(dmask, prim_d[:n4], prim_s)
        inst_s = jnp.where(dmask, inst_d[:n4], inst_s)
        u_s = jnp.where(dmask, u_d[:n4], u_s)
        v_s = jnp.where(dmask, v_d[:n4], v_s)
    else:
        t_s, prim_s, inst_s, u_s, v_s = _run_items_arrays(
            meta, ps.scene_t, ps.tri_t, ps.inst_t, ps.root_t, sinst,
            o4, d4, tl3, interpret=interpret, batch=batch, tri_hbm=tri_hbm)
    t_f = t_s[:T].reshape(C)
    prim_f = prim_s[:T].reshape(C)
    inst_f = inst_s[:T].reshape(C)
    u_f = u_s[:T].reshape(C)
    v_f = v_s[:T].reshape(C)

    # ---- per-ray merge by scatter-min (no R*K unpack: the round-2 merge
    # materialized 4 (R,K) arrays; this touches C slots + R rows) ----
    hit_ok = (slot_item >= 0) & (prim_f >= 0)
    rid = jnp.where(hit_ok, slot_item // K, R)
    tmin = jnp.full(R + 1, jnp.inf, jnp.float32).at[rid].min(
        jnp.where(hit_ok, t_f, jnp.inf))
    is_win = hit_ok & (t_f == tmin[rid])
    slot_iota = jnp.arange(C, dtype=i32)
    win_slot = jnp.full(R + 1, C, i32).at[rid].min(
        jnp.where(is_win, slot_iota, C))[:R]
    has = win_slot < C
    ws = jnp.minimum(win_slot, C - 1)
    hit = Hit(
        jnp.where(has, t_f[ws], tl_ray),
        jnp.where(has, prim_f[ws], -1),
        jnp.where(has, inst_f[ws], -1),
        jnp.where(has, u_f[ws], 0.0),
        jnp.where(has, v_f[ws], 0.0),
    )
    full = ents.inst[:, K - 1] >= 0
    truncated = ((full & (hit.t > ents.t_entry[:, K - 1]))
                 | ray_ovf | cap_ovf_ray)
    return hit, truncated


def twophase_closest_with_fallback(ps: PallasScene, ray_o, ray_d,
                                   t_limit=T_MAX, K: int = 8,
                                   items_per_ray: float = 1.5,
                                   n_inst_static: int | None = None,
                                   fallback_frac: int = 64,
                                   interpret: bool = False,
                                   tri_hbm: bool = False,
                                   dense: bool | None = None) -> Hit:
    """Two-phase closest hit with the exact-result contract: truncated
    rays (measured 0.7% on pica bounce rays at K=8) are compacted with a
    static-size nonzero and retraced through the classic two-level kernel.

    The fallback buffer holds R/fallback_frac rays (>=20x the measured
    truncation rate at the default K); in the pathological overflow case
    the surplus rays keep their two-phase hit, which is the nearest hit
    among each ray's K nearest instances — a sane approximation, never
    garbage."""
    from rfw_tpu.ops.traverse import pallas_closest_hit

    R = ray_o.shape[0]
    hit, trunc = twophase_closest_fused(
        ps, ray_o, ray_d, t_limit, K=K, items_per_ray=items_per_ray,
        n_inst_static=n_inst_static, interpret=interpret, tri_hbm=tri_hbm,
        dense=dense)

    F = max(LANES, -(-(R // fallback_frac) // LANES) * LANES)
    idx = jnp.nonzero(trunc, size=F, fill_value=R)[0].astype(jnp.int32)
    sel = idx < R
    ic = jnp.minimum(idx, R - 1)
    o_f = ray_o[ic]
    d_f = ray_d[ic]
    # retrace bounded by the two-phase hit: it is an upper bound on the
    # true t (a dropped instance can only contain a NEARER hit), so the
    # classic kernel culls everything beyond it and exits early; a retrace
    # miss then means "the two-phase hit was already correct"
    tl_f = jnp.where(sel, hit.t[ic] * (1.0 + 1e-4) + 1e-5, 0.0)
    fhit = pallas_closest_hit(ps, o_f, d_f, tl_f, interpret=interpret,
                              tri_hbm=tri_hbm)
    improved = sel & (fhit.prim >= 0)

    def put(base, val):
        base_f = base[ic]
        return (jnp.concatenate([base, base[-1:]])
                .at[idx].set(jnp.where(improved, val, base_f))[:R])

    return Hit(
        put(hit.t, fhit.t),
        put(hit.prim, fhit.prim),
        put(hit.inst, fhit.inst),
        put(hit.u, fhit.u),
        put(hit.v, fhit.v),
    )


def twophase_occluded_fused(ps: PallasScene, ray_o, ray_d, t_limit,
                            K: int = 8, items_per_ray: float = 1.5,
                            n_inst_static: int | None = None,
                            interpret: bool = False,
                            tri_hbm: bool = False,
                            dense: bool | None = None):
    """Two-phase ANY-HIT: the bounce-vertex NEE shadow rays share the
    closest path's shape (sorted incoherent origins), so they get the same
    ray-binned treatment — TLAS entries, single-instance stream runs, then
    the LEAN any-hit item kernel (prim-flag output only, occluded lanes
    masked out, early stream retirement — mirroring ops.traverse's
    classic any-hit variant).

    Returns (occluded (R,) bool, undecided (R,) bool): `undecided` rays
    are NOT occluded by their K nearest instances but had a full entry
    list or dropped items — an unseen instance could still occlude, so
    they need a classic retrace (twophase_occluded_with_fallback).
    Zero-t_limit lanes produce no entries and cost nothing in either
    kernel (the NEE dead-lane contract).

    Reference anchor: ray_shadow.comp's compacted shadow-queue occlusion
    pass (backends/gpu-rt/shaders/ray_shadow.comp:1-268)."""
    from rfw_tpu.ops.traverse_entries import pallas_tlas_entries
    from rfw_tpu.render.twophase import dense_tlas_entries

    R = ray_o.shape[0]
    i32 = jnp.int32
    n_inst = n_inst_static or ps.inst_box_min.shape[0]
    tl_ray = jnp.broadcast_to(jnp.asarray(t_limit, jnp.float32), (R,))

    if ps.inst_box_min.shape[0] <= DENSE_A_MAX_INST:
        ents = dense_tlas_entries(ps.inst_box_min, ps.inst_box_max,
                                  ray_o, ray_d, tl_ray, K=K)
    else:
        ents = pallas_tlas_entries(ps, ray_o, ray_d, tl_ray, K=K,
                                   interpret=interpret)
    inst_flat = ents.inst.reshape(-1)

    Ccap = max(LANES, -(-int(R * items_per_ray) // LANES) * LANES)
    C = Ccap + n_inst * STILE
    C = -(-C // LANES) * LANES

    citem, ray_ovf = _compact_entries(ents.inst, Ccap)
    slot_item, stream_inst, cap_ovf_sorted, sitem = _pack_compact(
        citem, inst_flat, n_inst, C)
    cap_ovf_ray = (jnp.zeros(R + 1, i32)
                   .at[jnp.where(cap_ovf_sorted, sitem // K, R)]
                   .max(cap_ovf_sorted.astype(i32))[:R] > 0)

    ray_id = jnp.maximum(slot_item, 0) // K
    od = jnp.concatenate([ray_o, ray_d, tl_ray[:, None]], axis=1)  # (R,7)
    od_s = od[ray_id]
    o_s = od_s[:, 0:3]
    d_s = od_s[:, 3:6]
    tl_s = jnp.where(slot_item >= 0, od_s[:, 6], -jnp.inf)

    T = C // LANES
    o4 = o_s.reshape(T, SUB, LANE, 3).transpose(0, 3, 1, 2)
    d4 = d_s.reshape(T, SUB, LANE, 3).transpose(0, 3, 1, 2)
    tl3 = tl_s.reshape(T, SUB, LANE)
    sinst = stream_inst.reshape(T, NSTREAM)

    batch = min(_items_chunk(ps, tri_hbm, any_hit=True), T)
    n_steps = -(-T // batch)
    pad = n_steps * batch - T
    if pad:
        o4 = jnp.concatenate([o4, jnp.zeros((pad,) + o4.shape[1:], o4.dtype)])
        d4 = jnp.concatenate([d4, jnp.ones((pad,) + d4.shape[1:], d4.dtype)])
        tl3 = jnp.concatenate(
            [tl3, jnp.full((pad,) + tl3.shape[1:], -jnp.inf, tl3.dtype)])
        sinst = jnp.concatenate(
            [sinst, jnp.full((pad, NSTREAM), -1, sinst.dtype)])

    meta = jnp.stack([jnp.asarray(ps.tlas_root, i32),
                      jnp.asarray(ps.n_tri, i32),
                      jnp.asarray(ps.n_inst, i32),
                      jnp.zeros((), i32)])[None]
    if dense is None:
        dense = _os.environ.get("RFW_DENSE_ITEMS", "0") == "1"
    # SMEM prices scalars at ~128B each (docs/ROUND4.md): the two
    # (1, Ipad) range tables fit the ~1MB budget only up to one
    # 2048-lane bucket — bigger instance arenas keep the walk
    dense = dense and not tri_hbm and ps.tlo_t.shape[1] <= 2048
    if dense:
        tlo_s = ps.tlo_t[0, jnp.clip(sinst, 0, ps.tlo_t.shape[1] - 1)]
        thi_s = ps.thi_t[0, jnp.clip(sinst, 0, ps.thi_t.shape[1] - 1)]
        nt = thi_s - tlo_s
        dense_k = ((sinst >= 0) & (nt > 0)
                   & (nt <= DENSE_MAX_TRIS // TREELET))
        sinst_w = jnp.where(dense_k, -1, sinst)
        sinst_d = jnp.where(dense_k, sinst, -1)
        prim_s = _run_items_arrays(
            meta, ps.scene_t, ps.tri_t, ps.inst_t, ps.root_t, sinst_w,
            o4, d4, tl3, interpret=interpret, batch=batch, tri_hbm=tri_hbm,
            any_hit=True)
        batch_d = min(_dense_chunk(ps, any_hit=True), o4.shape[0])
        pad_d = (-o4.shape[0]) % batch_d
        if pad_d:
            o4d = jnp.concatenate(
                [o4, jnp.zeros((pad_d,) + o4.shape[1:], o4.dtype)])
            d4d = jnp.concatenate(
                [d4, jnp.ones((pad_d,) + d4.shape[1:], d4.dtype)])
            tl3d = jnp.concatenate(
                [tl3, jnp.full((pad_d,) + tl3.shape[1:], -jnp.inf,
                               tl3.dtype)])
            sd = jnp.concatenate(
                [sinst_d, jnp.full((pad_d, NSTREAM), -1, sinst_d.dtype)])
        else:
            o4d, d4d, tl3d, sd = o4, d4, tl3, sinst_d
        prim_d = _run_dense_arrays(
            meta, ps.tri_t, ps.inst_t, ps.tlo_t, ps.thi_t, sd,
            o4d, d4d, tl3d, interpret=interpret, batch=batch_d,
            any_hit=True)
        dmask = jnp.repeat(dense_k, SSUB, axis=1)[:, :, None]
        prim_s = jnp.where(dmask, prim_d[:o4.shape[0]], prim_s)
    else:
        prim_s = _run_items_arrays(
            meta, ps.scene_t, ps.tri_t, ps.inst_t, ps.root_t, sinst,
            o4, d4, tl3, interpret=interpret, batch=batch, tri_hbm=tri_hbm,
            any_hit=True)
    prim_f = prim_s[:T].reshape(C)

    # per-ray OR by scatter-max
    hit_ok = (slot_item >= 0) & (prim_f >= 0)
    rid = jnp.where(hit_ok, slot_item // K, R)
    occluded = (jnp.zeros(R + 1, i32).at[rid].max(
        hit_ok.astype(i32))[:R] > 0)

    full = ents.inst[:, K - 1] >= 0
    undecided = (full | ray_ovf | cap_ovf_ray) & ~occluded
    return occluded, undecided


def twophase_occluded_with_fallback(ps: PallasScene, ray_o, ray_d, t_limit,
                                    K: int = 8, items_per_ray: float = 1.5,
                                    n_inst_static: int | None = None,
                                    fallback_frac: int = 64,
                                    interpret: bool = False,
                                    tri_hbm: bool = False,
                                    dense: bool | None = None):
    """Exact-result two-phase occlusion: undecided rays (full K-list or
    dropped items, and not yet occluded) are compacted and retraced with
    the classic any-hit kernel. Surplus rays beyond the static fallback
    buffer keep `occluded=False` — conservative for NEE (light leaks are
    bounded by the buffer being >= 20x the measured truncation rate, and
    the estimator stays unbiased in the limit: the classic path is used
    whenever capacity allows)."""
    from rfw_tpu.ops.traverse import pallas_occluded

    R = ray_o.shape[0]
    tl_ray = jnp.broadcast_to(jnp.asarray(t_limit, jnp.float32), (R,))
    occ, undecided = twophase_occluded_fused(
        ps, ray_o, ray_d, tl_ray, K=K, items_per_ray=items_per_ray,
        n_inst_static=n_inst_static, interpret=interpret, tri_hbm=tri_hbm,
        dense=dense)

    F = max(LANES, -(-(R // fallback_frac) // LANES) * LANES)
    idx = jnp.nonzero(undecided, size=F, fill_value=R)[0].astype(jnp.int32)
    sel = idx < R
    ic = jnp.minimum(idx, R - 1)
    o_f = ray_o[ic]
    d_f = ray_d[ic]
    tl_f = jnp.where(sel, tl_ray[ic], 0.0)
    focc = pallas_occluded(ps, o_f, d_f, tl_f, interpret=interpret,
                           tri_hbm=tri_hbm)
    occ_i = occ.astype(jnp.int32)
    merged = (jnp.concatenate([occ_i, occ_i[-1:]])
              .at[idx].max((sel & focc).astype(jnp.int32))[:R])
    return merged > 0


@functools.partial(jax.jit, static_argnames=("n_inst", "capacity"))
def _pack_items(inst, n_inst: int, capacity: int):
    """Sort (ray, entry) items by instance and scatter them into runs
    aligned to STILE slots, so each stream sub-tile is single-instance.

    Returns (slot_item (C,) i32 item index or -1, stream_inst (C/STILE,)
    i32 instance or -1, overflow (N,) bool: valid item dropped for
    capacity). All shapes static; capacity must be a LANES multiple."""
    N = inst.shape[0]
    i32 = jnp.int32
    valid = inst >= 0
    key = jnp.where(valid, inst, n_inst).astype(i32)
    order = jnp.argsort(key)  # stable: keeps ray order within a run
    s = key[order]
    iota = jnp.arange(N, dtype=i32)

    counts = jnp.zeros(n_inst + 1, i32).at[key].add(1)
    padded = -(-counts[:n_inst] // STILE) * STILE
    starts = jnp.concatenate(
        [jnp.zeros(1, i32), jnp.cumsum(padded).astype(i32)])  # (n_inst+1,)

    new = jnp.concatenate(
        [jnp.ones(1, bool), s[1:] != s[:-1]]) if N > 1 else jnp.ones(1, bool)
    run_start = jax.lax.cummax(jnp.where(new, iota, 0))
    rank = iota - run_start
    dest = starts[jnp.minimum(s, n_inst)] + rank
    ok = (s < n_inst) & (dest < capacity)
    overflow_sorted = (s < n_inst) & ~ok
    dest = jnp.where(ok, dest, capacity)  # sacrificial slot

    slot_item = jnp.full(capacity + 1, -1, i32).at[dest].set(order)[:capacity]
    overflow = jnp.zeros(N, bool).at[order].set(overflow_sorted)

    # a run fills contiguously from its aligned start, so any stream range
    # holding items holds one at its first slot
    first = slot_item[jnp.arange(capacity // STILE, dtype=i32) * STILE]
    stream_inst = jnp.where(first >= 0, inst[jnp.maximum(first, 0)], -1)
    return slot_item, stream_inst.astype(i32), overflow


def pallas_twophase_closest_hit(ps: PallasScene, scene, ray_o, ray_d,
                                t_limit=T_MAX, K: int = 8,
                                capacity_tiles: int | None = None,
                                interpret: bool = False):
    """Two-phase closest hit, phase B on the Pallas kernel.

    Phase A (jnp TLAS walk) -> pack items into single-instance stream
    sub-tiles -> fixed-instance kernel walks -> per-ray min-t merge.
    Returns (Hit, truncated): `truncated` rays (full K-list with a hit
    beyond the last kept entry, or items dropped for capacity) must be
    retraced with the classic kernel — same fallback contract as
    render.twophase.twophase_closest_hit.

    Not yet the product path: the glue between the jitted pieces runs
    eagerly (dispatch overhead over the axon tunnel); round 3 fuses it.
    """
    from rfw_tpu.render.twophase import tlas_entries

    R = ray_o.shape[0]
    # under jax.jit(prepare_pallas_scene) the int fields come back as
    # device scalars; coerce (JAX caches the host copy per array object,
    # so repeat calls don't re-pull over the tunnel)
    n_inst = int(ps.n_inst)
    if n_inst == 0:
        t = jnp.broadcast_to(jnp.asarray(t_limit, jnp.float32), (R,))
        miss = jnp.full(R, -1, jnp.int32)
        z = jnp.zeros(R, jnp.float32)
        return Hit(t, miss, miss, z, z), jnp.zeros(R, bool)

    ents = tlas_entries(
        jnp.asarray(scene.tlas_wide_f), jnp.asarray(scene.tlas_wide_i),
        ray_o, ray_d, t_limit, K=K)
    inst_flat = ents.inst.reshape(-1)
    N = R * K
    if capacity_tiles is None:
        # N item slots (mostly empty at the measured 1.09 items/ray) plus
        # 16 tiles of alignment-padding allowance (~64 instance runs);
        # `truncated` + the classic-kernel fallback cover pathological
        # scenes, so the default optimizes grid-step count, not worst case
        # (ps.n_inst is the padded arena capacity — NOT the live count)
        capacity_tiles = max(1, -(-N // LANES)) + 16
    C = capacity_tiles * LANES
    slot_item, stream_inst, overflow = _pack_items(inst_flat, n_inst, C)

    # per-slot world rays (the kernel re-bases into object space once per
    # stream); empty slots get t_limit = -inf so nothing can pass a test
    ray_id = jnp.maximum(slot_item, 0) // K
    o_s = ray_o[ray_id]
    d_s = ray_d[ray_id]
    tl_s = jnp.where(slot_item >= 0,
                     jnp.broadcast_to(jnp.asarray(t_limit, jnp.float32), (C,)),
                     -jnp.inf)

    T = C // LANES
    o4 = o_s.reshape(T, SUB, LANE, 3).transpose(0, 3, 1, 2)
    d4 = d_s.reshape(T, SUB, LANE, 3).transpose(0, 3, 1, 2)
    tl3 = tl_s.reshape(T, SUB, LANE)
    sinst = stream_inst.reshape(T, NSTREAM)

    batch = min(_items_chunk(ps, False), T)
    n_steps = -(-T // batch)
    pad = n_steps * batch - T
    if pad:
        o4 = jnp.concatenate([o4, jnp.zeros((pad,) + o4.shape[1:], o4.dtype)])
        d4 = jnp.concatenate([d4, jnp.ones((pad,) + d4.shape[1:], d4.dtype)])
        tl3 = jnp.concatenate(
            [tl3, jnp.full((pad,) + tl3.shape[1:], -jnp.inf, tl3.dtype)])
        sinst = jnp.concatenate(
            [sinst, jnp.full((pad, NSTREAM), -1, sinst.dtype)])

    meta = jnp.asarray(
        [[int(ps.tlas_root), int(ps.n_tri), n_inst, 0]], jnp.int32)
    t_s, prim_s, inst_s, u_s, v_s = _run_items_arrays(
        meta, ps.scene_t, ps.tri_t, ps.inst_t, ps.root_t, sinst,
        o4, d4, tl3, interpret=interpret, batch=batch)
    if pad:
        t_s, prim_s, inst_s, u_s, v_s = (
            x[:T] for x in (t_s, prim_s, inst_s, u_s, v_s))

    # slot results -> item results (N+1 scratch row absorbs empty slots)
    idx = jnp.where(slot_item >= 0, slot_item, N)
    def unpack(x, fill, dtype):
        return jnp.full(N + 1, fill, dtype).at[idx].set(x.reshape(C))[:N]
    t_i = unpack(t_s, jnp.inf, jnp.float32).reshape(R, K)
    prim_i = unpack(prim_s, -1, jnp.int32).reshape(R, K)
    u_i = unpack(u_s, 0.0, jnp.float32).reshape(R, K)
    v_i = unpack(v_s, 0.0, jnp.float32).reshape(R, K)

    # per-ray min-t merge; misses carry t_limit (kernel init), dropped
    # slots inf — prefer real hits, clamp the final t back to t_limit
    t_rank = jnp.where(prim_i >= 0, t_i, jnp.inf)
    j = jnp.argmin(t_rank, axis=1)
    rows = jnp.arange(R)
    prim_sel = prim_i[rows, j]
    t_lim_b = jnp.broadcast_to(jnp.asarray(t_limit, jnp.float32), (R,))
    hit = Hit(
        jnp.where(prim_sel >= 0, t_i[rows, j], t_lim_b),
        prim_sel,
        jnp.where(prim_sel >= 0, ents.inst[rows, j], -1),
        u_i[rows, j], v_i[rows, j],
    )
    full = ents.inst[:, K - 1] >= 0
    truncated = (full & (hit.t > ents.t_entry[:, K - 1])
                 | overflow.reshape(R, K).any(axis=1))
    return hit, truncated
