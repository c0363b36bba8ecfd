"""Pallas packet-traversal kernel — the speed-of-light path.

The jnp packet traversal (render.packet) advances ALL tiles in lockstep
through one XLA while_loop: every iteration costs the full ray front, so
wall time scales with the *worst* tile's node-visit count. This kernel
gives every tile its own in-VMEM traversal loop, and — the key TPU
insight — runs NSTREAM independent sub-tile walks *interleaved* inside
one program:

  * a dynamic VMEM fetch is latency-bound (~1.5us measured, independent
    of row count, one fetch in flight per dependent chain). Interleaving
    K independent walks overlaps their fetches: measured 1460/693/345/183
    ns-per-fetch at K=1/2/4/8. NSTREAM=4 sub-tiles of (2,128) rays walk
    the tree concurrently in one scalar program;
  * smaller (256-ray) sub-tiles also shrink the per-tile stack *union*
    (a shared-stack tile visits the union of its rays' node sets, so
    divergent rays blow up visit counts) — interleaving buys latency
    hiding AND coherence at once;
  * the whole scene sits in VMEM as ONE i32 array (box floats bitcast;
    integer bit patterns must never transit float relayouts — TPU
    flushes denormals), so each node visit is a single latency-bound
    fetch instead of two;
  * box/triangle values feed the VPU via (1,1) vector slices broadcast
    against the ray tiles — no scalar-unit extracts on the hot path;
    only child codes/counts (stack control flow) round-trip to scalars;
  * two-level TLAS->BLAS: entering an instance re-bases a sub-tile's
    rays into object space once, cached in VMEM scratch per stream.

The TPU equivalent of the reference's stackful per-warp traversal
(gpu-rt intersection.glsl:106-167).

Node-code encoding (same as render.packet):
    code >= 0  internal wide node;  code == -1 pop;
    code <= -2 triangle leaf (v = -code-2; first = v>>3 [8-aligned],
    count = (v&7)+1).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rfw_tpu.render.intersect import Hit, T_MAX, T_MIN

LANE = 128
NSTREAM = 4  # interleaved independent walks per program (latency hiding)
SSUB = 2  # sublanes per stream: each walk owns a (2,128) = 256-ray sub-tile
SUB = NSTREAM * SSUB
LANES = SUB * LANE  # rays per grid program (1024)
STACK_DEPTH = 96
MAX_LEAF = 8  # leaf capacity (8-aligned blocks; count-1 in 3 bits)
#: hard per-walk iteration cap: converts accidental infinite traversal into
#: a terminating (wrong) result instead of a TPU watchdog kill
KERNEL_MAX_ITERS = 1 << 19
# scene arrays bigger than this fall back to the jnp packet path
# (16MB scoped vmem - ~4MB chunk in/out buffers - margin)
VMEM_SCENE_BUDGET = int(11.5 * 1024 * 1024)


class PallasScene(NamedTuple):
    """Transposed column layouts for the 8-wide supernode traversal.

    VMEM tiles are (8,128): records live in the lane dimension so nothing
    lane-pads. A supernode fetch is one aligned-block one-hot reduction of
    the merged (64, Spad) i32 array. Box coordinates are f32 bit patterns
    stored as i32 (the reduction runs in the INT domain: child-code bit
    patterns are NaNs/denormals that float relayouts would canonicalize)."""

    scene_t: jax.Array  # (64, Spad) i32: rows 0..47 box f32 bits (child k
    #   rows 6k..6k+5 = min3|max3), rows 48..55 child codes, 56..63 counts
    tri_t: jax.Array  # (128, Bpad) f32 block-major: column b holds the 8
    #   triangles of leaf block b, 16 floats each (rows 16j..16j+8 =
    #   v0,e1,e2 of triangle 8b+j) — one leaf = ONE column fetch
    inst_t: jax.Array  # (16, Ipad+1) f32: world->object; last col = identity
    root_t: jax.Array  # (1, Ipad) i32 in SMEM: blas8 root per instance
    tlas_root: int
    n_tri: int
    n_inst: int

    @property
    def vmem_bytes(self) -> int:
        return 4 * (self.scene_t.size + self.tri_t.size
                    + self.inst_t.size + self.root_t.size)


def _bucket(n: int, mult: int = 2048) -> int:
    """Pad lane counts to 2048-lane steps: coarse enough that dynamic
    rebuilds (stable row capacities from pack) share compiled kernels,
    fine enough not to waste the 16MB scoped-VMEM budget (pow2 buckets
    wasted up to 45% on big triangle arenas)."""
    return max(mult, -(-n // mult) * mult)


def _pad_lanes(a: jax.Array, mult: int = 2048) -> jax.Array:
    n = a.shape[1]
    pad = _bucket(n, mult) - n
    if pad:
        a = jnp.concatenate([a, jnp.zeros((a.shape[0], pad), a.dtype)], axis=1)
    return a


def pallas_scene_bytes(scene) -> int:
    """Exact byte footprint `prepare_pallas_scene` will produce for this
    TraceScene (all arrays f32/i32). Used by traversal auto-selection; must
    track the padding in `_pad_lanes`/`_bucket` exactly, or selection can
    pick a scene the kernel can't fit in scoped VMEM."""
    supers = _bucket(int(scene.blas8_box.shape[0]) + int(scene.tlas8_box.shape[0]))
    blocks = _bucket(max(-(-int(scene.tri_v0.shape[0]) // 8), 1), 256)
    insts = _bucket(int(scene.inst_matrix.shape[0]) + 1)
    roots = _bucket(max(int(scene.inst_matrix.shape[0]), 1))
    return 4 * (64 * supers + 128 * blocks + 16 * insts + roots)


def prepare_pallas_scene(scene) -> PallasScene:
    """Build transposed 8-wide kernel arrays from a TraceScene. Pure jnp:
    safe on device arrays or traced inside jit."""
    nb8 = int(scene.blas8_box.shape[0])
    t_code = jnp.asarray(scene.tlas8_code)
    t_code = jnp.where(t_code >= 0, t_code + nb8, t_code)
    box8 = jnp.concatenate(
        [jnp.asarray(scene.blas8_box), jnp.asarray(scene.tlas8_box)]
    ).astype(jnp.float32)
    code8 = jnp.concatenate([jnp.asarray(scene.blas8_code), t_code]).astype(jnp.int32)
    cnt8 = jnp.concatenate(
        [jnp.asarray(scene.blas8_cnt), jnp.asarray(scene.tlas8_cnt)]
    ).astype(jnp.int32)
    box_bits = jax.lax.bitcast_convert_type(box8, jnp.int32)  # (S,48)
    merged = jnp.concatenate([box_bits, code8, cnt8], axis=1)  # (S,64) i32
    scene_t = _pad_lanes(merged.T)

    n_tri = int(scene.tri_v0.shape[0])
    if n_tri:
        tri = jnp.concatenate(
            [jnp.asarray(scene.tri_v0), jnp.asarray(scene.tri_e1),
             jnp.asarray(scene.tri_e2)], axis=1
        ).astype(jnp.float32)
    else:
        tri = jnp.zeros((8, 9), jnp.float32)
    rows = tri.shape[0]
    pad8 = -(-rows // 8) * 8 - rows  # pack 8-aligns; defensive for others
    if pad8:
        tri = jnp.concatenate([tri, jnp.zeros((pad8, 9), jnp.float32)])
    tri16 = jnp.concatenate([tri, jnp.zeros((tri.shape[0], 7), jnp.float32)], axis=1)
    # block-major: row b of (B,128) = leaf block b's 8 triangles x 16 floats
    tri_t = _pad_lanes(tri16.reshape(-1, 128).T, mult=256)

    n_inst = int(scene.inst_matrix.shape[0])
    if n_inst:
        inv12 = jnp.asarray(scene.inst_inv)[:, :3, :].reshape(-1, 12)
    else:
        inv12 = jnp.zeros((0, 12), jnp.float32)
    ident = jnp.array([[1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0]], jnp.float32)
    inv12 = jnp.concatenate([inv12, ident]).astype(jnp.float32)
    inv16 = jnp.concatenate([inv12, jnp.zeros((inv12.shape[0], 4), jnp.float32)], axis=1)
    inst_t = _pad_lanes(inv16.T)
    ident_col = inv12.shape[0] - 1

    roots = (jnp.asarray(scene.blas8_root).astype(jnp.int32)
             if n_inst else jnp.zeros(1, jnp.int32))
    root_t = _pad_lanes(roots[None, :])  # (1, Ipad) — lives in SMEM

    return PallasScene(
        scene_t=scene_t,
        tri_t=tri_t,
        inst_t=inst_t,
        root_t=root_t,
        tlas_root=nb8,
        n_tri=n_tri,
        n_inst=ident_col,
    )


class _Walk(NamedTuple):
    """Per-stream traversal state carried through the while loop."""

    node: jax.Array
    inst: jax.Array
    cached: jax.Array
    sp: jax.Array
    done: jax.Array


def _traverse_kernel_factory(any_hit: bool):
    """NSTREAM interleaved predicated walks over transposed scene columns.

    Each while iteration advances every live stream one node visit. Loads
    for all streams are issued back-to-back (program order) before their
    uses, so the ~1.5us dynamic-fetch latency overlaps across streams.
    Leaf triangle fetches interleave the same way (per-slot j, all
    streams' loads issue together)."""

    def kernel(
        meta_ref,  # SMEM (1,4) i32: [tlas_root, n_tri, n_inst(=ident col), 0]
        scene_ref, tri_ref, inst_ref, root_ref,  # scene (VMEM/SMEM)
        o_ref, d_ref, tlim_ref,  # per-tile inputs
        t_ref, prim_ref, iout_ref, u_ref, v_ref,  # per-tile outputs
        obj_ref,  # VMEM scratch (9, SUB, LANE): object-space rays per stream
        stack_ref,  # SMEM scratch (NSTREAM, STACK_DEPTH, 2) i32
    ):
        tlas_root = meta_ref[0, 0]
        n_tri = meta_ref[0, 1]
        n_inst = meta_ref[0, 2]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

        def fetch_col(ref, idx):
            """Column `idx` of a transposed (rows, Npad) array: lane-dim
            dynamic slices must be 128-aligned in Mosaic, so load the
            aligned block and reduce out the wanted lane with a one-hot
            mask (int domain — bit-exact)."""
            base = pl.multiple_of((idx // LANE) * LANE, LANE)
            block = ref[:, pl.ds(base, LANE)]  # (rows,128)
            is_int = jnp.issubdtype(block.dtype, jnp.integer)
            block_i = block if is_int else jax.lax.bitcast_convert_type(
                block, jnp.int32
            )
            onehot = lane_iota == (idx - base)
            col_i = jnp.sum(
                jnp.where(onehot, block_i, jnp.zeros_like(block_i)),
                axis=1, keepdims=True,
            )  # (rows,1) exact bit patterns
            return col_i if is_int else jax.lax.bitcast_convert_type(
                col_i, jnp.float32
            )

        def srows(ref, k):
            """Stream k's (SSUB, LANE) sub-tile of a (..., SUB, LANE) ref."""
            return ref[0, ..., k * SSUB:(k + 1) * SSUB, :]

        t_ref[0] = jnp.minimum(tlim_ref[0], T_MAX)
        prim_ref[0] = jnp.full((SUB, LANE), -1, jnp.int32)
        iout_ref[0] = jnp.full((SUB, LANE), -1, jnp.int32)
        u_ref[0] = jnp.zeros((SUB, LANE), jnp.float32)
        v_ref[0] = jnp.zeros((SUB, LANE), jnp.float32)

        def safe_inv(x):
            return 1.0 / jnp.where(jnp.abs(x) < 1e-20,
                                   jnp.where(x < 0, -1e-20, 1e-20), x)

        def set_obj(k, inst):
            """Re-base stream k's rays into instance object space."""
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

        for k in range(NSTREAM):
            set_obj(k, jnp.int32(-1))

        def body(carry):
            walks, iters = carry
            new_walks = []

            # ---- phase 1 (all streams): pop, instance switch, issue the
            # node fetch. Loads are emitted back-to-back so they overlap.
            popped = []
            for k in range(NSTREAM):
                w = walks[k]
                do_pop = (w.node == -1) & ~w.done
                sp = jnp.where(do_pop, w.sp - 1, w.sp)
                spc = jnp.maximum(sp, 0)
                node = jnp.where(do_pop, stack_ref[k, spc, 0], w.node)
                inst = jnp.where(do_pop, stack_ref[k, spc, 1], w.inst)

                @pl.when((inst != w.cached) & ~w.done)
                def _(k=k, inst=inst):
                    set_obj(k, inst)

                popped.append(w._replace(node=node, inst=inst, cached=inst,
                                         sp=sp))

            cols = [
                fetch_col(scene_ref, jnp.maximum(popped[k].node, 0))
                for k in range(NSTREAM)
            ]

            # ---- phase 2: leaf intersection. Leaves are 8-aligned in the
            # block-major triangle arena, so each stream's whole leaf is
            # ONE column fetch; the up-to-8 Moller-Trumbore tests then run
            # on static sublane slices of that column (vector ops only).
            firsts, counts = [], []
            for k in range(NSTREAM):
                w = popped[k]
                lv = jnp.maximum(-w.node - 2, 0)
                is_leaf = (w.node <= -2) & ~w.done
                firsts.append(lv >> 3)
                counts.append(jnp.where(is_leaf, (lv & 7) + 1, 0))

            max_count = counts[0]
            for k in range(1, NSTREAM):
                max_count = jnp.maximum(max_count, counts[k])

            n_blk = jnp.maximum((n_tri + 7) // 8 - 1, 0)

            @pl.when(max_count > 0)
            def _():
                tcols = [
                    fetch_col(
                        tri_ref,
                        jnp.minimum(
                            jnp.where(counts[k] > 0, firsts[k] >> 3, 0), n_blk
                        ),
                    )
                    for k in range(NSTREAM)
                ]
                for j in range(8):
                    for k in range(NSTREAM):
                        w = popped[k]
                        tc = tcols[k]
                        sl = slice(k * SSUB, (k + 1) * SSUB)
                        ox = obj_ref[0, sl, :]
                        oy = obj_ref[1, sl, :]
                        oz = obj_ref[2, sl, :]
                        dx = obj_ref[3, sl, :]
                        dy = obj_ref[4, sl, :]
                        dz = obj_ref[5, sl, :]
                        # (1,1) slices broadcast in the vector domain — no
                        # scalar-unit extracts on the hot path
                        r = 16 * j
                        v0x, v0y, v0z = (tc[r + 0:r + 1, 0:1],
                                         tc[r + 1:r + 2, 0:1],
                                         tc[r + 2:r + 3, 0:1])
                        e1x, e1y, e1z = (tc[r + 3:r + 4, 0:1],
                                         tc[r + 4:r + 5, 0:1],
                                         tc[r + 5:r + 6, 0:1])
                        e2x, e2y, e2z = (tc[r + 6:r + 7, 0:1],
                                         tc[r + 7:r + 8, 0:1],
                                         tc[r + 8:r + 9, 0:1])
                        px = dy * e2z - dz * e2y
                        py = dz * e2x - dx * e2z
                        pz = dx * e2y - dy * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        inv_det = jnp.where(
                            jnp.abs(det) > 1e-12,
                            1.0 / jnp.where(det == 0, 1.0, det), 0.0)
                        tvx = ox - v0x
                        tvy = oy - v0y
                        tvz = oz - v0z
                        uq = (tvx * px + tvy * py + tvz * pz) * inv_det
                        qx = tvy * e1z - tvz * e1y
                        qy = tvz * e1x - tvx * e1z
                        qz = tvx * e1y - tvy * e1x
                        vq = (dx * qx + dy * qy + dz * qz) * inv_det
                        tq = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                        tcur = t_ref[0, sl, :]
                        ok = (
                            (j < counts[k])
                            & (jnp.abs(det) > 1e-12)
                            & (uq >= -1e-7) & (vq >= -1e-7)
                            & (uq + vq <= 1 + 1e-7)
                            & (tq > T_MIN) & (tq < tcur)
                        )
                        tri_id = jnp.minimum(firsts[k] + j, n_tri - 1)
                        t_ref[0, sl, :] = jnp.where(ok, tq, tcur)
                        prim_ref[0, sl, :] = jnp.where(
                            ok, tri_id, prim_ref[0, sl, :])
                        iout_ref[0, sl, :] = jnp.where(
                            ok, w.inst, iout_ref[0, sl, :])
                        u_ref[0, sl, :] = jnp.where(ok, uq, u_ref[0, sl, :])
                        v_ref[0, sl, :] = jnp.where(ok, vq, v_ref[0, sl, :])

            # ---- phase 3: 8-wide internal test + nearest-first push.
            for k in range(NSTREAM):
                w = popped[k]
                col = cols[k]
                boxf = jax.lax.bitcast_convert_type(col[0:48], jnp.float32)
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
                in_tlas = w.inst < 0

                def child_entry(code, cnt, w=w, in_tlas=in_tlas):
                    payload = -code - 1
                    leaf_child = code < 0
                    iid = jnp.clip(payload, 0, jnp.maximum(n_inst - 1, 0))
                    tlas_entry = root_ref[0, iid]  # SMEM scalar read
                    blas_entry = -(payload * 8 + jnp.minimum(cnt - 1, 7)) - 2
                    e_code = jnp.where(
                        leaf_child,
                        jnp.where(in_tlas, tlas_entry, blas_entry), code)
                    e_inst = jnp.where(leaf_child & in_tlas, payload, w.inst)
                    return e_code, e_inst

                next_code = jnp.int32(-1)
                next_inst = w.inst
                sp = w.sp
                for c in range(8):
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
                        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1),
                    )
                    tf = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1),
                    )
                    okl = (tn <= tf) & (tf > T_MIN) & (tn < t_best)
                    if any_hit:
                        okl = okl & ~dead
                    hitk = jnp.any(okl) & is_int

                    e_code, e_inst = child_entry(col[48 + c, 0], col[56 + c, 0])
                    do_push = hitk & (next_code != -1)

                    @pl.when(do_push)
                    def _(k=k, sp=sp, next_code=next_code, next_inst=next_inst):
                        slot = jnp.minimum(sp, STACK_DEPTH - 1)
                        stack_ref[k, slot, 0] = next_code
                        stack_ref[k, slot, 1] = next_inst

                    sp = jnp.where(do_push, jnp.minimum(sp + 1, STACK_DEPTH), sp)
                    next_code = jnp.where(hitk, e_code, next_code)
                    next_inst = jnp.where(hitk, e_inst, next_inst)

                was_int = w.node >= 0
                node = jnp.where(was_int & ~w.done, next_code, jnp.int32(-1))
                inst = jnp.where(was_int & ~w.done, next_inst, w.inst)

                exhausted = (node == -1) & (sp <= 0)
                done = w.done | exhausted
                if any_hit:
                    done = done | jnp.all(prim_ref[0, sl, :] >= 0)
                new_walks.append(w._replace(node=node, inst=inst, sp=sp,
                                            done=done))

            return tuple(new_walks), iters + 1

        def cond(carry):
            walks, iters = carry
            live = walks[0].done & walks[1].done
            for k in range(2, NSTREAM):
                live = live & walks[k].done
            return (~live) & (iters < KERNEL_MAX_ITERS)

        init = tuple(
            _Walk(node=jnp.int32(tlas_root), inst=jnp.int32(-1),
                  cached=jnp.int32(-1), sp=jnp.int32(0),
                  done=jnp.bool_(False))
            for _ in range(NSTREAM)
        )
        jax.lax.while_loop(cond, body, (init, jnp.int32(0)))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "interpret"),
)
def _run_arrays(
    meta, scene_t, tri_t, inst_t, root_t, o4, d4, tl3,
    any_hit: bool,
    interpret: bool = False,
):
    T = o4.shape[0]
    kernel = _traverse_kernel_factory(any_hit)
    meta_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scene_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile3 = pl.BlockSpec((1, 3, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    tile1 = pl.BlockSpec((1, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),  # t
        jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),  # prim
        jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),  # inst
        jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),  # u
        jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),  # v
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
        interpret=interpret,
    )(meta, scene_t, tri_t, inst_t, root_t, o4, d4, tl3)


#: fixed tiles per pallas_call: the axon AOT compiler stack-allocates the
#: call's full inputs+outputs in 16MB scoped VMEM alongside the scene
#: arrays — measured ~250KB per tile (buffering included). 16 tiles (4MB)
#: + an 11.5MB scene budget keeps the worst case ~15.5MB. Fixed (not
#: scene-adaptive) so the compiled kernel is shared across scenes.
CHUNK_TILES = 16


def _run(ps: PallasScene, o4, d4, tl3, any_hit: bool, interpret: bool = False):
    T = o4.shape[0]
    meta = jnp.asarray(
        [[ps.tlas_root, ps.n_tri, ps.n_inst, 0]], jnp.int32
    )

    def call(o4c, d4c, tl3c):
        return _run_arrays(
            meta, ps.scene_t, ps.tri_t, ps.inst_t, ps.root_t,
            o4c, d4c, tl3c,
            any_hit=any_hit, interpret=interpret,
        )

    if T <= CHUNK_TILES:
        return call(o4, d4, tl3)
    # pad to a multiple of the chunk size, map over chunks, then strip
    n_chunks = -(-T // CHUNK_TILES)
    pad = n_chunks * CHUNK_TILES - T
    if pad:
        o4 = jnp.concatenate([o4, jnp.zeros((pad,) + o4.shape[1:], o4.dtype)])
        d4 = jnp.concatenate(
            [d4, jnp.ones((pad,) + d4.shape[1:], d4.dtype)]
        )  # dummy dirs avoid 0-division
        tl3 = jnp.concatenate([tl3, jnp.zeros((pad,) + tl3.shape[1:], tl3.dtype)])

    def chunk_fn(args):
        return call(*args)

    outs = jax.lax.map(
        chunk_fn,
        (
            o4.reshape(n_chunks, CHUNK_TILES, *o4.shape[1:]),
            d4.reshape(n_chunks, CHUNK_TILES, *d4.shape[1:]),
            tl3.reshape(n_chunks, CHUNK_TILES, *tl3.shape[1:]),
        ),
    )
    outs = tuple(x.reshape(n_chunks * CHUNK_TILES, *x.shape[2:])[:T] for x in outs)
    return outs


def _reshape_rays(ray_o, ray_d, t_limit):
    R = ray_o.shape[0]
    assert R % LANES == 0, f"ray count {R} not divisible by {LANES}"
    T = R // LANES
    o4 = ray_o.reshape(T, SUB, LANE, 3).transpose(0, 3, 1, 2)
    d4 = ray_d.reshape(T, SUB, LANE, 3).transpose(0, 3, 1, 2)
    tl = jnp.broadcast_to(jnp.asarray(t_limit, jnp.float32), (R,))
    tl3 = tl.reshape(T, SUB, LANE)
    return o4, d4, tl3, T, R


def pallas_closest_hit(ps: PallasScene, ray_o, ray_d, t_limit=T_MAX,
                       interpret: bool = False) -> Hit:
    o4, d4, tl3, T, R = _reshape_rays(ray_o, ray_d, t_limit)
    t, prim, inst, u, v = _run(ps, o4, d4, tl3, False, interpret)
    return Hit(t.reshape(R), prim.reshape(R), inst.reshape(R),
               u.reshape(R), v.reshape(R))


def pallas_occluded(ps: PallasScene, ray_o, ray_d, t_limit,
                    interpret: bool = False) -> jax.Array:
    o4, d4, tl3, T, R = _reshape_rays(ray_o, ray_d, t_limit)
    t, prim, inst, u, v = _run(ps, o4, d4, tl3, True, interpret)
    return (prim >= 0).reshape(R)
