"""Pallas packet-traversal kernel — the speed-of-light path.

The jnp packet traversal (render.packet) advances ALL tiles in lockstep
through one XLA while_loop: every iteration costs the full ray front, so
wall time scales with the *worst* tile's node-visit count. This kernel
gives every tile its own in-VMEM traversal loop:

  * grid = (num_tiles,); one program owns 1024 rays shaped (8,128) — the
    native VPU tile;
  * the whole scene (wide BVH arena + triangles + instance inverses) sits
    in VMEM (fits for scenes up to ~100k triangles; bigger scenes fall
    back to the jnp path until the HBM-streaming variant lands);
  * the scalar core walks the tree (pop/push on an SMEM stack, dynamic
    row reads of node/triangle data) while the VPU runs 1024-lane slab and
    Moller-Trumbore tests — the TPU equivalent of the reference's
    stackful per-warp traversal (gpu-rt intersection.glsl:106-167);
  * two-level TLAS->BLAS: entering an instance re-bases the tile's rays
    into object space once (12 scalar loads + 6 fused broadcast FMAs),
    cached in VMEM scratch until the instance changes.

Same node-code encoding as render.packet:
    code >= 0  internal wide node;  code == -1 pop;
    code <= -2 triangle leaf (v = -code-2; first = v>>3, count = v&7).
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

LANES = 512  # (4,128) — half a VPU tile: less shared-stack divergence
SUB = LANES // 128
LANE = 128
STACK_DEPTH = 96
MAX_LEAF = 4
#: hard per-tile iteration cap: converts accidental infinite traversal into
#: a terminating (wrong) result instead of a TPU watchdog kill
KERNEL_MAX_ITERS = 1 << 19
# scene arrays bigger than this fall back to the jnp packet path
# (16MB scoped vmem - ~4MB chunk in/out buffers - margin)
VMEM_SCENE_BUDGET = int(11.5 * 1024 * 1024)


class PallasScene(NamedTuple):
    """Transposed column layouts for the 8-wide supernode traversal.

    VMEM tiles are (8,128): records live in the lane dimension so nothing
    lane-pads. A supernode fetch is one aligned-block one-hot reduction of
    the (48, Spad) box array + one of the (16, Spad) int array (8 child
    codes + 8 leaf counts). Integer data stays integer end-to-end — bitcast
    int-as-float views are denormals that TPU relayouts flush to zero."""

    box8_t: jax.Array  # (48, Spad) f32: child k rows 6k..6k+5 = min3|max3
    int8_t: jax.Array  # (16, Spad) i32: rows 0..7 codes, 8..15 counts
    tri_t: jax.Array  # (16, Tpad) f32: rows 0..8 = v0,e1,e2
    inst_t: jax.Array  # (16, Ipad+1) f32: world->object; last col = identity
    root_t: jax.Array  # (1, Ipad) i32 in SMEM: blas8 root per instance
    tlas_root: int
    n_tri: int
    n_inst: int

    @property
    def vmem_bytes(self) -> int:
        return 4 * (self.box8_t.size + self.int8_t.size + self.tri_t.size
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
    tris = _bucket(max(int(scene.tri_v0.shape[0]), 1))
    insts = _bucket(int(scene.inst_matrix.shape[0]) + 1)
    roots = _bucket(max(int(scene.inst_matrix.shape[0]), 1))
    return 4 * ((48 + 16) * supers + 16 * tris + 16 * insts + roots)


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
    int8 = jnp.concatenate([code8, cnt8], axis=1)  # (S,16)
    box8_t = _pad_lanes(box8.T)
    int8_t = _pad_lanes(int8.T)

    n_tri = int(scene.tri_v0.shape[0])
    if n_tri:
        tri = jnp.concatenate(
            [jnp.asarray(scene.tri_v0), jnp.asarray(scene.tri_e1),
             jnp.asarray(scene.tri_e2)], axis=1
        ).astype(jnp.float32)
    else:
        tri = jnp.zeros((1, 9), jnp.float32)
    tri16 = jnp.concatenate([tri, jnp.zeros((tri.shape[0], 7), jnp.float32)], axis=1)
    tri_t = _pad_lanes(tri16.T)

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
        box8_t=box8_t,
        int8_t=int8_t,
        tri_t=tri_t,
        inst_t=inst_t,
        root_t=root_t,
        tlas_root=nb8,
        n_tri=n_tri,
        n_inst=ident_col,
    )


def _traverse_kernel_factory(any_hit: bool):
    """Straight-line predicated kernel over transposed scene columns.

    Per node visit: one dynamic lane-slice (16,1) column fetch + static
    sublane extracts (int fields bitcast from f32 rows 12..15), two 1024-
    lane slab tests; leaves run up to MAX_LEAF Moller-Trumbore column
    fetches. The scalar core owns the SMEM stack; an instance switch
    re-bases the tile's rays via one (16,1) inverse-matrix column."""

    def kernel(
        meta_ref,  # SMEM (1,4) i32: [tlas_root, n_tri, n_inst(=ident col), 0]
        box8_ref, int8_ref, tri_ref, inst_ref, root_ref,  # scene (VMEM)
        o_ref, d_ref, tlim_ref,  # per-tile inputs
        t_ref, prim_ref, iout_ref, u_ref, v_ref,  # per-tile outputs
        obj_ref,  # VMEM scratch (9,8,128)
        stack_ref,  # SMEM scratch (STACK_DEPTH,2) i32
    ):
        tlas_root = meta_ref[0, 0]
        n_tri = meta_ref[0, 1]
        n_inst = meta_ref[0, 2]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

        def fetch_col(ref, idx):
            """Column `idx` of a transposed (rows, Npad) array: lane-dim
            dynamic slices must be 128-aligned in Mosaic, so load the
            aligned block and reduce out the wanted lane with a one-hot
            mask. The reduction runs in the INT domain — float rows 12..15
            hold bitcast int32 child codes whose bit patterns are NaNs, and
            a float sum would canonicalize (corrupt) them."""
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

        wox = o_ref[0, 0]
        woy = o_ref[0, 1]
        woz = o_ref[0, 2]
        wdx = d_ref[0, 0]
        wdy = d_ref[0, 1]
        wdz = d_ref[0, 2]

        t_ref[0] = jnp.minimum(tlim_ref[0], T_MAX)
        prim_ref[0] = jnp.full((SUB, LANE), -1, jnp.int32)
        iout_ref[0] = jnp.full((SUB, LANE), -1, jnp.int32)
        u_ref[0] = jnp.zeros((SUB, LANE), jnp.float32)
        v_ref[0] = jnp.zeros((SUB, LANE), jnp.float32)

        def safe_inv(x):
            return 1.0 / jnp.where(jnp.abs(x) < 1e-20,
                                   jnp.where(x < 0, -1e-20, 1e-20), x)

        def set_obj(inst):
            i = jnp.where(inst < 0, n_inst, inst)
            col = fetch_col(inst_ref, i)  # (16,1)
            m = [col[k, 0] for k in range(12)]
            obj_ref[0] = m[0] * wox + m[1] * woy + m[2] * woz + m[3]
            obj_ref[1] = m[4] * wox + m[5] * woy + m[6] * woz + m[7]
            obj_ref[2] = m[8] * wox + m[9] * woy + m[10] * woz + m[11]
            obj_ref[3] = m[0] * wdx + m[1] * wdy + m[2] * wdz
            obj_ref[4] = m[4] * wdx + m[5] * wdy + m[6] * wdz
            obj_ref[5] = m[8] * wdx + m[9] * wdy + m[10] * wdz
            obj_ref[6] = safe_inv(obj_ref[3])
            obj_ref[7] = safe_inv(obj_ref[4])
            obj_ref[8] = safe_inv(obj_ref[5])

        set_obj(jnp.int32(-1))

        def body(carry):
            node, inst, cached, sp, alive, iters = carry

            # ---- pop when requested ----
            do_pop = node == -1
            sp = jnp.where(do_pop, sp - 1, sp)
            spc = jnp.maximum(sp, 0)
            node = jnp.where(do_pop, stack_ref[spc, 0], node)
            inst = jnp.where(do_pop, stack_ref[spc, 1], inst)

            @pl.when(inst != cached)
            def _():
                set_obj(inst)

            cached = inst
            ox, oy, oz = obj_ref[0], obj_ref[1], obj_ref[2]
            dx, dy, dz = obj_ref[3], obj_ref[4], obj_ref[5]
            ix, iy, iz = obj_ref[6], obj_ref[7], obj_ref[8]
            t_best = t_ref[0]

            is_leaf = node <= -2
            is_int = node >= 0

            # ---- leaf phase (masked; runs every iteration) ----
            lv = jnp.maximum(-node - 2, 0)
            first = lv >> 3
            count = jnp.where(is_leaf, lv & 7, 0)

            for k in range(MAX_LEAF):
                @pl.when(k < count)
                def _():
                    tri = jnp.minimum(first + k, n_tri - 1)
                    tc = fetch_col(tri_ref, tri)  # (16,1)
                    v0x = tc[0, 0]
                    v0y = tc[1, 0]
                    v0z = tc[2, 0]
                    e1x = tc[3, 0]
                    e1y = tc[4, 0]
                    e1z = tc[5, 0]
                    e2x = tc[6, 0]
                    e2y = tc[7, 0]
                    e2z = tc[8, 0]
                    px = dy * e2z - dz * e2y
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    inv_det = jnp.where(jnp.abs(det) > 1e-12,
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
                    ok = (
                        (jnp.abs(det) > 1e-12)
                        & (uq >= -1e-7) & (vq >= -1e-7) & (uq + vq <= 1 + 1e-7)
                        & (tq > T_MIN) & (tq < t_ref[0])
                    )
                    t_ref[0] = jnp.where(ok, tq, t_ref[0])
                    prim_ref[0] = jnp.where(ok, tri, prim_ref[0])
                    iout_ref[0] = jnp.where(ok, inst, iout_ref[0])
                    u_ref[0] = jnp.where(ok, uq, u_ref[0])
                    v_ref[0] = jnp.where(ok, vq, v_ref[0])

            # ---- internal phase (8-wide, masked) ----
            t_best = t_ref[0]  # reload: the leaf phase may have tightened it
            nsafe = jnp.maximum(node, 0)
            bcol = fetch_col(box8_ref, nsafe)  # (48,1) f32
            icol = fetch_col(int8_ref, nsafe)  # (16,1) i32

            in_tlas = inst < 0

            def child_entry(code, cnt):
                payload = -code - 1
                leaf_child = code < 0
                iid = jnp.clip(payload, 0, jnp.maximum(n_inst - 1, 0))
                tlas_entry = root_ref[0, iid]  # SMEM scalar read
                blas_entry = -(payload * 8 + jnp.minimum(cnt, 7)) - 2
                e_code = jnp.where(
                    leaf_child, jnp.where(in_tlas, tlas_entry, blas_entry), code
                )
                e_inst = jnp.where(leaf_child & in_tlas, payload, inst)
                return e_code, e_inst

            # Visit the nearest hit child next; push the rest. Running
            # nearest-selection keeps it one pass over the 8 children.
            next_code = jnp.int32(-1)
            next_inst = inst
            best_tn = jnp.float32(jnp.inf)
            for k in range(8):
                mnx = bcol[6 * k + 0, 0]
                mny = bcol[6 * k + 1, 0]
                mnz = bcol[6 * k + 2, 0]
                mxx = bcol[6 * k + 3, 0]
                mxy = bcol[6 * k + 4, 0]
                mxz = bcol[6 * k + 5, 0]
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
                    okl = okl & (prim_ref[0] < 0)
                hitk = jnp.any(okl) & is_int

                e_code, e_inst = child_entry(icol[k, 0], icol[8 + k, 0])
                do_push = hitk & (next_code != -1)

                @pl.when(do_push)
                def _():
                    slot = jnp.minimum(sp, STACK_DEPTH - 1)
                    stack_ref[slot, 0] = jnp.where(True, next_code, next_code)
                    stack_ref[slot, 1] = next_inst

                sp = jnp.where(do_push, jnp.minimum(sp + 1, STACK_DEPTH), sp)
                next_code = jnp.where(hitk, e_code, next_code)
                next_inst = jnp.where(hitk, e_inst, next_inst)

            node = jnp.where(is_int, next_code, jnp.int32(-1))
            inst = jnp.where(is_int, next_inst, inst)

            if any_hit:
                alive = jnp.any(prim_ref[0] < 0)
            return node, inst, cached, sp, alive, iters + 1

        def cond(carry):
            node, _inst, _c, sp, alive, iters = carry
            more = ((node != -1) | (sp > 0)) & (iters < KERNEL_MAX_ITERS)
            return more & alive if any_hit else more

        jax.lax.while_loop(
            cond, body,
            (jnp.int32(tlas_root), jnp.int32(-1), jnp.int32(-2), jnp.int32(0),
             jnp.bool_(True), jnp.int32(0)),
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "interpret"),
)
def _run_arrays(
    meta, box8_t, int8_t, tri_t, inst_t, root_t, o4, d4, tl3,
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
        in_specs=[meta_spec] + [scene_spec] * 4 + [smem_spec]
        + [tile3, tile3, tile1],
        out_specs=(tile1, tile1, tile1, tile1, tile1),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((9, SUB, LANE), jnp.float32),
            pltpu.SMEM((STACK_DEPTH, 2), jnp.int32),
        ],
        interpret=interpret,
    )(meta, box8_t, int8_t, tri_t, inst_t, root_t, o4, d4, tl3)


#: fixed tiles per pallas_call: the axon AOT compiler stack-allocates the
#: call's full inputs+outputs in 16MB scoped VMEM alongside the scene
#: arrays — measured ~250KB per tile (buffering included). 16 tiles (4MB)
#: + an 11.5MB scene budget keeps the worst case ~15.5MB. Fixed (not
#: scene-adaptive) so the compiled kernel is shared across scenes.
CHUNK_TILES = 32


def _run(ps: PallasScene, o4, d4, tl3, any_hit: bool, interpret: bool = False):
    T = o4.shape[0]
    meta = jnp.asarray(
        [[ps.tlas_root, ps.n_tri, ps.n_inst, 0]], jnp.int32
    )

    def call(o4c, d4c, tl3c):
        return _run_arrays(
            meta, ps.box8_t, ps.int8_t, ps.tri_t, ps.inst_t, ps.root_t,
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
