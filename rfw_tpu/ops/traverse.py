"""Pallas packet-traversal kernel — the speed-of-light path.

The jnp packet traversal (render.packet) advances ALL tiles in lockstep
through one XLA while_loop: every iteration costs the full ray front, so
wall time scales with the *worst* tile's node-visit count. This kernel
gives every tile its own in-VMEM traversal loop. Two structural choices
carry the performance (both from the round-1 roofline: a dynamic VMEM
fetch is ~1.5us latency-bound and flat in width, so the only wins are
(a) fewer dependent fetches and (b) more useful bytes per fetch):

  * NSTREAM independent sub-tile walks run *interleaved* inside one
    program, so their dependent fetch chains overlap (measured
    1460/693/345/183 ns-per-fetch at K=1/2/4/8 on v5e); smaller (256-ray)
    sub-tiles also shrink the shared-stack visit *union*;
  * leaves are fat TREELET-triangle blocks ("treelets",
    accel.bvh_cpu.TREELET) stored as aligned lane-groups of a transposed
    arena: ONE fetch brings in a whole leaf, which is then tested
    *densely* — every treelet slot against every ray of the sub-tile —
    as pure VPU broadcast math. Each triangle slot stores a precomputed
    world->unit-triangle affine (Woop's transform), so the dense test is
    12 madd columns + a plane/barycentric epilogue and a sublane
    reduction, with no cross products and no per-triangle fetches. The
    tree above the treelets is ~8x shallower than an 8-tri-leaf tree, so
    the latency-bound supernode visits collapse too.

  * the internal supernodes sit in VMEM as ONE i32 array (box floats
    bitcast; integer bit patterns must never transit float relayouts —
    TPU flushes denormals), so each node visit is a single latency-bound
    fetch;
  * box/triangle values feed the VPU via (1,1)/(T,1) vector slices
    broadcast against the ray tiles — no scalar-unit extracts on the hot
    path; only child codes (stack control flow) round-trip to scalars;
  * two-level TLAS->BLAS: entering an instance re-bases a sub-tile's
    rays into object space once, cached in VMEM scratch per stream.

The TPU equivalent of the reference's stackful per-warp traversal
(gpu-rt intersection.glsl:106-167).

Node-code encoding (same as render.packet):
    code >= 0  internal wide node;  code == -1 pop;
    code <= -2 treelet leaf (v = -code-2; first = v with low log2(TREELET)
    bits cleared [leaf ranges are TREELET-aligned], count = low bits + 1 —
    the kernel ignores count: padding slots have an all-zero affine and
    can never pass the hit test).
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
from rfw_tpu.render.intersect import Hit, T_MAX, T_MIN

import os as _os

LANE = 128
#: interleaved independent walks per program (latency hiding). RFW_NSTREAM
#: env override is an experiment knob: 8 walks of (1,128)-ray sub-tiles
#: shrink the shared-stack visit union at the cost of more unrolled code.
#: 16/32 go further: MULTIPLE (8,128) tiles' worth of rays walk in one
#: program as 16/32 single-sublane streams — total visits are unchanged
#: but they complete in max-over-more-streams iterations (the walk-union
#: simulator measured 2.3x/4.5x fewer program-iterations on bounce rays;
#: the measured per-fetch overlap is latency-perfect through K=8, and
#: 16/32 bet it extends — an on-chip A/B decides).
NSTREAM = int(_os.environ.get("RFW_NSTREAM", "4"))
assert NSTREAM in (1, 2, 4, 8, 16, 32), f"RFW_NSTREAM={NSTREAM}"
#: sublanes per stream ((SSUB,128)-ray sub-tile per walk). RFW_SSUB raises
#: it above the canonical 8//NSTREAM: phases 1/3 run on (SSUB,128) slices
#: whose instruction count is CONSTANT in SSUB (a (2,128) op already burns
#: a full (8,128) vreg), so wider streams serve more rays per instruction;
#: the cost is the wider visit union + SSUB-unrolled leaf tests. Sim
#: (tools/sim_visits --lanes): 1024-ray streams walk pica bounce rays in
#: 2.34x fewer TOTAL program-iterations than 256-ray streams at equal
#: coverage (sum of visits itself halves — locality-sorted rays share
#: their unions). Round-4 on-chip A/B (docs/ROUND4.md): SSUB=8 swept the
#: grid — kernel coherent 14.9 -> ~20-24.6 Mrays/s, sorted occluded
#: 6.9 -> 9.9, end-to-end bench 7.75 -> 9.17 within one session — so 8
#: is the DEFAULT (canonical 8//NSTREAM only for NSTREAM > 8 widths).
SSUB = int(_os.environ.get(
    "RFW_SSUB", str(8 if NSTREAM <= 8 else max(1, 8 // NSTREAM))))
assert SSUB in (1, 2, 4, 8, 16) and SSUB >= max(1, 8 // NSTREAM), \
    f"RFW_SSUB={SSUB} (NSTREAM={NSTREAM})"
SUB = NSTREAM * SSUB  # 8 rows at the defaults; more for SSUB/NSTREAM overrides
LANES = SUB * LANE  # rays per grid program (1024 at the default)
#: capped aliases: the wavefront's tile gating/swizzle (LANES8) and the
#: entries kernel's fixed tile (SUB8/LANES8) stay at the canonical
#: (8,128) granularity — the classic kernel pads internally when SUB
#: exceeds 8 (see _reshape_rays). The two-phase ITEMS kernel's stream
#: count is its own knob, NSTREAM_TP below.
NSTREAM8 = min(NSTREAM, 8)
SSUB8 = 8 // NSTREAM8
SUB8 = 8
LANES8 = SUB8 * LANE
#: two-phase pipeline stream count (items + entries kernels), DECOUPLED
#: from the classic kernel's RFW_NSTREAM. Round-4 queue 8 measured the
#: coupling cost: classic n2s16 wins the classic-kernel A/B (+2.3% e2e
#: all-classic) but LOST end-to-end (8.58 vs 8.86) because the shared
#: NSTREAM dragged the items kernel to 4-row tiles (more grid steps on
#: the bounce trace). The two-phase shape is its own knob so classic
#: stream experiments stop reshaping the bounce path; 4 is the measured
#: canonical two-phase width (docs/ROUND4.md queue 6).
NSTREAM_TP = int(_os.environ.get("RFW_NSTREAM_ITEMS", "4"))
assert NSTREAM_TP in (1, 2, 4, 8), f"RFW_NSTREAM_ITEMS={NSTREAM_TP}"
STACK_DEPTH = 96
TLANES = 16  # record lanes per treelet slot (12 affine floats + pad)
TGROUPS = LANE // TLANES  # treelets per aligned fetch block
TSHIFT = TREELET.bit_length() - 1
#: hard per-walk iteration cap: converts accidental infinite traversal into
#: a terminating (wrong) result instead of a TPU watchdog kill.
#: RFW_KMAX override is a perf-diagnostic knob ONLY (results are wrong when
#: it truncates traversal): timing at KMAX=1,2,4... decomposes per-program
#: fixed cost vs marginal per-iteration cost.

KERNEL_MAX_ITERS = int(_os.environ.get("RFW_KMAX", str(1 << 19)))
# scene arrays bigger than this fall back to the HBM-streamed-treelet
# tier (16MB scoped vmem - ~4MB chunk in/out buffers - margin)
VMEM_SCENE_BUDGET = int(11.5 * 1024 * 1024)

# HBM-streamed-treelet tier (tri_hbm=True): only the supernode/instance
# arrays must be VMEM-resident; the fat treelet arena stays in HBM and
# each leaf visit DMAs its (TREELET, 128) block into a per-stream scratch.
# Sponza-class scenes (500k+ tris, ~32MB of treelets) keep the per-tile
# traversal loop instead of dropping to the 6-10x slower jnp packet tier.
# Budget for the resident part only (tri scratch is NSTREAM*4KB).
VMEM_RESIDENT_BUDGET = int(11.5 * 1024 * 1024)


class PallasScene(NamedTuple):
    """Transposed column layouts for the treelet traversal.

    VMEM tiles are (8,128): records live in the lane dimension so nothing
    lane-pads. A supernode fetch is one aligned-block one-hot reduction of
    the merged (64, Spad) i32 array. Box coordinates are f32 bit patterns
    stored as i32 (the reduction runs in the INT domain: child-code bit
    patterns are NaNs/denormals that float relayouts would canonicalize)."""

    scene_t: jax.Array  # (8*arity, Spad) i32: rows 0..6A-1 box f32 bits
    #   (child k rows 6k..6k+5 = min3|max3), rows 6A..7A-1 child codes,
    #   7A..8A-1 counts. arity = pack-time supernode width (8 default;
    #   16 fills one 128-row column per fetch — RFW_WIDE_ARITY)
    tri_t: jax.Array  # (TREELET, TLANES*Cpad) f32: sublane j, lane group c
    #   = treelet c's slot j: a 3x4 world->unit-triangle affine in lanes
    #   16c..16c+11 (rows of [u; v; w], translation last). One leaf = one
    #   aligned (TREELET, 128) block fetch covering TGROUPS treelets.
    inst_t: jax.Array  # (16, Ipad+1) f32: world->object; last col = identity
    root_t: jax.Array  # (1, Ipad) i32 in SMEM: blas8 root per instance
    tlo_t: jax.Array  # (1, Ipad) i32 in SMEM: first TREELET index of the
    #   instance's mesh in the triangle arena (mesh ranges are
    #   TREELET-aligned — pack._align_leaf_tris)
    thi_t: jax.Array  # (1, Ipad) i32 in SMEM: one-past-last treelet index
    #   (tlo == thi for padding/absent rows — the dense items tier then
    #   never walks them)
    inst_box_min: jax.Array  # (Iarena,3) world instance AABBs (arena-padded;
    inst_box_max: jax.Array  #   padding rows inverted +inf/-inf) — consumed
    #   by the dense phase-A entry scan, not by the kernels
    tlas_root: int
    n_tri: int
    n_inst: int

    @property
    def vmem_bytes(self) -> int:
        return 4 * (self.scene_t.size + self.tri_t.size
                    + self.inst_t.size + self.root_t.size
                    + self.tlo_t.size + self.thi_t.size)


def _bucket(n: int, mult: int = 2048) -> int:
    """Pad lane counts to `mult`-lane steps: coarse enough that dynamic
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
    srows = 8 * int(scene.blas8_code.shape[1])  # 8 i32 rows per child
    rows = max(int(scene.tri_v0.shape[0]), TREELET)
    treelets = -(-rows // TREELET)
    tri_lanes = _bucket(TLANES * treelets, 512)
    insts = _bucket(int(scene.inst_matrix.shape[0]) + 1)
    roots = _bucket(max(int(scene.inst_matrix.shape[0]), 1))
    # roots + tlo_t + thi_t: three (1, Ipad) i32 SMEM tables
    return 4 * (srows * supers + TREELET * tri_lanes + 16 * insts + 3 * roots)


def pallas_resident_bytes(scene) -> int:
    """VMEM-resident footprint of the tri_hbm tier: everything except the
    treelet arena (which streams from HBM). Auto-selection compares this
    against VMEM_RESIDENT_BUDGET for scenes too big for the classic tier."""
    supers = _bucket(int(scene.blas8_box.shape[0]) + int(scene.tlas8_box.shape[0]))
    srows = 8 * int(scene.blas8_code.shape[1])
    insts = _bucket(int(scene.inst_matrix.shape[0]) + 1)
    roots = _bucket(max(int(scene.inst_matrix.shape[0]), 1))
    return 4 * (srows * supers + 16 * insts + 3 * roots)


def _woop12(v0, e1, e2):
    """Per-triangle 3x4 world->unit-triangle affine (Woop's intersection
    transform): rows map a world point p to (u, v, w) with p = v0 + u*e1
    + v*e2 + w*n, n = cross(e1, e2). For a ray (o, d): o' = A@o + b,
    d' = A@d, then t = -o'_w / d'_w, u = o'_u + t*d'_u, v likewise — the
    whole test is madd columns, MXU/VPU-friendly with zero cross products
    at trace time. Degenerate (zero-area / padding) triangles get an
    all-zero affine: t evaluates to NaN/inf and every comparison fails.

    Returns (T, 12): [r_u | b_u | r_v | b_v | r_w | b_w] with r_* (3,)."""
    n = jnp.cross(e1, e2)
    det = jnp.sum(n * n, axis=-1, keepdims=True)  # (T,1) = |n|^2
    inv = jnp.where(det > 0, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    r0 = jnp.cross(e2, n) * inv
    r1 = jnp.cross(n, e1) * inv
    r2 = n * inv
    b0 = -jnp.sum(r0 * v0, axis=-1, keepdims=True)
    b1 = -jnp.sum(r1 * v0, axis=-1, keepdims=True)
    b2 = -jnp.sum(r2 * v0, axis=-1, keepdims=True)
    return jnp.concatenate([r0, b0, r1, b1, r2, b2], axis=1)


def prepare_pallas_scene(scene) -> PallasScene:
    """Build transposed treelet kernel arrays from a TraceScene. Pure jnp:
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
        v0 = jnp.asarray(scene.tri_v0).astype(jnp.float32)
        e1 = jnp.asarray(scene.tri_e1).astype(jnp.float32)
        e2 = jnp.asarray(scene.tri_e2).astype(jnp.float32)
        w12 = _woop12(v0, e1, e2)
    else:
        w12 = jnp.zeros((TREELET, 12), jnp.float32)
    rows = w12.shape[0]
    padt = -(-rows // TREELET) * TREELET - rows  # pack TREELET-aligns;
    if padt:  # defensive for hand-built scenes
        w12 = jnp.concatenate([w12, jnp.zeros((padt, 12), jnp.float32)])
    w16 = jnp.concatenate(
        [w12, jnp.zeros((w12.shape[0], TLANES - 12), jnp.float32)], axis=1
    )
    c = w16.shape[0] // TREELET
    # treelet-major transpose: lane group c of (TREELET, 16*C) = treelet c
    tri_t = _pad_lanes(
        w16.reshape(c, TREELET, TLANES).transpose(1, 0, 2).reshape(TREELET, -1),
        mult=512,
    )

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

    # per-instance treelet ranges for the dense items tier (small meshes
    # skip the BLAS walk and test every treelet of their mesh densely)
    mtr = getattr(scene, "mesh_tri_range", None)
    if mtr is not None and n_inst:
        rng = jnp.asarray(mtr, jnp.int32)
        im = jnp.asarray(scene.inst_mesh, jnp.int32)
        idx = jnp.clip(im, 0, rng.shape[0] - 1)
        present = (im >= 0) & (im < rng.shape[0])
        tlo = jnp.where(present, rng[idx, 0], 0) >> TSHIFT
        thi = jnp.where(present, rng[idx, 1], 0) >> TSHIFT
    else:
        tlo = jnp.zeros(max(n_inst, 1), jnp.int32)
        thi = jnp.zeros(max(n_inst, 1), jnp.int32)
    tlo_t = _pad_lanes(tlo.astype(jnp.int32)[None, :])
    thi_t = _pad_lanes(thi.astype(jnp.int32)[None, :])

    return PallasScene(
        scene_t=scene_t,
        tri_t=tri_t,
        inst_t=inst_t,
        root_t=root_t,
        tlo_t=tlo_t,
        thi_t=thi_t,
        inst_box_min=jnp.asarray(scene.inst_aabb_min, jnp.float32),
        inst_box_max=jnp.asarray(scene.inst_aabb_max, jnp.float32),
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


def _traverse_kernel_factory(any_hit: bool, stats: bool = False,
                             batch: int = 1, tri_hbm: bool = False,
                             arity: int = 8):
    """NSTREAM interleaved predicated walks over transposed scene columns.

    Each while iteration advances every live stream one node visit. Loads
    for all streams are issued back-to-back (program order) before their
    uses, so the ~1.5us dynamic-fetch latency overlaps across streams.
    Treelet block fetches interleave the same way.

    `batch` sub-tiles are traversed per grid step by an outer fori_loop:
    a grid step has a large fixed cost on this TPU stack (~650us measured
    for this kernel — it scales with compiled code size, i.e. instruction
    streaming, on top of ~100us pipeline floor even for trivial kernels),
    so amortizing it over B tiles is worth ~7x on coherent rays."""

    def kernel(
        meta_ref,  # SMEM (1,4) i32: [tlas_root, n_tri, n_inst(=ident col), 0]
        scene_ref, tri_ref, inst_ref, root_ref,  # scene (VMEM/SMEM)
        o_ref, d_ref, tlim_ref,  # per-step inputs, leading dim = batch
        *rest,  # outputs then scratch; the any-hit kernel only OUTPUTS
        #   prim (occlusion is a boolean) — t lives in a (1,SUB,LANE) VMEM
        #   scratch and inst/u/v don't exist at all, which shrinks both the
        #   per-step output copies and the compiled code size that sets the
        #   ~650us/step fixed cost
    ):
        if any_hit:
            (prim_out, obj_ref, stack_ref, t_scratch,
             *hbm_scratch) = rest
            iout_out = u_out = v_out = None
        else:
            (t_out, prim_out, iout_out, u_out, v_out,
             obj_ref, stack_ref, *hbm_scratch) = rest
        if tri_hbm:
            tri_stage, tri_sems = hbm_scratch
        tlas_root = meta_ref[0, 0]
        n_inst = meta_ref[0, 2]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        n_grp = tri_ref.shape[1] // LANE  # static treelet-group count

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

        def tile_walk(o_ref, d_ref, tlim_ref, t_ref, prim_ref,
                      iout_ref, u_ref, v_ref):
            # one sub-tile's full traversal; refs are (1,...) views
            # into the batch block (names shadow the step refs)
            t_ref[0] = jnp.minimum(tlim_ref[0], T_MAX)
            prim_ref[0] = jnp.full((SUB, LANE), -1, jnp.int32)
            if not any_hit:
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

                # ---- phase 2: treelet leaf intersection. A leaf is one
                # aligned (TREELET, 128) fetch covering TGROUPS treelets; the
                # stream's record is a static 8-way one-hot sum, then all
                # TREELET slots test densely against the sub-tile's rays —
                # Woop affine madds, a plane/bary epilogue, and a sublane
                # min-reduction. No per-triangle fetches, no cross products.
                firsts, blks, leafs = [], [], []
                for k in range(NSTREAM):
                    w = popped[k]
                    lv = jnp.maximum(-w.node - 2, 0)
                    leafs.append((w.node <= -2) & ~w.done)
                    firsts.append((lv >> TSHIFT) << TSHIFT)
                    blks.append(lv >> TSHIFT)

                if tri_hbm:
                    # start every leaf stream's treelet-block DMA before any
                    # stream waits: the HBM fetches overlap across streams
                    # exactly like the VMEM fetch chains they replace
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
                    # per-stream predication: only a stream actually sitting at
                    # a leaf pays the fetch + dense test (a shared gate made
                    # every iteration cost ~4 streams of dense VPU work —
                    # measured 3.5x on coherent rays)
                    @pl.when(leafs[k])
                    def _(k=k):
                        w = popped[k]
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
                            ox = obj_ref[0, rsl, :]  # (1,128)
                            oy = obj_ref[1, rsl, :]
                            oz = obj_ref[2, rsl, :]
                            dx = obj_ref[3, rsl, :]
                            dy = obj_ref[4, rsl, :]
                            dz = obj_ref[5, rsl, :]
                            # (TREELET,1) x (1,128) broadcast madds (a Mosaic
                            # dot_general at K=4 miscompiled on-chip — keep the
                            # transform on the VPU)
                            opu = ax[0] * ox + ax[1] * oy + ax[2] * oz + ax[3]
                            opv = ay[0] * ox + ay[1] * oy + ay[2] * oz + ay[3]
                            opw = az[0] * ox + az[1] * oy + az[2] * oz + az[3]
                            dpu = ax[0] * dx + ax[1] * dy + ax[2] * dz
                            dpv = ay[0] * dx + ay[1] * dy + ay[2] * dz
                            dpw = az[0] * dx + az[1] * dy + az[2] * dz
                            # reciprocal + one Newton step: full-rate vs the
                            # multi-pass exact divide; degenerate slots give
                            # NaN/inf t and fail every comparison
                            r0 = pl.reciprocal(dpw, approx=True)
                            rw = r0 * (2.0 - dpw * r0)
                            tq = -opw * rw
                            uq = opu + tq * dpu
                            vq = opv + tq * dpv
                            tcur = t_ref[0, rsl, :]  # (1,128)
                            ok = (
                                (uq >= -1e-7) & (vq >= -1e-7)
                                & (uq + vq <= 1 + 1e-7)
                                & (tq > T_MIN) & (tq < tcur)
                            )
                            if any_hit:
                                ok = ok & (prim_ref[0, rsl, :] < 0)
                                hit_any = jnp.any(ok, axis=0, keepdims=True)
                                prim_ref[0, rsl, :] = jnp.where(
                                    hit_any, firsts[k], prim_ref[0, rsl, :])
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
                                hit_any, w.inst, iout_ref[0, rsl, :])
                            u_ref[0, rsl, :] = jnp.where(
                                hit_any, uwin, u_ref[0, rsl, :])
                            v_ref[0, rsl, :] = jnp.where(
                                hit_any, vwin, v_ref[0, rsl, :])

                # ---- phase 3: arity-wide internal test + nearest-first push.
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
                    in_tlas = w.inst < 0

                    def child_entry(code, cnt, w=w, in_tlas=in_tlas):
                        payload = -code - 1
                        leaf_child = code < 0
                        iid = jnp.clip(payload, 0, jnp.maximum(n_inst - 1, 0))
                        tlas_entry = root_ref[0, iid]  # SMEM scalar read
                        blas_entry = -(payload
                                       + jnp.minimum(cnt - 1, TREELET - 1)) - 2
                        e_code = jnp.where(
                            leaf_child,
                            jnp.where(in_tlas, tlas_entry, blas_entry), code)
                        e_inst = jnp.where(leaf_child & in_tlas, payload, w.inst)
                        return e_code, e_inst

                    next_code = jnp.int32(-1)
                    next_inst = w.inst
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

                        e_code, e_inst = child_entry(
                            col[6 * arity + c, 0], col[7 * arity + c, 0])
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
                live = walks[0].done
                for k in range(1, NSTREAM):
                    live = live & walks[k].done
                return (~live) & (iters < KERNEL_MAX_ITERS)

            init = tuple(
                _Walk(node=jnp.int32(tlas_root), inst=jnp.int32(-1),
                      cached=jnp.int32(-1), sp=jnp.int32(0),
                      done=jnp.bool_(False))
                for _ in range(NSTREAM)
            )
            _, final_iters = jax.lax.while_loop(cond, body, (init, jnp.int32(0)))
            if stats:
                # debug mode: stamp the program's while-iteration count into
                # u[program, 0, 0] (u is meaningless in stats runs)
                u_ref[0, 0:1, 0:1] = jnp.full((1, 1), final_iters, jnp.float32)

        def per_batch(b, _):
            s = pl.ds(b, 1)
            if any_hit:
                tile_walk(o_ref.at[s], d_ref.at[s], tlim_ref.at[s],
                          t_scratch, prim_out.at[s], None, None, None)
            else:
                tile_walk(o_ref.at[s], d_ref.at[s], tlim_ref.at[s],
                          t_out.at[s], prim_out.at[s], iout_out.at[s],
                          u_out.at[s], v_out.at[s])
            return 0

        jax.lax.fori_loop(0, batch, per_batch, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "interpret", "stats", "batch", "tri_hbm"),
)
def _run_arrays(
    meta, scene_t, tri_t, inst_t, root_t, o4, d4, tl3,
    any_hit: bool,
    interpret: bool = False,
    stats: bool = False,
    batch: int = 1,
    tri_hbm: bool = False,
):
    T = o4.shape[0]
    assert T % batch == 0
    assert not (stats and any_hit), "stats mode is closest-hit only"
    # supernode arity rides the scene_t row count (8 rows per child:
    # 6 box + 1 code + 1 cnt — see prepare_pallas_scene)
    arity = scene_t.shape[0] // 8
    kernel = _traverse_kernel_factory(any_hit, stats, batch, tri_hbm, arity)
    meta_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scene_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    # tri_hbm: the treelet arena stays in HBM/ANY; leaf visits DMA blocks
    tri_spec = (pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY) if tri_hbm
                else scene_spec)
    tile3 = pl.BlockSpec((batch, 3, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    tile1 = pl.BlockSpec((batch, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    if any_hit:
        # occlusion is a boolean: prim is the only output; t is VMEM
        # scratch and inst/u/v are never materialized
        out_shapes = (jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),)
        out_specs = (tile1,)
        scratch = [
            pltpu.VMEM((9, SUB, LANE), jnp.float32),
            pltpu.SMEM((NSTREAM, STACK_DEPTH, 2), jnp.int32),
            pltpu.VMEM((1, SUB, LANE), jnp.float32),  # per-tile t
        ]
    else:
        out_shapes = (
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),  # t
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),  # prim
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.int32),  # inst
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),  # u
            jax.ShapeDtypeStruct((T, SUB, LANE), jnp.float32),  # v
        )
        out_specs = (tile1, tile1, tile1, tile1, tile1)
        scratch = [
            pltpu.VMEM((9, SUB, LANE), jnp.float32),
            pltpu.SMEM((NSTREAM, STACK_DEPTH, 2), jnp.int32),
        ]
    if tri_hbm:
        scratch += [
            pltpu.VMEM((NSTREAM, TREELET, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((NSTREAM,)),
        ]
    return pl.pallas_call(
        kernel,
        grid=(T // batch,),
        in_specs=[meta_spec, scene_spec, tri_spec, scene_spec, smem_spec]
        + [tile3, tile3, tile1],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(meta, scene_t, tri_t, inst_t, root_t, o4, d4, tl3)


#: sub-tiles traversed per grid step (the kernel's outer fori_loop). A grid
#: step costs ~650us fixed for this kernel on the axon stack — the cost
#: scales with compiled code size (instruction streaming), on a ~100us
#: pipeline floor measured for trivial kernels with the same operands —
#: so batching B tiles per step amortizes the dominant cost. The batch is
#: VMEM-adaptive (auto_chunk): scenes below the max budget spend the spare
#: scoped VMEM on more tiles per step. RFW_CHUNK_TILES pins it (A/B knob).
CHUNK_TILES = int(_os.environ.get("RFW_CHUNK_TILES", "16"))
_CHUNK_PINNED = _os.environ.get("RFW_CHUNK_TILES") is not None

#: scoped VMEM per core, and the headroom left for Mosaic temporaries /
#: alignment beyond the accounted scene + step buffers. 2.5MB keeps a
#: max-budget (11.5MB) scene at the proven 16-tile batch.
VMEM_TOTAL = 16 * 1024 * 1024
VMEM_STEP_MARGIN = int(2.5 * 1024 * 1024)
#: quantized batch ladder: dynamic scenes whose bucketed arena sizes wobble
#: still land on few distinct batches, so compiled kernels are shared
_CHUNK_LADDER = (64, 48, 32, 24, 16, 12, 8, 6, 4, 3, 2, 1)


def auto_chunk(resident_bytes: int, tile_bytes: int,
               scratch_bytes: int = 0) -> int:
    """Largest ladder batch whose double-buffered per-step ray buffers fit
    next to the VMEM-resident scene arrays. tile_bytes = one sub-tile's
    in+out plane bytes for the calling kernel (any-hit steps are smaller
    than closest-hit steps, so they earn bigger batches)."""
    if _CHUNK_PINNED:
        return CHUNK_TILES
    avail = VMEM_TOTAL - resident_bytes - scratch_bytes - VMEM_STEP_MARGIN
    cap = avail // (2 * tile_bytes)
    for q in _CHUNK_LADDER:
        if q <= cap:
            return q
    return 1


def _run(ps: PallasScene, o4, d4, tl3, any_hit: bool, interpret: bool = False,
         stats: bool = False, tri_hbm: bool = False):
    T = o4.shape[0]
    meta = jnp.asarray(
        [[ps.tlas_root, ps.n_tri, ps.n_inst, 0]], jnp.int32
    )

    # pad to a batch multiple; one pallas_call batches `chunk` sub-tiles
    # per grid step, sized from the VMEM actually left by this scene
    # (scaled so rays-per-step stays constant when SUB > 8: the ladder is
    # calibrated in (8,128)-tile units)
    planes = 8 if any_hit else 12  # o/d/tl in + prim | t/prim/inst/u/v out
    scratch_b = 4 * (9 + (1 if any_hit else 0)) * SUB * LANE
    if tri_hbm:
        scratch_b += 4 * NSTREAM * TREELET * LANE
        resident = ps.vmem_bytes - 4 * ps.tri_t.size
    else:
        resident = ps.vmem_bytes
    if _CHUNK_PINNED:
        # pinned chunk is calibrated in (8,128)-tile units; rescale so
        # rays-per-step stays constant when SUB > 8
        chunk = max(1, CHUNK_TILES * SUB8 // SUB)
    else:
        # tile_bytes includes SUB, so multi-tile streams self-scale
        chunk = auto_chunk(resident, 4 * planes * SUB * LANE, scratch_b)
    batch = min(chunk, T)
    n_steps = -(-T // batch)
    pad = n_steps * batch - T
    if pad:
        o4 = jnp.concatenate([o4, jnp.zeros((pad,) + o4.shape[1:], o4.dtype)])
        d4 = jnp.concatenate(
            [d4, jnp.ones((pad,) + d4.shape[1:], d4.dtype)]
        )  # dummy dirs avoid 0-division
        tl3 = jnp.concatenate([tl3, jnp.zeros((pad,) + tl3.shape[1:], tl3.dtype)])
    outs = _run_arrays(
        meta, ps.scene_t, ps.tri_t, ps.inst_t, ps.root_t,
        o4, d4, tl3,
        any_hit=any_hit, interpret=interpret, stats=stats, batch=batch,
        tri_hbm=tri_hbm,
    )
    if pad:
        outs = tuple(x[:T] for x in outs)
    return outs


def _reshape_rays(ray_o, ray_d, t_limit):
    R = ray_o.shape[0]
    assert R % LANES8 == 0, f"ray count {R} not divisible by {LANES8}"
    tl = jnp.broadcast_to(jnp.asarray(t_limit, jnp.float32), (R,))
    pad = (-R) % LANES
    if pad:
        # multi-tile NSTREAM (SUB > 8): pad to a program multiple with
        # dead rays (t_limit 0 -> every slab test fails, the stream's
        # padded sublane contributes no iterations past the root)
        ray_o = jnp.concatenate(
            [ray_o, jnp.zeros((pad, 3), ray_o.dtype)])
        ray_d = jnp.concatenate([ray_d, jnp.ones((pad, 3), ray_d.dtype)])
        tl = jnp.concatenate([tl, jnp.zeros((pad,), tl.dtype)])
    Rp = R + pad
    T = Rp // LANES
    o4 = ray_o.reshape(T, SUB, LANE, 3).transpose(0, 3, 1, 2)
    d4 = ray_d.reshape(T, SUB, LANE, 3).transpose(0, 3, 1, 2)
    tl3 = tl.reshape(T, SUB, LANE)
    return o4, d4, tl3, T, R


def pallas_closest_hit(ps: PallasScene, ray_o, ray_d, t_limit=T_MAX,
                       interpret: bool = False, stats: bool = False,
                       tri_hbm: bool = False) -> Hit:
    """stats=True is a debug mode: u[k*LANES] carries program k's
    while-iteration count instead of barycentric u. tri_hbm=True streams
    the treelet arena from HBM (scenes over the VMEM budget)."""
    o4, d4, tl3, T, R = _reshape_rays(ray_o, ray_d, t_limit)
    t, prim, inst, u, v = _run(ps, o4, d4, tl3, False, interpret, stats,
                               tri_hbm)
    return Hit(t.reshape(-1)[:R], prim.reshape(-1)[:R],
               inst.reshape(-1)[:R], u.reshape(-1)[:R], v.reshape(-1)[:R])


def pallas_occluded(ps: PallasScene, ray_o, ray_d, t_limit,
                    interpret: bool = False,
                    tri_hbm: bool = False) -> jax.Array:
    o4, d4, tl3, T, R = _reshape_rays(ray_o, ray_d, t_limit)
    (prim,) = _run(ps, o4, d4, tl3, True, interpret, tri_hbm=tri_hbm)
    return (prim >= 0).reshape(-1)[:R]
