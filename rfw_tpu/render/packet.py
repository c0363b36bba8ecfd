"""Packet BVH traversal — the TPU-native fast path.

The per-ray lockstep traversal (render.intersect) is gather-bound on TPU:
every step gathers node/triangle rows per *ray* (millions of lanes). This
module restructures traversal the way the hardware wants it (SURVEY.md §2.9
"keep MBVH-style multi-child nodes for vectorized traversal"):

  * rays are grouped into TILES of L lanes; each tile shares ONE traversal
    stack and visits ONE node per step (classic packet traversal — the
    reference's 4-wide `RayPacket4`/`intersect4` SIMD packets, scaled from
    4 SSE lanes to hundreds of VPU lanes);
  * per step, gathers touch only (T,·) per-tile rows — thousands of
    elements instead of millions — while the AABB/triangle math runs as
    dense (T,L) elementwise VPU work;
  * wide nodes (both children's AABBs in the parent, built at pack time)
    make the node fetch a single (T,12)+(T,4) gather, and leaves are
    deferred as encoded node codes;
  * the whole two-level structure (TLAS over instances -> per-mesh BLAS)
    is traversed with per-tile instance state: entering an instance
    re-bases the *tile's* rays into object space with one (T,12) matrix
    row — no per-ray matrix gathers.

Efficiency depends on ray coherence within a tile; primary rays are
swizzled into square pixel blocks by the integrator (see
rfw_tpu.render.wavefront swizzle) and secondary rays inherit the layout.

Node-code encoding inside the loop (int32 per tile):
    code >= 0   internal node in the unified wide arena (BLAS ++ TLAS)
    code == -1  "pop"
    code <= -2  BLAS triangle leaf: v = -code-2; first = v with the low
                log2(TREELET) bits cleared (leaf ranges are TREELET-aligned
                in the packed arena), count = (v & (TREELET-1)) + 1
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rfw_tpu.accel.bvh_cpu import TREELET
from rfw_tpu.render.intersect import Hit, T_MAX, T_MIN

DEFAULT_LANES = 512
STACK_DEPTH = 96
MAX_ITERS = 1 << 20
_TSHIFT = TREELET.bit_length() - 1


class PacketScene(NamedTuple):
    """Device arrays prepared once per TraceScene (prepare_packet_scene)."""

    wide_f: jax.Array  # (N,12) unified wide arena: [BLAS ++ TLAS]
    wide_i: jax.Array  # (N,4)
    tlas_root: jax.Array  # () int32
    blas_wide_root: jax.Array  # (I,)
    inst_inv12: jax.Array  # (I,12) world->object, rows 0..2 of the 4x4
    tri9: jax.Array  # (Tri,9) [v0,e1,e2]
    n_tri: int
    n_inst: int


def prepare_packet_scene(scene) -> PacketScene:
    """Build the packet-traversal arrays from a (device) TraceScene."""
    nb = scene.blas_wide_f.shape[0]
    # rebase TLAS internal child codes into the unified arena
    tlas_i = jnp.asarray(scene.tlas_wide_i)
    codes = jnp.where(tlas_i[:, :2] >= 0, tlas_i[:, :2] + nb, tlas_i[:, :2])
    tlas_i = jnp.concatenate([codes, tlas_i[:, 2:]], axis=1)
    wide_f = jnp.concatenate([jnp.asarray(scene.blas_wide_f),
                              jnp.asarray(scene.tlas_wide_f)])
    wide_i = jnp.concatenate([jnp.asarray(scene.blas_wide_i), tlas_i])
    inst_inv12 = scene.inst_inv[:, :3, :].reshape(-1, 12) if scene.inst_inv.shape[0] else jnp.zeros((1, 12), jnp.float32)
    tri9 = (
        jnp.concatenate([scene.tri_v0, scene.tri_e1, scene.tri_e2], axis=1)
        if scene.tri_v0.shape[0]
        else jnp.zeros((1, 9), jnp.float32)
    )
    return PacketScene(
        wide_f=wide_f,
        wide_i=wide_i,
        tlas_root=jnp.asarray(nb, jnp.int32),
        blas_wide_root=(scene.blas_wide_root if scene.blas_wide_root.shape[0]
                        else jnp.zeros((1,), jnp.int32)),
        inst_inv12=inst_inv12,
        tri9=tri9,
        n_tri=int(scene.tri_v0.shape[0]),
        n_inst=int(scene.inst_matrix.shape[0]),
    )


def _slab(o, inv_d, t_best, bmin, bmax):
    """(T,L) slab test vs per-tile boxes bmin/bmax (T,3)."""
    t0 = (bmin[:, None, :] - o) * inv_d
    t1 = (bmax[:, None, :] - o) * inv_d
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    tnear = jnp.max(tsm, axis=-1)
    tfar = jnp.min(tbg, axis=-1)
    hit = (tnear <= tfar) & (tfar > T_MIN) & (tnear < t_best)
    return hit, tnear


class _State(NamedTuple):
    node: jax.Array  # (T,) current code
    inst: jax.Array  # (T,)
    sp: jax.Array  # (T,)
    stack: jax.Array  # (T,D,2)
    t: jax.Array  # (T,L)
    prim: jax.Array  # (T,L)
    hit_inst: jax.Array  # (T,L)
    u: jax.Array
    v: jax.Array
    done: jax.Array  # (T,)
    iters: jax.Array  # ()


def _traverse(ps: PacketScene, ray_o, ray_d, t_limit, any_hit: bool):
    """ray_o/d: (T,L,3). t_limit: scalar or (T,L). Returns per-lane Hit."""
    T, L = ray_o.shape[:2]
    i32 = jnp.int32
    tiles = jnp.arange(T)

    if ps.n_inst == 0:
        z = jnp.zeros((T, L), jnp.float32)
        return Hit(jnp.full((T, L), T_MAX), jnp.full((T, L), -1, i32),
                   jnp.full((T, L), -1, i32), z, z)

    t_lim = jnp.broadcast_to(jnp.asarray(t_limit, jnp.float32), (T, L))

    def body(st: _State) -> _State:
        # ---------- pop ----------
        need = (st.node == -1) & ~st.done
        can_pop = need & (st.sp > 0)
        newly_done = need & (st.sp == 0)
        sp = jnp.where(can_pop, st.sp - 1, st.sp)
        popped = st.stack[tiles, jnp.maximum(sp, 0)]  # (T,2)
        node = jnp.where(can_pop, popped[:, 0], st.node)
        inst = jnp.where(can_pop, popped[:, 1], st.inst)
        done = st.done | newly_done
        active = ~done & (node != -1)

        # ---------- per-tile object-space rays ----------
        in_tlas = inst < 0
        inv = ps.inst_inv12[jnp.maximum(inst, 0)]  # (T,12)
        m = inv.reshape(T, 3, 4)
        o_obj = jnp.einsum("tab,tlb->tla", m[:, :, :3], ray_o) + m[:, None, :, 3]
        d_obj = jnp.einsum("tab,tlb->tla", m[:, :, :3], ray_d)
        o = jnp.where(in_tlas[:, None, None], ray_o, o_obj)
        d = jnp.where(in_tlas[:, None, None], ray_d, d_obj)
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                                jnp.where(d < 0, -1e-20, 1e-20), d)

        t_best, prim, hinst, uu, vv = st.t, st.prim, st.hit_inst, st.u, st.v

        # ---------- triangle-leaf phase ----------
        is_leaf = active & (node <= -2)
        lv = jnp.maximum(-node - 2, 0)
        first = (lv >> _TSHIFT) << _TSHIFT
        count = jnp.where(is_leaf, (lv & (TREELET - 1)) + 1, 0)

        def leaf_step(k, carry):
            t_best, prim, hinst, uu, vv = carry
            tri = jnp.minimum(first + k, max(ps.n_tri - 1, 0))
            row = ps.tri9[tri]  # (T,9)
            v0 = row[:, None, 0:3]
            e1 = row[:, None, 3:6]
            e2 = row[:, None, 6:9]
            pvec = jnp.cross(d, e2)
            det = jnp.sum(e1 * pvec, axis=-1)
            invdet = jnp.where(jnp.abs(det) > 1e-12,
                               1.0 / jnp.where(det == 0, 1, det), 0.0)
            tvec = o - v0
            uq = jnp.sum(tvec * pvec, -1) * invdet
            qvec = jnp.cross(tvec, e1)
            vq = jnp.sum(d * qvec, -1) * invdet
            tq = jnp.sum(e2 * qvec, -1) * invdet
            ok = (
                is_leaf[:, None] & (k < count)[:, None]
                & (jnp.abs(det) > 1e-12)
                & (uq >= -1e-7) & (vq >= -1e-7) & (uq + vq <= 1 + 1e-7)
                & (tq > T_MIN) & (tq < t_best) & (tq < t_lim)
            )
            return (
                jnp.where(ok, tq, t_best),
                jnp.where(ok, tri[:, None], prim),
                jnp.where(ok, inst[:, None], hinst),
                jnp.where(ok, uq, uu),
                jnp.where(ok, vq, vv),
            )

        # fori_loop (not unrolled) bounded by the step's actual max leaf
        # occupancy: keeps the while-body graph small and makes non-leaf
        # steps free; dense per-leaf work is the Pallas tier's job
        # (ops/traverse.py) — this tier is the portable fallback
        t_best, prim, hinst, uu, vv = jax.lax.fori_loop(
            0, jnp.max(count), leaf_step, (t_best, prim, hinst, uu, vv)
        )

        # ---------- internal phase ----------
        is_int = active & (node >= 0)
        nsafe = jnp.maximum(node, 0)
        wf = ps.wide_f[nsafe]  # (T,12)
        wi = ps.wide_i[nsafe]  # (T,4)
        lhit, lt = _slab(o, inv_d, t_best, wf[:, 0:3], wf[:, 3:6])
        rhit, rt = _slab(o, inv_d, t_best, wf[:, 6:9], wf[:, 9:12])
        if any_hit:
            live = prim < 0
            lhit = lhit & live
            rhit = rhit & live
        l_any = jnp.any(lhit, -1) & is_int
        r_any = jnp.any(rhit, -1) & is_int
        lt_tile = jnp.min(jnp.where(lhit, lt, jnp.inf), axis=-1)
        rt_tile = jnp.min(jnp.where(rhit, rt, jnp.inf), axis=-1)

        # child entries: (entry_code, entry_inst)
        def child_entry(code, cnt):
            c_leaf = code < 0
            payload = -code - 1
            # TLAS leaf -> descend into instance's BLAS wide root
            iid = jnp.clip(payload, 0, max(ps.n_inst - 1, 0))
            tlas_entry = ps.blas_wide_root[iid]
            # BLAS leaf -> encoded triangle leaf code (first is
            # TREELET-aligned, count-1 packs into the low bits)
            blas_entry = -(payload + jnp.minimum(cnt - 1, TREELET - 1)) - 2
            e_code = jnp.where(
                c_leaf,
                jnp.where(in_tlas, tlas_entry, blas_entry),
                code,
            )
            e_inst = jnp.where(c_leaf & in_tlas, payload.astype(i32), inst)
            return e_code, e_inst

        l_code, l_inst = child_entry(wi[:, 0], wi[:, 2])
        r_code, r_inst = child_entry(wi[:, 1], wi[:, 3])

        both = l_any & r_any
        near_is_l = lt_tile <= rt_tile
        near_code = jnp.where(near_is_l, l_code, r_code)
        near_inst = jnp.where(near_is_l, l_inst, r_inst)
        far_code = jnp.where(near_is_l, r_code, l_code)
        far_inst = jnp.where(near_is_l, r_inst, l_inst)
        one = l_any ^ r_any
        one_code = jnp.where(l_any, l_code, r_code)
        one_inst = jnp.where(l_any, l_inst, r_inst)

        # push far on both
        slot = jnp.minimum(sp, STACK_DEPTH - 1)
        entry = jnp.stack([far_code, far_inst], axis=-1)
        stack = st.stack.at[tiles, slot].set(
            jnp.where(both[:, None], entry, st.stack[tiles, slot])
        )
        sp = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        next_code = jnp.where(
            is_int,
            jnp.where(both, near_code, jnp.where(one, one_code, -1)),
            jnp.where(is_leaf, -1, node),
        )
        next_inst = jnp.where(
            is_int, jnp.where(both, near_inst, jnp.where(one, one_inst, inst)), inst
        )

        if any_hit:
            done = done | jnp.all(prim >= 0, axis=-1)

        return _State(
            node=jnp.where(done, -1, next_code),
            inst=next_inst,
            sp=sp,
            stack=stack,
            t=t_best, prim=prim, hit_inst=hinst, u=uu, v=vv,
            done=done,
            iters=st.iters + 1,
        )

    def cond(st: _State):
        return jnp.any(~st.done) & (st.iters < MAX_ITERS)

    init = _State(
        node=jnp.broadcast_to(ps.tlas_root, (T,)).astype(i32),
        inst=jnp.full(T, -1, i32),
        sp=jnp.zeros(T, i32),
        stack=jnp.zeros((T, STACK_DEPTH, 2), i32),
        t=jnp.minimum(t_lim, T_MAX),
        prim=jnp.full((T, L), -1, i32),
        hit_inst=jnp.full((T, L), -1, i32),
        u=jnp.zeros((T, L), jnp.float32),
        v=jnp.zeros((T, L), jnp.float32),
        done=jnp.zeros(T, bool),
        iters=jnp.zeros((), i32),
    )
    final = jax.lax.while_loop(cond, body, init)
    return Hit(final.t, final.prim, final.hit_inst, final.u, final.v)


def packet_closest_hit(ps: PacketScene, ray_o, ray_d, t_limit=T_MAX,
                       lanes: int = DEFAULT_LANES) -> Hit:
    """Closest hit for (R,3) rays via tiled packets; returns flat (R,) Hit."""
    R = ray_o.shape[0]
    T = max(1, R // lanes)
    assert T * lanes == R, f"ray count {R} not divisible by lanes {lanes}"
    o = ray_o.reshape(T, lanes, 3)
    d = ray_d.reshape(T, lanes, 3)
    tl = (t_limit.reshape(T, lanes) if hasattr(t_limit, "reshape")
          and getattr(t_limit, "ndim", 0) == 1 else t_limit)
    h = _traverse(ps, o, d, tl, any_hit=False)
    return Hit(*[x.reshape(R) for x in h])


def packet_occluded(ps: PacketScene, ray_o, ray_d, t_limit,
                    lanes: int = DEFAULT_LANES) -> jax.Array:
    R = ray_o.shape[0]
    T = max(1, R // lanes)
    assert T * lanes == R
    o = ray_o.reshape(T, lanes, 3)
    d = ray_d.reshape(T, lanes, 3)
    tl = (t_limit.reshape(T, lanes) if hasattr(t_limit, "reshape")
          and getattr(t_limit, "ndim", 0) == 1 else t_limit)
    h = _traverse(ps, o, d, tl, any_hit=True)
    return (h.prim >= 0).reshape(R)
