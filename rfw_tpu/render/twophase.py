"""Two-phase (treelet-binned) traversal — phase A: TLAS entry enumeration.

The round-3 attack on the incoherent-ray gap (docs/ROUND2.md): bounce rays
re-binned not by a spatial sort key but by the actual BLAS they are about
to walk. Phase A walks ONLY the TLAS per ray (the pica TLAS is ~1.3k
binary wide-nodes — microseconds of work per front) and emits each ray's
K nearest instance entries (slab entry t + instance id). Phase B (round
3) expands to (ray, entry) items, sorts by instance, and traces each item
against a single BLAS with sub-tiles that are coherent by construction.

This module lands phase A standalone and CPU-validated so the round-3
kernel work starts from a tested building block. Pure jnp; vectorized
per-ray walk with a fixed-depth stack and a branchless K-nearest insert.

Reference anchor: the reference's TLAS/BLAS split itself
(backends/gpu-rt/src/lib.rs two-level MBVH; intersection.glsl:106-167) —
the *binning* of rays by BLAS is the TPU-specific addition.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rfw_tpu.render.intersect import T_MAX, T_MIN

#: fixed walk stack depth: the TLAS over I instances is ~2*log2(I) deep
#: with SAH splits; 48 covers far beyond 10k instances
STACK_DEPTH = 48
#: while-loop safety cap (wrong-but-terminating on malformed trees)
MAX_ITERS = 1 << 14


class TlasEntries(NamedTuple):
    t_entry: jax.Array  # (R,K) f32 slab entry t, ascending; +inf = none
    inst: jax.Array  # (R,K) i32 instance id; -1 = none


def _slab(o, inv_d, box, t_limit):
    """Entry t of ray vs (R,6) [min3|max3] box; +inf on miss. Inverted
    (empty-marker) boxes slab as tn=-inf/tf=+inf and would always 'hit' —
    gate on box validity."""
    t0 = (box[:, 0:3] - o) * inv_d
    t1 = (box[:, 3:6] - o) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    valid = jnp.all(box[:, 0:3] <= box[:, 3:6], axis=-1)
    # compare the CLAMPED entry t against the limit: origin-inside boxes
    # (tn < 0) must not emit entries for dead lanes (t_limit 0)
    te = jnp.maximum(tn, 0.0)
    hit = valid & (tn <= tf) & (tf > T_MIN) & (te < t_limit)
    return jnp.where(hit, te, jnp.inf)


@functools.partial(jax.jit, static_argnames=("K",))
def tlas_entries(
    tlas_wide_f: jax.Array,  # (N,12) [lmin,lmax,rmin,rmax]
    tlas_wide_i: jax.Array,  # (N,4)  [l_code, r_code, ...]; code<0: inst -c-1
    ray_o: jax.Array,  # (R,3)
    ray_d: jax.Array,  # (R,3)
    t_limit=T_MAX,
    K: int = 8,
) -> TlasEntries:
    """Per ray, the K nearest TLAS leaf (instance) entries, sorted by slab
    entry t. Rays intersecting more than K instance boxes keep the K
    nearest — phase B must treat a FULL K-list as possibly truncated (the
    closest true hit is still inside the kept K when every kept entry is
    nearer than the first dropped one; a full list with a hit beyond
    t_entry[K-1] falls back to the classic kernel)."""
    R = ray_o.shape[0]
    i32 = jnp.int32
    t_lim = jnp.broadcast_to(jnp.asarray(t_limit, jnp.float32), (R,))
    inv_d = 1.0 / jnp.where(
        jnp.abs(ray_d) < 1e-20, jnp.where(ray_d < 0, -1e-20, 1e-20), ray_d
    )

    class _S(NamedTuple):
        node: jax.Array
        sp: jax.Array
        stack: jax.Array
        done: jax.Array
        ts: jax.Array
        ins: jax.Array
        iters: jax.Array

    def insert(ts, ins, tn, iid, do):
        """Branchless sorted insert of (tn, iid) where `do`; keeps K
        smallest. ts (R,K) ascending."""
        tn = jnp.where(do, tn, jnp.inf)
        iid = jnp.where(do, iid, -1)
        for j in range(K):
            take = tn < ts[:, j]
            # swap (tn,iid) with slot j where take; the displaced value
            # bubbles to later slots
            old_t, old_i = ts[:, j], ins[:, j]
            ts = ts.at[:, j].set(jnp.where(take, tn, old_t))
            ins = ins.at[:, j].set(jnp.where(take, iid, old_i))
            tn = jnp.where(take, old_t, tn)
            iid = jnp.where(take, old_i, iid)
        return ts, ins

    def body(st: _S) -> _S:
        need = (st.node == -1) & ~st.done
        can_pop = need & (st.sp > 0)
        newly_done = need & (st.sp == 0)
        sp = jnp.where(can_pop, st.sp - 1, st.sp)
        popped = st.stack[jnp.arange(R), jnp.maximum(sp, 0)]
        node = jnp.where(can_pop, popped, st.node)
        done = st.done | newly_done
        active = ~done & (node >= 0)

        n = jnp.maximum(node, 0)
        wf = tlas_wide_f[n]  # (R,12)
        wi = tlas_wide_i[n]  # (R,4)
        tl = _slab(ray_o, inv_d, wf[:, 0:6], t_lim)
        tr = _slab(ray_o, inv_d, wf[:, 6:12], t_lim)
        l_code = wi[:, 0]
        r_code = wi[:, 1]

        ts, ins = st.ts, st.ins
        # leaf children record entries
        l_leaf = active & (l_code < 0) & jnp.isfinite(tl)
        r_leaf = active & (r_code < 0) & jnp.isfinite(tr)
        ts, ins = insert(ts, ins, tl, -l_code - 1, l_leaf)
        ts, ins = insert(ts, ins, tr, -r_code - 1, r_leaf)

        # internal children continue the walk (near one descends, far one
        # pushes — order only matters for stack depth here)
        l_int = active & (l_code >= 0) & jnp.isfinite(tl)
        r_int = active & (r_code >= 0) & jnp.isfinite(tr)
        both = l_int & r_int
        l_near = tl <= tr
        first = jnp.where(both, jnp.where(l_near, l_code, r_code),
                          jnp.where(l_int, l_code, r_code))
        second = jnp.where(l_near, r_code, l_code)
        next_node = jnp.where(l_int | r_int, first, -1)
        stack = st.stack.at[jnp.arange(R), jnp.minimum(sp, STACK_DEPTH - 1)].set(
            jnp.where(both, second, st.stack[jnp.arange(R),
                                             jnp.minimum(sp, STACK_DEPTH - 1)])
        )
        sp = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        node = jnp.where(active, next_node, jnp.where(done, node, -1))
        return _S(node=node, sp=sp, stack=stack, done=done, ts=ts, ins=ins,
                  iters=st.iters + 1)

    def cond(st: _S):
        return jnp.any(~st.done) & (st.iters < MAX_ITERS)

    init = _S(
        node=jnp.zeros(R, i32),  # pack asserts the wide TLAS root is 0
        sp=jnp.zeros(R, i32),
        stack=jnp.zeros((R, STACK_DEPTH), i32),
        done=jnp.zeros(R, bool),
        ts=jnp.full((R, K), jnp.inf, jnp.float32),
        ins=jnp.full((R, K), -1, i32),
        iters=jnp.int32(0),
    )
    out = jax.lax.while_loop(cond, body, init)
    return TlasEntries(t_entry=out.ts, inst=out.ins)


def dense_tlas_entries(inst_min, inst_max, ray_o, ray_d, t_limit=T_MAX,
                       K: int = 8) -> TlasEntries:
    """Phase A without a tree: slab-test EVERY instance AABB against every
    ray and keep the K nearest entries per ray — pure fused VPU math on an
    (R,I) grid, no walk, no stack, no divergence.

    For instance counts in the hundreds this replaces the Pallas TLAS-walk
    kernel outright: the walk pays ~1.5us per dependent node fetch times
    the per-tile visit union (measured 290ms at 1080p on pica), while the
    dense scan is a handful of (R,I) elementwise passes (~20GB of HBM
    traffic at I=256, R=2M) that XLA fuses and pipelines. Above ~512
    arena instances the quadratic term loses; callers gate on I.

    Padding rows carry inverted boxes (+inf/-inf) which slab to
    tn=-inf/tf=+inf and would false-hit — gated by a validity test, same
    pitfall as _slab. Same output contract as tlas_entries."""
    R = ray_o.shape[0]
    inv_d = 1.0 / jnp.where(
        jnp.abs(ray_d) < 1e-20, jnp.where(ray_d < 0, -1e-20, 1e-20), ray_d
    )
    t_lim = jnp.broadcast_to(jnp.asarray(t_limit, jnp.float32), (R,))
    valid_box = jnp.all(inst_min <= inst_max, axis=1)  # (I,)

    tn = jnp.full((1, 1), -jnp.inf, jnp.float32)
    tf = jnp.full((1, 1), jnp.inf, jnp.float32)
    # per-axis accumulation keeps every intermediate (R,I), never (R,I,3)
    for a in range(3):
        t0 = (inst_min[None, :, a] - ray_o[:, None, a]) * inv_d[:, None, a]
        t1 = (inst_max[None, :, a] - ray_o[:, None, a]) * inv_d[:, None, a]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    te0 = jnp.maximum(tn, 0.0)  # clamped entry: dead lanes (t_limit 0)
    #   must not collect origin-inside entries
    hit = (valid_box[None] & (tn <= tf) & (tf > T_MIN)
           & (te0 < t_lim[:, None]))
    te = jnp.where(hit, te0, jnp.inf)  # (R,I)

    neg_t, idx = jax.lax.top_k(-te, K)  # ascending entry t
    ts = -neg_t
    ins = jnp.where(jnp.isfinite(ts), idx.astype(jnp.int32), -1)
    return TlasEntries(t_entry=ts, inst=ins)


# --------------------------------------------------------- phase B (reference)
def _blas_walk_items(scene, o_obj, d_obj, roots, valid, t_limit):
    """Vectorized single-BLAS walk for N independent items (object-space
    rays + per-item wide-BLAS roots). The reference implementation of
    phase B's inner trace: every item walks ONE tree from its root — the
    coherence the Pallas phase-B kernel will exploit by tiling items of
    the same instance together. Returns per-item (t, prim, u, v).

    Leaf encoding matches render.packet: pack TREELET-aligns leaf firsts,
    so a leaf child packs as -(first + count-1) - 2 and decodes from the
    low bits."""
    from rfw_tpu.accel.bvh_cpu import TREELET
    from rfw_tpu.render.intersect import _moller_trumbore

    TSHIFT = TREELET.bit_length() - 1
    N = o_obj.shape[0]
    i32 = jnp.int32
    wf = jnp.asarray(scene.blas_wide_f)
    wi = jnp.asarray(scene.blas_wide_i)
    tri_v0 = jnp.asarray(scene.tri_v0)
    tri_e1 = jnp.asarray(scene.tri_e1)
    tri_e2 = jnp.asarray(scene.tri_e2)
    n_tri = tri_v0.shape[0]
    inv_d = 1.0 / jnp.where(
        jnp.abs(d_obj) < 1e-20, jnp.where(d_obj < 0, -1e-20, 1e-20), d_obj
    )

    class _S(NamedTuple):
        node: jax.Array
        sp: jax.Array
        stack: jax.Array
        done: jax.Array
        t: jax.Array
        prim: jax.Array
        u: jax.Array
        v: jax.Array
        iters: jax.Array

    def slab(box6, t_best):
        t0 = (box6[:, 0:3] - o_obj) * inv_d
        t1 = (box6[:, 3:6] - o_obj) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        ok = jnp.all(box6[:, 0:3] <= box6[:, 3:6], axis=-1)
        return ok & (tn <= tf) & (tf > T_MIN) & (tn < t_best)

    rows = jnp.arange(N)

    def body(st: _S) -> _S:
        need = (st.node == -1) & ~st.done
        can_pop = need & (st.sp > 0)
        newly_done = need & (st.sp == 0)
        sp = jnp.where(can_pop, st.sp - 1, st.sp)
        node = jnp.where(can_pop, st.stack[rows, jnp.maximum(sp, 0)], st.node)
        done = st.done | newly_done
        active = ~done & (node != -1)

        # ---- internal: test both children ----
        is_int = active & (node >= 0)
        n = jnp.maximum(node, 0)
        f = wf[n]
        w = wi[n]
        lh = is_int & slab(f[:, 0:6], st.t)
        rh = is_int & slab(f[:, 6:12], st.t)

        def enc(code, cnt):
            first = -code - 1
            leaf = -(first + jnp.minimum(cnt - 1, TREELET - 1)) - 2
            return jnp.where(code >= 0, code, leaf)

        le = enc(w[:, 0], w[:, 2])
        re_ = enc(w[:, 1], w[:, 3])
        both = lh & rh
        nxt = jnp.where(lh, le, jnp.where(rh, re_, -1))
        stack = st.stack.at[rows, jnp.minimum(sp, STACK_DEPTH - 1)].set(
            jnp.where(both, re_,
                      st.stack[rows, jnp.minimum(sp, STACK_DEPTH - 1)]))
        sp = jnp.where(both, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        # ---- leaf (node <= -2): test its triangles ----
        is_leaf = active & (node <= -2)
        lv = jnp.maximum(-node - 2, 0)
        first = (lv >> TSHIFT) << TSHIFT
        count = jnp.where(is_leaf, (lv & (TREELET - 1)) + 1, 0)
        t_best, prim, uu, vv = st.t, st.prim, st.u, st.v

        def leaf_step(k, carry):
            t_best, prim, uu, vv = carry
            tri = jnp.minimum(first + k, max(n_tri - 1, 0))
            ok, tq, uq, vq = _moller_trumbore(
                o_obj, d_obj, tri_v0[tri], tri_e1[tri], tri_e2[tri])
            ok = ok & (k < count) & (tq > T_MIN) & (tq < t_best)
            t_best = jnp.where(ok, tq, t_best)
            prim = jnp.where(ok, tri.astype(i32), prim)
            uu = jnp.where(ok, uq, uu)
            vv = jnp.where(ok, vq, vv)
            return t_best, prim, uu, vv

        t_best, prim, uu, vv = jax.lax.fori_loop(
            0, TREELET, leaf_step, (t_best, prim, uu, vv))

        node = jnp.where(is_int, nxt, jnp.where(active, -1, node))
        return _S(node=node, sp=sp, stack=stack, done=done,
                  t=t_best, prim=prim, u=uu, v=vv, iters=st.iters + 1)

    def cond(st: _S):
        return jnp.any(~st.done) & (st.iters < MAX_ITERS)

    t_lim = jnp.broadcast_to(jnp.asarray(t_limit, jnp.float32), (N,))
    init = _S(
        node=jnp.where(valid, roots, -1),
        sp=jnp.zeros(N, i32),
        stack=jnp.zeros((N, STACK_DEPTH), i32),
        done=~valid,
        t=t_lim,
        prim=jnp.full(N, -1, i32),
        u=jnp.zeros(N, jnp.float32),
        v=jnp.zeros(N, jnp.float32),
        iters=jnp.int32(0),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out.t, out.prim, out.u, out.v


@functools.partial(jax.jit, static_argnames=("K",))
def twophase_closest_hit(scene, ray_o, ray_d, t_limit=T_MAX, K: int = 8):
    """Reference two-phase closest hit: phase A TLAS entries -> (ray,
    entry) items -> per-item single-BLAS walks -> per-ray min-t merge.

    Semantics note on truncation: rays whose K-list filled AND whose best
    hit lies beyond the last kept entry t may have missed a nearer hit in
    a dropped instance; `truncated` marks them for a fallback retrace.
    Returns (Hit-tuple fields, truncated mask)."""
    from rfw_tpu.render.intersect import Hit

    R = ray_o.shape[0]
    ents = tlas_entries(
        jnp.asarray(scene.tlas_wide_f), jnp.asarray(scene.tlas_wide_i),
        ray_o, ray_d, t_limit, K=K)

    # expand to items (R*K): object-space rays per entry instance
    inst = ents.inst.reshape(-1)
    valid = inst >= 0
    iid = jnp.maximum(inst, 0)
    inv = jnp.asarray(scene.inst_inv)[iid][:, :3, :]  # (N,3,4)
    o_rep = jnp.repeat(ray_o, K, axis=0)
    d_rep = jnp.repeat(ray_d, K, axis=0)
    o_obj = jnp.einsum("nab,nb->na", inv[:, :, :3], o_rep) + inv[:, :, 3]
    d_obj = jnp.einsum("nab,nb->na", inv[:, :, :3], d_rep)
    roots = jnp.asarray(scene.blas_wide_root)[iid]

    t, prim, u, v = _blas_walk_items(scene, o_obj, d_obj, roots, valid,
                                     t_limit)

    # per-ray min-t merge over the K item slots
    t = t.reshape(R, K)
    prim = prim.reshape(R, K)
    u = u.reshape(R, K)
    v = v.reshape(R, K)
    j = jnp.argmin(t, axis=1)
    rows = jnp.arange(R)
    prim_sel = prim[rows, j]
    hit = Hit(
        t[rows, j], prim_sel,
        jnp.where(prim_sel >= 0, ents.inst[rows, j], -1),
        u[rows, j], v[rows, j],
    )
    full = ents.inst[:, K - 1] >= 0
    truncated = full & (hit.t > ents.t_entry[:, K - 1])
    return hit, truncated
