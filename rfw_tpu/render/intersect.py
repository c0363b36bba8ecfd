"""Ray-scene intersection: numpy oracle + lockstep two-level BVH traversal (jnp).

The jnp traversal is the *correctness* path: it runs under jit on TPU and
CPU alike and is pixel-matched against the brute-force oracle in tests
(SURVEY.md §4 — the oracle the reference never had). The Pallas packet
traversal in rfw_tpu.ops is the *performance* path and must match this one.

Semantics mirror the reference's traversal stack (gpu-rt intersection.glsl
stackful BVH + Moller-Trumbore; two-level TLAS->BLAS with per-instance ray
transform like gpu-rt TopBindings): watertight enough for parity at 1e-3
RMSE; backface hits are reported (double-sided) exactly like the
reference's intersector.

Design notes (TPU):
  * All rays advance in lockstep through a `lax.while_loop`; each ray owns
    a short stack (node id, instance id) in HBM. Divergence costs lockstep
    iterations but every op is a wide VPU gather/select — no scalar loops.
  * Entering a TLAS leaf switches the ray into the instance's object space
    (recomputed per step from the current instance id — cheap vector math
    beats carrying per-ray cached rays through control flow).
  * EPSILON/T_MIN/T_MAX follow the reference constants
    (rfw-scene/src/constants.rs:1-4).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rfw_tpu.accel.bvh_cpu import TREELET

EPSILON = 1e-4
T_MIN = 1e-5
T_MAX = 1e26
STACK_DEPTH = 64
MAX_LEAF = TREELET  # BLAS leaf capacity (treelet leaves, accel.bvh_cpu)
MAX_ITERS = 1 << 20  # lockstep safety cap (mirrors packet.MAX_ITERS): a
#   malformed BVH must yield a wrong-but-bounded result, not a hang


# --------------------------------------------------------------------- oracle
def brute_force_closest(
    ray_o: np.ndarray, ray_d: np.ndarray,
    v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
    t_min: float = T_MIN, t_max: float = T_MAX,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Numpy oracle: closest hit of R rays against T triangles, O(R*T).

    Returns (t, prim, u, v); prim == -1 for miss. Batched over triangles to
    bound memory."""
    R = ray_o.shape[0]
    best_t = np.full(R, t_max, np.float32)
    best_p = np.full(R, -1, np.int32)
    best_u = np.zeros(R, np.float32)
    best_v = np.zeros(R, np.float32)
    CHUNK = max(1, 8_000_000 // max(R, 1))
    for s in range(0, v0.shape[0], CHUNK):
        tv0 = v0[s : s + CHUNK]
        te1 = e1[s : s + CHUNK]
        te2 = e2[s : s + CHUNK]
        # Moller-Trumbore, broadcast (R,1,3) x (1,T,3)
        pvec = np.cross(ray_d[:, None, :], te2[None, :, :])
        det = np.sum(te1[None] * pvec, axis=-1)
        inv_det = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
        tvec = ray_o[:, None, :] - tv0[None]
        u = np.sum(tvec * pvec, axis=-1) * inv_det
        qvec = np.cross(tvec, te1[None])
        v = np.sum(ray_d[:, None, :] * qvec, axis=-1) * inv_det
        t = np.sum(te2[None] * qvec, axis=-1) * inv_det
        hit = (
            (np.abs(det) > 1e-12)
            & (u >= -1e-7) & (v >= -1e-7) & (u + v <= 1 + 1e-7)
            & (t > t_min) & (t < best_t[:, None])
        )
        t_masked = np.where(hit, t, np.inf)
        j = np.argmin(t_masked, axis=1)
        rows = np.arange(R)
        better = t_masked[rows, j] < best_t
        best_t = np.where(better, t[rows, j], best_t)
        best_p = np.where(better, (s + j).astype(np.int32), best_p)
        best_u = np.where(better, u[rows, j], best_u)
        best_v = np.where(better, v[rows, j], best_v)
    return best_t, best_p, best_u, best_v


# ----------------------------------------------------------------- jnp helpers
def _ray_aabb(o, inv_d, t_best, bmin, bmax):
    """Slab test; returns (hit, tnear). o/inv_d: (R,3); bmin/bmax: (R,3)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    tnear = jnp.max(tsm, axis=-1)
    tfar = jnp.min(tbg, axis=-1)
    hit = (tnear <= tfar) & (tfar > T_MIN) & (tnear < t_best)
    return hit, tnear


def _moller_trumbore(o, d, v0, e1, e2):
    """Vectorized MT; returns (ok, t, u, v). All (R,3) inputs."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1, det), 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = (
        (jnp.abs(det) > 1e-12)
        & (u >= -1e-7) & (v >= -1e-7) & (u + v <= 1 + 1e-7)
    )
    return ok, t, u, v


class Hit(NamedTuple):
    t: jax.Array  # (R,) f32 — t_max on miss
    prim: jax.Array  # (R,) i32 global triangle id, -1 on miss
    inst: jax.Array  # (R,) i32 instance id, -1 on miss
    u: jax.Array  # (R,) f32 barycentric
    v: jax.Array  # (R,) f32


def _traversal(scene, ray_o, ray_d, t_limit, any_hit: bool):
    """Shared lockstep two-level traversal core.

    any_hit=False: closest hit. any_hit=True: occlusion — stops a ray at the
    first accepted hit (prim set to any hit id).
    """
    R = ray_o.shape[0]
    f32 = jnp.float32
    i32 = jnp.int32

    n_tlas_leaf_inst = scene.tlas_prim.shape[0] > 0

    class State(NamedTuple):
        node: jax.Array  # (R,) current node, -1 => pop
        inst: jax.Array  # (R,) current instance (-1 = in TLAS)
        sp: jax.Array  # (R,)
        stack_node: jax.Array  # (R,D)
        stack_inst: jax.Array  # (R,D)
        t: jax.Array
        prim: jax.Array
        hit_inst: jax.Array
        u: jax.Array
        v: jax.Array
        done: jax.Array  # (R,) bool
        iters: jax.Array  # () i32 safety counter

    def obj_ray(inst):
        """Current-space ray for each lane (world if inst < 0)."""
        safe = jnp.maximum(inst, 0)
        inv = scene.inst_inv[safe]  # (R,4,4)
        o = jnp.einsum("rij,rj->ri", inv[:, :3, :3], ray_o) + inv[:, :3, 3]
        d = jnp.einsum("rij,rj->ri", inv[:, :3, :3], ray_d)
        in_tlas = (inst < 0)[:, None]
        return jnp.where(in_tlas, ray_o, o), jnp.where(in_tlas, ray_d, d)

    def cond(s: State):
        return jnp.any(~s.done) & (s.iters < MAX_ITERS)

    def body(s: State):
        rows = jnp.arange(R)
        # -- pop phase: lanes with node == -1 pop or finish
        need_pop = (s.node < 0) & ~s.done
        can_pop = need_pop & (s.sp > 0)
        newly_done = need_pop & (s.sp == 0)
        sp_pop = jnp.where(can_pop, s.sp - 1, s.sp)
        popped_node = s.stack_node[rows, jnp.maximum(sp_pop, 0)]
        popped_inst = s.stack_inst[rows, jnp.maximum(sp_pop, 0)]
        node = jnp.where(can_pop, popped_node, s.node)
        inst = jnp.where(can_pop, popped_inst, s.inst)
        sp = sp_pop
        done = s.done | newly_done
        active = ~done & (node >= 0)

        in_tlas = inst < 0
        o, d = obj_ray(inst)
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)

        # -- fetch node fields from the right arena per lane
        nsafe = jnp.maximum(node, 0)
        tl_count = scene.tlas_count[nsafe]
        tl_left = scene.tlas_left[nsafe]
        tl_right = scene.tlas_right[nsafe]
        bl_count = scene.blas_count[nsafe]
        bl_left = scene.blas_left[nsafe]
        bl_right = scene.blas_right[nsafe]
        count = jnp.where(in_tlas, tl_count, bl_count)
        left = jnp.where(in_tlas, tl_left, bl_left)
        right = jnp.where(in_tlas, tl_right, bl_right)
        is_leaf = count > 0

        # ---------- internal nodes: test both children -------------------
        lsafe = jnp.maximum(left, 0)
        rsafe = jnp.maximum(right, 0)
        lmin = jnp.where(in_tlas[:, None], scene.tlas_min[lsafe], scene.blas_min[lsafe])
        lmax = jnp.where(in_tlas[:, None], scene.tlas_max[lsafe], scene.blas_max[lsafe])
        rmin = jnp.where(in_tlas[:, None], scene.tlas_min[rsafe], scene.blas_min[rsafe])
        rmax = jnp.where(in_tlas[:, None], scene.tlas_max[rsafe], scene.blas_max[rsafe])
        lhit, lt = _ray_aabb(o, inv_d, s.t, lmin, lmax)
        rhit, rt = _ray_aabb(o, inv_d, s.t, rmin, rmax)

        internal = active & ~is_leaf
        both = internal & lhit & rhit
        near_is_left = lt <= rt
        near = jnp.where(near_is_left, left, right)
        far = jnp.where(near_is_left, right, left)
        one = internal & (lhit ^ rhit)
        only = jnp.where(lhit, left, right)

        # push far child when both hit
        push = both
        stack_node = s.stack_node.at[rows, jnp.minimum(sp, STACK_DEPTH - 1)].set(
            jnp.where(push, far, s.stack_node[rows, jnp.minimum(sp, STACK_DEPTH - 1)])
        )
        stack_inst = s.stack_inst.at[rows, jnp.minimum(sp, STACK_DEPTH - 1)].set(
            jnp.where(push, inst, s.stack_inst[rows, jnp.minimum(sp, STACK_DEPTH - 1)])
        )
        sp = jnp.where(push, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        next_node = jnp.where(
            internal,
            jnp.where(both, near, jnp.where(one, only, -1)),
            node,
        )

        # ---------- TLAS leaves: descend into the instance ---------------
        tlas_leaf = active & is_leaf & in_tlas
        inst_id = scene.tlas_prim[jnp.clip(left, 0, max(scene.tlas_prim.shape[0] - 1, 0))] if n_tlas_leaf_inst else jnp.zeros(R, i32)
        new_inst = jnp.where(tlas_leaf, inst_id, inst)
        blas_root_id = scene.blas_root[jnp.maximum(new_inst, 0)] if scene.blas_root.shape[0] else jnp.zeros(R, i32)
        next_node = jnp.where(tlas_leaf, blas_root_id, next_node)
        inst = new_inst

        # ---------- BLAS leaves: intersect up to MAX_LEAF triangles ------
        blas_leaf = active & is_leaf & ~in_tlas
        t_best, p_best, i_best, u_best, v_best = s.t, s.prim, s.hit_inst, s.u, s.v
        # o/d recompute for lanes that just switched instance? No: lanes at a
        # BLAS leaf had inst >= 0 *before* this step, so o/d are correct.
        T_total = scene.tri_v0.shape[0]
        if T_total:
            def leaf_step(k, carry):
                t_best, p_best, i_best, u_best, v_best = carry
                tri = jnp.clip(left + k, 0, max(T_total - 1, 0))
                valid = blas_leaf & (k < count)
                ok, t, uu, vv = _moller_trumbore(
                    o, d, scene.tri_v0[tri], scene.tri_e1[tri], scene.tri_e2[tri]
                )
                accept = valid & ok & (t > T_MIN) & (t < t_best) & (t < t_limit)
                return (
                    jnp.where(accept, t, t_best),
                    jnp.where(accept, tri, p_best),
                    jnp.where(accept, inst, i_best),
                    jnp.where(accept, uu, u_best),
                    jnp.where(accept, vv, v_best),
                )

            # fori_loop bounded by this step's max leaf occupancy (treelet
            # leaves can hold up to MAX_LEAF tris — unrolling would bloat
            # the while body; non-leaf steps cost zero iterations)
            kmax = jnp.max(jnp.where(blas_leaf, count, 0))
            t_best, p_best, i_best, u_best, v_best = jax.lax.fori_loop(
                0, kmax, leaf_step,
                (t_best, p_best, i_best, u_best, v_best),
            )

        next_node = jnp.where(blas_leaf, -1, next_node)

        if any_hit:
            done = done | (p_best >= 0)

        return State(
            node=jnp.where(done, -1, next_node),
            inst=inst,
            sp=sp,
            stack_node=stack_node,
            stack_inst=stack_inst,
            t=t_best, prim=p_best, hit_inst=i_best, u=u_best, v=v_best,
            done=done,
            iters=s.iters + 1,
        )

    init = State(
        node=jnp.zeros(R, i32),  # TLAS root
        inst=jnp.full(R, -1, i32),
        sp=jnp.zeros(R, i32),
        stack_node=jnp.zeros((R, STACK_DEPTH), i32),
        stack_inst=jnp.full((R, STACK_DEPTH), -1, i32),
        t=jnp.minimum(jnp.asarray(t_limit, f32) * jnp.ones(R, f32), T_MAX),
        prim=jnp.full(R, -1, i32),
        hit_inst=jnp.full(R, -1, i32),
        u=jnp.zeros(R, f32),
        v=jnp.zeros(R, f32),
        done=jnp.zeros(R, bool) if scene.inst_matrix.shape[0] else jnp.ones(R, bool),
        iters=jnp.zeros((), i32),
    )
    final = jax.lax.while_loop(cond, body, init)
    return Hit(final.t, final.prim, final.hit_inst, final.u, final.v)


def bvh_closest_hit(scene, ray_o: jax.Array, ray_d: jax.Array, t_limit=T_MAX) -> Hit:
    """Closest-hit query for R rays against the packed two-level scene."""
    return _traversal(scene, ray_o, ray_d, t_limit, any_hit=False)


def bvh_occluded(scene, ray_o: jax.Array, ray_d: jax.Array, t_limit) -> jax.Array:
    """Occlusion query: True where any geometry lies in (T_MIN, t_limit)."""
    hit = _traversal(scene, ray_o, ray_d, t_limit, any_hit=True)
    return hit.prim >= 0
