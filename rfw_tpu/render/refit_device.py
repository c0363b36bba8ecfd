"""On-device dynamic geometry: LBS skinning + morphs + BVH refit in one jit.

Reference semantics: vertex skinning with normal/tangent inverse-transpose
(crates/rfw-backend/src/structs.rs:785-877, backends/wgpu/shaders/
mesh_anim.vert:1-53, shaders/skinning.comp:1-38) and per-mesh BVH refit
(backends/gpu-rt/src/lib.rs:1345-1384).

TPU design (not a port): the reference re-skins in a vertex shader every
draw; a ray tracer needs the deformed geometry *and* refit acceleration
structures in memory. Round 2 did all of that on host (einsum + C++ refit)
and re-uploaded multi-MB arenas over a 26-60 MB/s tunnel every animated
frame (~190 ms/frame steady state). Here the per-frame upload is joint
matrices + morph weights (KBs); one jitted `apply_dynamic` then runs on
device:

  * LBS over rest vertices (einsum on the MXU/VPU), normals through the
    blend-matrix cofactor (== inverse-transpose direction), tangents
    through the blend itself, handedness by det sign — matching the host
    `skin_mesh_attributes` bit-for-bit in structure;
  * re-bakes the triangle arena slices (Moller-Trumbore v0/e1/e2 and the
    32-lane tri_shade shading record) with static uv columns;
  * refits every acceleration mirror bottom-up with a STATIC topology
    schedule (host-precomputed scatter maps + level index arrays, so the
    whole refit is gathers/scatter-mins and a short static loop over
    levels — no data-dependent control flow):
      2-ary BLAS nodes -> 2-wide blas_wide_f -> 8-wide blas8_box,
      then instance world AABBs -> 2-ary TLAS -> tlas_wide_f -> tlas8_box.

Plans (`build_unit_plan`, `build_tlas_plan`) are rebuilt on host after any
full repack; `apply_dynamic` is pure and jit-cached for the plan's shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np

from rfw_tpu.render.pack import TraceScene


class UnitPlan(NamedTuple):
    """Static per-deformable-unit metadata (one skinned/morphed mesh copy).

    All arrays live on device; every index is LOCAL to the unit's arena
    slices unless named *_lo (the slice offsets into the global arenas).
    Sentinel convention: gather/scatter maps use one-past-the-end rows so
    fillers fall off the buffers functionally.
    """

    # rest-pose vertex data
    rest_pos: np.ndarray  # (V,3) f32
    rest_nrm: np.ndarray  # (V,3)
    rest_tan: np.ndarray  # (V,4) xyz + handedness
    joints: np.ndarray  # (V,4) i32
    weights: np.ndarray  # (V,4) f32
    morph_pos: np.ndarray  # (M,V,3) position deltas (M may be 0)
    morph_nrm: np.ndarray  # (M,V,3) NORMAL deltas (zeros when absent)
    morph_tan: np.ndarray  # (M,V,3) TANGENT xyz deltas (zeros when absent)

    # triangle arena slice (rows are leaf-ordered, TREELET-aligned)
    tri_lo: np.ndarray  # () i32 global row offset
    r0: np.ndarray  # (Trows,) i32 local vertex id, -1 = alignment filler
    r1: np.ndarray
    r2: np.ndarray
    uv_cols: np.ndarray  # (Trows,6) f32 static tri_shade uv columns (9:15)
    ml_cols: np.ndarray  # (Trows,2) f32 static tri_shade mat/light id
    #   columns (29:31) — pose-invariant, preserved through device refit
    lodf: np.ndarray  # (Trows,) f32 static texture-LOD factor — the
    #   reference computes LOD once at mesh-set time from the REST pose
    #   (objects_3d/mod.rs:355-358); keeping it static also keeps the
    #   device path bit-comparable with the host pack

    # 2-ary node slice
    node_lo: np.ndarray  # () i32
    leaf_of_row: np.ndarray  # (Trows,) i32 local leaf node id, N = filler
    levels: Tuple[Tuple[np.ndarray, np.ndarray, np.ndarray], ...]
    #   deepest-first internal levels: (ids, lchild, rchild) local
    node_shape: np.ndarray  # (N,0) zero-width shape carrier: keeps the
    #   static node count in the pytree (plans stay plain jit arguments —
    #   a rebuild with unchanged shapes hits the jit cache)

    # 2-wide mirror slice
    wide_lo: np.ndarray  # () i32
    internals: np.ndarray  # (Nw,) i32 internal node local ids in wide order
    wide_l: np.ndarray  # (Nw,) i32 left child node local id
    wide_r: np.ndarray  # (Nw,) i32 right child node local id
    wide_syn: np.ndarray  # (1,0) if single-leaf-root synthetic else (0,0)

    # 8-wide mirror slice
    w8_lo: np.ndarray  # () i32
    row_to_w8: np.ndarray  # (Trows,) i32 s*8+k scatter target, S*8 = none
    levels8: Tuple[Tuple[np.ndarray, np.ndarray], ...]
    #   deepest-first internal child levels: (targets s*8+k, source s')
    w8_shape: np.ndarray  # (S,0) zero-width shape carrier

    # instances of this unit
    inst_rows: np.ndarray  # (Ii,) i32 global instance indices


class TlasPlan(NamedTuple):
    """TLAS refit metadata (topology from the last host build).

    Unlike the BLAS unit plans (static topology -> exact level schedule),
    the TLAS topology changes shape every instance repack; per-level index
    arrays would retrace apply_dynamic's jit each frame. So the TLAS refit
    is SHAPE-STABLE: every array is padded to the scene's capacity (with
    one-past-the-end scatter sentinels) and the bottom-up propagation runs
    as `passes` Jacobi sweeps over ALL internal nodes — after k sweeps all
    nodes within k of the deepest leaf are correct, so passes >= tree
    depth converges. Pass count is rounded up (hysteresis) so only a
    depth-bucket change retraces."""

    leaf_nodes: np.ndarray  # (Icap,) i32 leaf node id, sentinel Ncap
    leaf_inst: np.ndarray  # (Icap,) i32 instance id per leaf, 0-padded
    internals: np.ndarray  # (Ncap,) i32 internal node ids, sentinel Ncap
    int_l: np.ndarray  # (Ncap,) i32 left child, 0-padded
    int_r: np.ndarray  # (Ncap,) i32 right child, 0-padded
    wide_row: np.ndarray  # (Ncap,) i32 2-wide mirror row per internal,
    #   sentinel Nwcap
    wide_syn: np.ndarray  # (1,0) if single-leaf-root synthetic else (0,0)
    leaf8_targets: np.ndarray  # (Icap,) i32 s*8+k, sentinel Scap*8
    leaf8_inst: np.ndarray  # (Icap,) i32, 0-padded
    int8_targets: np.ndarray  # (Scap,) i32 s*8+k, sentinel Scap*8
    int8_sources: np.ndarray  # (Scap,) i32 source supernode, 0-padded
    passes_shape: np.ndarray  # (D,0) zero-width: Jacobi sweep count
    node_shape: np.ndarray  # (Ncap,0) zero-width shape carrier
    wide_shape: np.ndarray  # (Nwcap,0)
    w8_shape: np.ndarray  # (Scap,0)


# --------------------------------------------------------------- host plans
def _node_levels(left: np.ndarray, right: np.ndarray, count: np.ndarray):
    """Group INTERNAL nodes by depth, deepest first. Children always have
    higher indices than parents (bvh_cpu layout), so one forward pass
    computes depths."""
    n = len(count)
    depth = np.zeros(n, np.int32)
    internal = count == 0
    for i in range(n):
        if internal[i]:
            depth[left[i]] = depth[i] + 1
            depth[right[i]] = depth[i] + 1
    ids = np.nonzero(internal)[0]
    out = []
    if len(ids):
        for d in range(int(depth[ids].max()), -1, -1):
            lvl = ids[depth[ids] == d]
            if len(lvl):
                out.append((lvl.astype(np.int32),
                            left[lvl].astype(np.int32),
                            right[lvl].astype(np.int32)))
    return tuple(out)


def _wide8_levels(code: np.ndarray, cnt: np.ndarray):
    """Derive the bottom-up internal-child schedule of an 8-wide mirror
    from (code, cnt) alone (builder-agnostic: works for the C++ and the
    Python collapse).

    A supernode's own box equals the union of its 8 child boxes, so an
    internal child slot (s,k) -> s' refits as union(row s'). Returns
    deepest-first levels of (targets = s*8+k, sources = s')."""
    S = code.shape[0]
    depth = np.zeros(S, np.int32)
    targets, sources, src_depth = [], [], []
    for s in range(S):
        for k in range(8):
            c = int(code[s, k])
            if c >= 0:
                depth[c] = depth[s] + 1
    for s in range(S):
        for k in range(8):
            c = int(code[s, k])
            if c >= 0:
                targets.append(s * 8 + k)
                sources.append(c)
                src_depth.append(depth[c])
    if not targets:
        return tuple()
    targets = np.asarray(targets, np.int32)
    sources = np.asarray(sources, np.int32)
    src_depth = np.asarray(src_depth, np.int32)
    out = []
    for d in range(int(src_depth.max()), -1, -1):
        m = src_depth == d
        if m.any():
            out.append((targets[m], sources[m]))
    return tuple(out)


def build_unit_plan(
    scene: TraceScene,
    ranges: dict,
    rest_pos: np.ndarray,
    rest_nrm: np.ndarray,
    rest_tan: np.ndarray,
    joints: Optional[np.ndarray],
    weights: Optional[np.ndarray],
    morph_targets: Optional[np.ndarray],
    morph_normals: Optional[np.ndarray] = None,
    morph_tangents: Optional[np.ndarray] = None,
) -> UnitPlan:
    """Extract one unit's static refit metadata from the packed scene.

    ranges: the pack's per-mesh arena ranges (pack_trace_scene
    mesh_ranges_out entry): tri/node/wide/w8 (lo, hi) pairs.
    """
    t_lo, t_hi = ranges["tri"]
    n_lo, n_hi = ranges["node"]
    w_lo, w_hi = ranges["wide"]
    s_lo, s_hi = ranges["w8"]
    rows = t_hi - t_lo
    N = n_hi - n_lo

    # 2-ary topology (local index space)
    count = scene.blas_count[n_lo:n_hi]
    left_g = scene.blas_left[n_lo:n_hi]
    right_g = scene.blas_right[n_lo:n_hi]
    is_leaf = count > 0
    # leaves: left = global arena first-row; internals: left = global node id
    left = np.where(is_leaf, left_g - t_lo, left_g - n_lo).astype(np.int32)
    right = np.where(is_leaf, 0, right_g - n_lo).astype(np.int32)

    leaf_of_row = np.full(rows, N, np.int32)
    for li in np.nonzero(is_leaf)[0]:
        lo = int(left[li])
        leaf_of_row[lo:lo + int(count[li])] = li

    levels = _node_levels(left, right, count)

    # real rows are exactly the rows some leaf covers; the gaps are the
    # TREELET-alignment fillers (degenerate, never hit)
    valid = leaf_of_row < N
    v_lo = ranges["vtx"][0]
    gi0 = scene.tri_i0[t_lo:t_hi].astype(np.int64) - v_lo
    gi1 = scene.tri_i1[t_lo:t_hi].astype(np.int64) - v_lo
    gi2 = scene.tri_i2[t_lo:t_hi].astype(np.int64) - v_lo
    r0 = np.where(valid, gi0, -1).astype(np.int32)
    r1 = np.where(valid, gi1, -1).astype(np.int32)
    r2 = np.where(valid, gi2, -1).astype(np.int32)

    # static shading columns come straight from the packed REST scene
    uv_cols = scene.tri_shade[t_lo:t_hi, 9:15].astype(np.float32)
    ml_cols = scene.tri_shade[t_lo:t_hi, 29:31].astype(np.float32)
    lodf = scene.tri_lodf[t_lo:t_hi].astype(np.float32)

    # 2-wide mirror: wide rows mirror internal nodes in node order
    internals = np.nonzero(~is_leaf)[0].astype(np.int32)
    wide_synthetic = len(internals) == 0
    if wide_synthetic:
        wide_l = np.zeros(1, np.int32)
        wide_r = np.zeros(1, np.int32)
        internals = np.zeros(1, np.int32)
        assert w_hi - w_lo == 1
    else:
        wide_l = left[internals]
        wide_r = right[internals]
        assert w_hi - w_lo == len(internals), (w_hi - w_lo, len(internals))

    # 8-wide mirror: leaf children scatter rows by payload range
    S = s_hi - s_lo
    code = scene.blas8_code[s_lo:s_hi].copy()
    cnt8 = scene.blas8_cnt[s_lo:s_hi]
    code = np.where(code >= 0, code - s_lo, code)
    row_to_w8 = np.full(rows, S * 8, np.int32)
    for s in range(S):
        for k in range(8):
            c = int(code[s, k])
            # leaf child: code = -(first+1); code==-1 is ambiguous (first
            # tri 0 vs unused slot) — cnt>0 disambiguates
            if c < 0 and (c != -1 or cnt8[s, k] > 0):
                first = -c - 1 - t_lo
                row_to_w8[first:first + int(cnt8[s, k])] = s * 8 + k
    levels8 = _wide8_levels(code, cnt8)

    V = rest_pos.shape[0]
    if joints is None:
        joints = np.zeros((V, 4), np.int32)
        weights = np.zeros((V, 4), np.float32)
    if morph_targets is None:
        morph_targets = np.zeros((0, V, 3), np.float32)
    M = morph_targets.shape[0]
    if morph_normals is None:
        morph_normals = np.zeros((M, V, 3), np.float32)
    if morph_tangents is None:
        morph_tangents = np.zeros((M, V, 3), np.float32)

    return UnitPlan(
        rest_pos=rest_pos.astype(np.float32),
        rest_nrm=rest_nrm.astype(np.float32),
        rest_tan=rest_tan.astype(np.float32),
        joints=joints.astype(np.int32),
        weights=weights.astype(np.float32),
        morph_pos=np.asarray(morph_targets, np.float32),
        morph_nrm=np.asarray(morph_normals, np.float32),
        morph_tan=np.asarray(morph_tangents, np.float32),
        tri_lo=np.int32(t_lo), r0=r0, r1=r1, r2=r2,
        uv_cols=uv_cols, ml_cols=ml_cols, lodf=lodf,
        node_lo=np.int32(n_lo), leaf_of_row=leaf_of_row, levels=levels,
        node_shape=np.zeros((N, 0), np.float32),
        wide_lo=np.int32(w_lo), internals=internals,
        wide_l=wide_l, wide_r=wide_r,
        wide_syn=np.zeros((1 if wide_synthetic else 0, 0), np.float32),
        w8_lo=np.int32(s_lo), row_to_w8=row_to_w8, levels8=levels8,
        w8_shape=np.zeros((S, 0), np.float32),
        inst_rows=np.zeros(0, np.int32),  # filled by caller
    )


def build_tlas_plan(scene: TraceScene, min_passes: int = 4) -> TlasPlan:
    """TLAS refit metadata from the packed (padded) scene arrays.

    Shape-stable by construction (see TlasPlan): every output is padded
    to the scene's capacity, so rebuilding after an instance repack keeps
    apply_dynamic's jit cache warm. The logical tree is recovered by BFS
    from the root (padded rows masquerade as internal nodes pointing at
    node 0 and must not be touched)."""
    left_a = scene.tlas_left.astype(np.int32)
    right_a = scene.tlas_right.astype(np.int32)
    count_a = scene.tlas_count.astype(np.int32)
    Ncap = left_a.shape[0]
    Icap = scene.inst_mesh.shape[0]
    Nwcap = scene.tlas_wide_f.shape[0]
    Scap = scene.tlas8_code.shape[0]

    if int((scene.inst_mesh >= 0).sum()) == 0:
        # empty scene: node 0 is a padding row whose 0-children would
        # cycle the BFS — emit an all-sentinel no-op plan
        z = np.zeros((0, 0), np.float32)
        return TlasPlan(
            leaf_nodes=np.full(Icap, Ncap, np.int32),
            leaf_inst=np.zeros(Icap, np.int32),
            internals=np.full(Ncap, Ncap, np.int32),
            int_l=np.zeros(Ncap, np.int32),
            int_r=np.zeros(Ncap, np.int32),
            wide_row=np.full(Ncap, Nwcap, np.int32),
            wide_syn=z,
            leaf8_targets=np.full(Icap, Scap * 8, np.int32),
            leaf8_inst=np.zeros(Icap, np.int32),
            int8_targets=np.full(Scap, Scap * 8, np.int32),
            int8_sources=np.zeros(Scap, np.int32),
            passes_shape=np.zeros((4, 0), np.float32),
            node_shape=np.zeros((Ncap, 0), np.float32),
            wide_shape=np.zeros((Nwcap, 0), np.float32),
            w8_shape=np.zeros((Scap, 0), np.float32),
        )

    frontier = np.array([0], np.int32)
    leaf_nodes_l, leaf_inst_l, int_l = [], [], []
    depth = 0
    while frontier.size:
        depth += 1
        is_leaf = count_a[frontier] > 0
        leaves = frontier[is_leaf]
        if leaves.size:
            leaf_nodes_l.append(leaves)
            leaf_inst_l.append(scene.tlas_prim[left_a[leaves]])
        internal = frontier[~is_leaf]
        if internal.size:
            int_l.append(internal)
            frontier = np.concatenate([left_a[internal], right_a[internal]])
        else:
            frontier = np.zeros(0, np.int32)

    def pad_to(a, cap, fill):
        out = np.full(cap, fill, np.int32)
        out[: len(a)] = a
        return out

    leaf_nodes = (np.concatenate(leaf_nodes_l).astype(np.int32)
                  if leaf_nodes_l else np.zeros(0, np.int32))
    leaf_inst = (np.concatenate(leaf_inst_l).astype(np.int32)
                 if leaf_inst_l else np.zeros(0, np.int32))
    internals = (np.sort(np.concatenate(int_l)).astype(np.int32)
                 if int_l else np.zeros(0, np.int32))
    wide_synthetic = len(internals) == 0
    # 2-wide rows mirror internals in ascending node order
    wide_row = np.arange(len(internals), dtype=np.int32)

    # logical tlas8 prefix: BFS over internal-child codes from supernode 0
    code_a = scene.tlas8_code
    cnt_a = scene.tlas8_cnt
    seen = {0}
    stack = [0]
    while stack:
        s = stack.pop()
        for k in range(8):
            c = int(code_a[s, k])
            if c >= 0 and c not in seen:
                seen.add(c)
                stack.append(c)
    n_w8 = max(seen) + 1
    t8, i8, it8, is8 = [], [], [], []
    for s in range(n_w8):
        for k in range(8):
            c = int(code_a[s, k])
            if c >= 0:
                it8.append(s * 8 + k)
                is8.append(c)
            elif c != -1 or cnt_a[s, k] > 0:
                t8.append(s * 8 + k)
                i8.append(-c - 1)

    # Jacobi sweep count: tree depth with hysteresis so frame-to-frame
    # depth jitter doesn't retrace; tlas8 collapses 3 levels per hop so
    # the same count more than covers it. Callers pass their previous
    # plan's count as min_passes (monotonic high-water mark) so a scene
    # whose depth oscillates across a bucket boundary stops retracing
    # after the first growth.
    passes = max(min_passes, -(-depth // 4) * 4)
    return TlasPlan(
        leaf_nodes=pad_to(leaf_nodes, Icap, Ncap),
        leaf_inst=pad_to(leaf_inst, Icap, 0),
        internals=pad_to(internals, Ncap, Ncap),
        int_l=pad_to(left_a[internals], Ncap, 0),
        int_r=pad_to(right_a[internals], Ncap, 0),
        wide_row=pad_to(wide_row, Ncap, Nwcap),
        wide_syn=np.zeros((1 if wide_synthetic else 0, 0), np.float32),
        leaf8_targets=pad_to(np.asarray(t8, np.int32), Icap, Scap * 8),
        leaf8_inst=pad_to(np.asarray(i8, np.int32), Icap, 0),
        int8_targets=pad_to(np.asarray(it8, np.int32), Scap, Scap * 8),
        int8_sources=pad_to(np.asarray(is8, np.int32), Scap, 0),
        passes_shape=np.zeros((passes, 0), np.float32),
        node_shape=np.zeros((Ncap, 0), np.float32),
        wide_shape=np.zeros((Nwcap, 0), np.float32),
        w8_shape=np.zeros((Scap, 0), np.float32),
    )


# ------------------------------------------------------------- device apply
def _lbs_attributes(plan: UnitPlan, jm, morph_w):
    """Device LBS matching host skin_mesh_attributes semantics: positions
    by the blended matrix, normals by its cofactor (inverse-transpose
    direction incl. det sign), tangents by the blend, handedness flip on
    mirrored blends. All-zero weights (or a degenerate blend) keep rest
    attributes."""
    import jax.numpy as jnp

    p = plan.rest_pos
    base_n = plan.rest_nrm
    base_t4 = plan.rest_tan
    if plan.morph_pos.shape[0]:
        p = p + jnp.einsum("k,kvc->vc", morph_w, plan.morph_pos)
        # NORMAL/TANGENT morph deltas: displace, renormalize (glTF: morphs
        # apply before the skin). Zero deltas are exact no-ops.
        n = base_n + jnp.einsum("k,kvc->vc", morph_w, plan.morph_nrm)
        ln = jnp.linalg.norm(n, axis=-1, keepdims=True)
        base_n = jnp.where(ln > 1e-12, n / jnp.maximum(ln, 1e-12), base_n)
        t = base_t4[:, :3] + jnp.einsum("k,kvc->vc", morph_w, plan.morph_tan)
        lt = jnp.linalg.norm(t, axis=-1, keepdims=True)
        t = jnp.where(lt > 1e-12, t / jnp.maximum(lt, 1e-12), base_t4[:, :3])
        base_t4 = jnp.concatenate([t, base_t4[:, 3:4]], axis=1)
    if jm is None:
        return p, base_n, base_t4

    A = jnp.einsum("vj,vjab->vab", plan.weights, jm[plan.joints])  # (V,4,4)
    has_w = jnp.sum(plan.weights, axis=-1) > 1e-8
    pos = (jnp.einsum("vab,vb->va", A[:, :3, :3], p) + A[:, :3, 3])
    pos = jnp.where(has_w[:, None], pos, p)

    B = A[:, :3, :3]
    b0, b1, b2 = B[:, 0, :], B[:, 1, :], B[:, 2, :]
    cof_rows = jnp.stack(
        [jnp.cross(b1, b2), jnp.cross(b2, b0), jnp.cross(b0, b1)], axis=1
    )  # rows of det * inv(B)^T
    det = jnp.sum(b0 * jnp.cross(b1, b2), axis=-1)
    ok = has_w & (jnp.abs(det) > 1e-12)

    n = jnp.einsum("vab,vb->va", cof_rows, base_n)
    n = n * jnp.sign(det)[:, None]
    nl = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where(ok[:, None] & (nl > 1e-12), n / jnp.maximum(nl, 1e-12),
                  base_n)

    t = jnp.einsum("vab,vb->va", B, base_t4[:, :3])
    tl = jnp.linalg.norm(t, axis=-1, keepdims=True)
    t = jnp.where(ok[:, None] & (tl > 1e-12), t / jnp.maximum(tl, 1e-12),
                  base_t4[:, :3])
    handed = base_t4[:, 3:4] * jnp.where((det < 0)[:, None], -1.0, 1.0)
    handed = jnp.where(ok[:, None], handed, base_t4[:, 3:4])
    return pos, n, jnp.concatenate([t, handed], axis=1)


def _refit_unit(scene: TraceScene, plan: UnitPlan, jm, morph_w):
    """Rebuild one unit's arena slices from posed vertices. Returns
    (updated scene, (obj_min, obj_max)) — instance/TLAS refit happens in
    apply_dynamic once all units are in."""
    import jax.numpy as jnp
    from jax import lax

    f32 = jnp.float32
    pos, nrm, tan4 = _lbs_attributes(plan, jm, morph_w)

    valid = plan.r0 >= 0
    g = lambda arr, idx: arr[jnp.maximum(idx, 0)]
    v0 = jnp.where(valid[:, None], g(pos, plan.r0), 0.0)
    p1 = jnp.where(valid[:, None], g(pos, plan.r1), 0.0)
    p2 = jnp.where(valid[:, None], g(pos, plan.r2), 0.0)
    e1 = p1 - v0
    e2 = p2 - v0

    # tri_shade record (render/pack.py layout: n0 n1 n2 uv0 uv1 uv2 tan
    # handed e1 e2 lodf centroid mat light pad1 = 32 lanes)
    n0 = g(nrm, plan.r0)
    n1 = g(nrm, plan.r1)
    n2 = g(nrm, plan.r2)
    t0 = g(tan4, plan.r0)
    shade = jnp.concatenate([
        n0, n1, n2, plan.uv_cols, t0[:, :3], t0[:, 3:4],
        e1, e2, plan.lodf[:, None],
        v0 + (e1 + e2) / 3.0,  # lanes 26:29 centroid (pack.py layout)
    ], axis=1)
    # pose-dependent lanes masked on filler rows; the static mat/light id
    # columns append afterwards so fillers keep the packed values (-1
    # light) bit-identically with the host pack
    shade = jnp.where(valid[:, None], shade, 0.0)
    shade = jnp.concatenate(
        [shade, plan.ml_cols, jnp.zeros((v0.shape[0], 1), f32)], axis=1)

    # ---- 2-ary node refit (leaf scatter + static level loop) -------------
    mn_row = jnp.where(valid[:, None],
                       jnp.minimum(jnp.minimum(v0, p1), p2), jnp.inf)
    mx_row = jnp.where(valid[:, None],
                       jnp.maximum(jnp.maximum(v0, p1), p2), -jnp.inf)
    N = plan.node_shape.shape[0]
    nmin = jnp.full((N + 1, 3), jnp.inf, f32).at[plan.leaf_of_row].min(mn_row)
    nmax = jnp.full((N + 1, 3), -jnp.inf, f32).at[plan.leaf_of_row].max(mx_row)
    for ids, l, r in plan.levels:
        nmin = nmin.at[ids].set(jnp.minimum(nmin[l], nmin[r]))
        nmax = nmax.at[ids].set(jnp.maximum(nmax[l], nmax[r]))
    nmin = nmin[:N]
    nmax = nmax[:N]

    # ---- 2-wide mirror ---------------------------------------------------
    if plan.wide_syn.shape[0]:
        wf = jnp.concatenate([
            nmin[0:1], nmax[0:1],
            jnp.full((1, 3), jnp.inf, f32), jnp.full((1, 3), -jnp.inf, f32),
        ], axis=1)
    else:
        wf = jnp.concatenate([
            nmin[plan.wide_l], nmax[plan.wide_l],
            nmin[plan.wide_r], nmax[plan.wide_r],
        ], axis=1)

    # ---- 8-wide mirror (leaf scatter + bottom-up union levels) -----------
    S = plan.w8_shape.shape[0]
    mn8 = jnp.full((S * 8 + 1, 3), jnp.inf, f32).at[plan.row_to_w8].min(mn_row)
    mx8 = jnp.full((S * 8 + 1, 3), -jnp.inf, f32).at[plan.row_to_w8].max(mx_row)
    mn8 = mn8[: S * 8].reshape(S, 8, 3)
    mx8 = mx8[: S * 8].reshape(S, 8, 3)
    for targets, sources in plan.levels8:
        src_mn = jnp.min(mn8[sources], axis=1)
        src_mx = jnp.max(mx8[sources], axis=1)
        mn8 = mn8.reshape(S * 8, 3).at[targets].set(src_mn).reshape(S, 8, 3)
        mx8 = mx8.reshape(S * 8, 3).at[targets].set(src_mx).reshape(S, 8, 3)
    box8 = jnp.concatenate([mn8, mx8], axis=2).reshape(S, 48)

    # ---- write slices into the global arenas -----------------------------
    ds = lambda a, up, lo: lax.dynamic_update_slice_in_dim(a, up, lo, axis=0)
    scene = scene._replace(
        tri_v0=ds(scene.tri_v0, v0, plan.tri_lo),
        tri_e1=ds(scene.tri_e1, e1, plan.tri_lo),
        tri_e2=ds(scene.tri_e2, e2, plan.tri_lo),
        tri_shade=ds(scene.tri_shade, shade, plan.tri_lo),
        blas_min=ds(scene.blas_min, nmin, plan.node_lo),
        blas_max=ds(scene.blas_max, nmax, plan.node_lo),
        blas_wide_f=ds(scene.blas_wide_f, wf, plan.wide_lo),
        blas8_box=ds(scene.blas8_box, box8, plan.w8_lo),
    )
    obj_min = jnp.min(jnp.where(valid[:, None], mn_row, jnp.inf), axis=0)
    obj_max = jnp.max(jnp.where(valid[:, None], mx_row, -jnp.inf), axis=0)
    return scene, (obj_min, obj_max)


def _refit_tlas(scene: TraceScene, plan: TlasPlan, ibmin, ibmax):
    """Refit TLAS mirrors from per-instance world boxes (full arrays,
    already updated for the deformed units).

    Shape-stable Jacobi propagation: `passes` full sweeps over all
    internal nodes instead of a per-level schedule (see TlasPlan). Padding
    entries scatter into one-past-the-end sentinel rows."""
    import jax.numpy as jnp

    f32 = jnp.float32
    N = plan.node_shape.shape[0]
    passes = plan.passes_shape.shape[0]

    nmin = jnp.full((N + 1, 3), jnp.inf, f32).at[plan.leaf_nodes].set(
        ibmin[plan.leaf_inst])
    nmax = jnp.full((N + 1, 3), -jnp.inf, f32).at[plan.leaf_nodes].set(
        ibmax[plan.leaf_inst])
    for _ in range(passes):
        nmin = nmin.at[plan.internals].set(
            jnp.minimum(nmin[plan.int_l], nmin[plan.int_r]))
        nmax = nmax.at[plan.internals].set(
            jnp.maximum(nmax[plan.int_l], nmax[plan.int_r]))

    Nw = plan.wide_shape.shape[0]
    if plan.wide_syn.shape[0]:
        wf = scene.tlas_wide_f.at[0, 0:3].set(nmin[0]).at[0, 3:6].set(nmax[0])
    else:
        rows = jnp.concatenate([
            nmin[plan.int_l], nmax[plan.int_l],
            nmin[plan.int_r], nmax[plan.int_r],
        ], axis=1)
        wf = (jnp.concatenate([scene.tlas_wide_f,
                               jnp.zeros((1, 12), f32)])
              .at[plan.wide_row].set(rows)[:Nw])

    S = plan.w8_shape.shape[0]
    mn8 = jnp.full((S * 8 + 1, 3), jnp.inf, f32).at[plan.leaf8_targets].set(
        ibmin[plan.leaf8_inst])
    mx8 = jnp.full((S * 8 + 1, 3), -jnp.inf, f32).at[plan.leaf8_targets].set(
        ibmax[plan.leaf8_inst])
    for _ in range(passes):
        g_mn = mn8[: S * 8].reshape(S, 8, 3)[plan.int8_sources]
        g_mx = mx8[: S * 8].reshape(S, 8, 3)[plan.int8_sources]
        mn8 = mn8.at[plan.int8_targets].set(jnp.min(g_mn, axis=1))
        mx8 = mx8.at[plan.int8_targets].set(jnp.max(g_mx, axis=1))
    box8 = jnp.concatenate([
        mn8[: S * 8].reshape(S, 8, 3), mx8[: S * 8].reshape(S, 8, 3)
    ], axis=2).reshape(S, 48)

    return scene._replace(
        tlas_min=nmin[:N],
        tlas_max=nmax[:N],
        tlas_wide_f=wf,
        tlas8_box=box8,
        inst_aabb_min=ibmin,
        inst_aabb_max=ibmax,
    )


def apply_dynamic(
    scene: TraceScene,
    plans: Sequence[UnitPlan],
    tlas_plan: TlasPlan,
    poses: Sequence,  # per plan: (J,4,4) joint matrices or None
    morph_weights: Sequence,  # per plan: (M,) weights or None
) -> TraceScene:
    """One fused device update: skin/morph every unit, re-bake its arena
    slices, refit all BLAS mirrors, then instance boxes + TLAS mirrors.

    Pure function of (scene, poses, weights) for fixed plan shapes — the
    caller jits it with plans/tlas_plan closed over or passed as pytrees.
    """
    import jax.numpy as jnp

    ibmin = scene.inst_aabb_min
    ibmax = scene.inst_aabb_max
    for plan, jm, mw in zip(plans, poses, morph_weights):
        scene, (omin, omax) = _refit_unit(scene, plan, jm, mw)
        if plan.inst_rows.shape[0]:
            # world box via the |R| center/extent identity (equivalent to
            # the 8-corner hull for affine maps, fewer ops)
            mats = scene.inst_matrix[plan.inst_rows]  # (Ii,4,4)
            c = 0.5 * (omin + omax)
            e = 0.5 * (omax - omin)
            rot = mats[:, :3, :3]
            wc = jnp.einsum("iab,b->ia", rot, c) + mats[:, :3, 3]
            we = jnp.einsum("iab,b->ia", jnp.abs(rot), e)
            ibmin = ibmin.at[plan.inst_rows].set(wc - we)
            ibmax = ibmax.at[plan.inst_rows].set(wc + we)
    return _refit_tlas(scene, tlas_plan, ibmin, ibmax)


def instance_motion_update(
    scene: TraceScene,
    tlas_plan: TlasPlan,
    mats,  # (Icap,4,4) f32 object->world, capacity padding rows = identity
    local_min,  # (Icap,3) per-instance LOCAL mesh AABB (static per layout)
    local_max,  # (Icap,3)
    live,  # (Icap,) bool, False on capacity padding rows
) -> TraceScene:
    """Instance-motion-only device update: fresh object->world matrices in,
    every TLAS mirror plus the instance arrays refit ON DEVICE.

    Reference gpu-rt rebuilds its TLAS from instance AABBs every
    synchronize (backends/gpu-rt/src/lib.rs:1570-1581) — on host, every
    frame. Here the binary/2-wide/8-ary TLAS *topologies* are kept from the
    last host build and only their boxes refit (always a valid bound), so a
    steady-state moving-instance frame uploads one (Icap,4,4) matrix array
    and runs this single jit: inverse + normal (inverse-transpose) matrices,
    world AABBs via the |R|·extent identity (exact for affine maps), then
    the shared `_refit_tlas` Jacobi sweep. Zero host TLAS repack.
    """
    import jax.numpy as jnp

    inv = jnp.linalg.inv(mats)
    # affine inverse-transpose of the 3x3 block == transpose(inv[:3,:3])
    nrm = jnp.swapaxes(inv[:, :3, :3], 1, 2)
    c = 0.5 * (local_min + local_max)
    e = 0.5 * (local_max - local_min)
    rot = mats[:, :3, :3]
    wc = jnp.einsum("iab,ib->ia", rot, c) + mats[:, :3, 3]
    we = jnp.einsum("iab,ib->ia", jnp.abs(rot), e)
    inf = jnp.float32(jnp.inf)
    ibmin = jnp.where(live[:, None], wc - we, inf)
    ibmax = jnp.where(live[:, None], wc + we, -inf)
    scene = scene._replace(
        inst_matrix=mats.astype(jnp.float32),
        inst_inv=inv.astype(jnp.float32),
        inst_normal=nrm.astype(jnp.float32),
    )
    return _refit_tlas(scene, tlas_plan, ibmin, ibmax)


_apply_jit = None
_motion_jit = None


def apply_dynamic_jit():
    """Shared jitted apply_dynamic (module-level so every backend reuses
    one trace cache; identical plan/pose shapes never retrace)."""
    global _apply_jit
    if _apply_jit is None:
        import jax

        _apply_jit = jax.jit(apply_dynamic)
    return _apply_jit


def instance_motion_jit():
    """Shared jitted instance_motion_update (same caching rationale)."""
    global _motion_jit
    if _motion_jit is None:
        import jax

        _motion_jit = jax.jit(instance_motion_update)
    return _motion_jit
