"""BVH traversal vs brute-force oracle — the core correctness gate
(SURVEY.md §7 stage 3/4: pixel parity between device traversal and oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rfw_tpu.accel.bvh_cpu import build_bvh_sah, refit_bvh, triangle_aabbs
from rfw_tpu.models import cube, sphere
from rfw_tpu.mathx import compose_trs, quat_identity
from rfw_tpu.render import TraceScene, pack_trace_scene, bvh_closest_hit, bvh_occluded, brute_force_closest


def make_rays(n, rng, origin_box=2.0, target_box=1.0):
    o = rng.uniform(-origin_box, origin_box, (n, 3)).astype(np.float32)
    o[:, 2] += 4.0  # in front of the scene
    target = rng.uniform(-target_box, target_box, (n, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def world_tris(scene: TraceScene):
    """Expand all instances' triangles to world space for the oracle."""
    v0s, e1s, e2s = [], [], []
    for i in range(scene.num_instances):
        m = scene.inst_matrix[i]
        mesh = scene.inst_mesh[i]
        sel = scene.tri_mesh == mesh
        v0 = scene.tri_v0[sel] @ m[:3, :3].T + m[:3, 3]
        e1 = scene.tri_e1[sel] @ m[:3, :3].T
        e2 = scene.tri_e2[sel] @ m[:3, :3].T
        v0s.append(v0)
        e1s.append(e1)
        e2s.append(e2)
    return np.concatenate(v0s), np.concatenate(e1s), np.concatenate(e2s)


class TestSingleInstance:
    def test_sphere_matches_oracle(self, rng):
        mesh = sphere(quality=2)
        scene = pack_trace_scene([(0, mesh, None)], [(0, np.eye(4, dtype=np.float32)[None])])
        o, d = make_rays(512, rng)
        hit = jax.jit(bvh_closest_hit)(scene_dev(scene), jnp.asarray(o), jnp.asarray(d))
        t_ref, p_ref, _, _ = brute_force_closest(o, d, scene.tri_v0, scene.tri_e1, scene.tri_e2)
        t = np.asarray(hit.t)
        hit_mask = np.asarray(hit.prim) >= 0
        ref_mask = p_ref >= 0
        assert (hit_mask == ref_mask).all()
        np.testing.assert_allclose(t[hit_mask], t_ref[hit_mask], rtol=1e-4, atol=1e-5)
        # primitive ids agree (same tri arena indexing)
        assert (np.asarray(hit.prim)[hit_mask] == p_ref[hit_mask]).all()

    def test_miss_rays(self, rng):
        mesh = cube()
        scene = pack_trace_scene([(0, mesh, None)], [(0, np.eye(4, dtype=np.float32)[None])])
        o = np.tile(np.array([[5.0, 5.0, 5.0]], np.float32), (8, 1))
        d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (8, 1))
        hit = bvh_closest_hit(scene_dev(scene), jnp.asarray(o), jnp.asarray(d))
        assert (np.asarray(hit.prim) == -1).all()


class TestMultiInstance:
    def test_transformed_instances(self, rng):
        mesh = sphere(quality=1)
        box = cube()
        mats_a = []
        for k in range(5):
            t = np.array([k * 2.5 - 5.0, 0, 0], np.float32)
            s = np.full(3, 0.5 + 0.2 * k, np.float32)
            mats_a.append(compose_trs(t, quat_identity(), s))
        mats_b = [compose_trs(np.array([0, 2.5, 0], np.float32), quat_identity(), np.ones(3, np.float32))]
        scene = pack_trace_scene(
            [(0, mesh, None), (1, box, None)],
            [(0, np.stack(mats_a)), (1, np.stack(mats_b))],
        )
        o, d = make_rays(512, rng, origin_box=6.0, target_box=5.0)
        hit = jax.jit(bvh_closest_hit)(scene_dev(scene), jnp.asarray(o), jnp.asarray(d))
        wv0, we1, we2 = world_tris(scene)
        t_ref, p_ref, _, _ = brute_force_closest(o, d, wv0, we1, we2)
        hit_mask = np.asarray(hit.prim) >= 0
        ref_mask = p_ref >= 0
        assert (hit_mask == ref_mask).all()
        np.testing.assert_allclose(
            np.asarray(hit.t)[hit_mask], t_ref[hit_mask], rtol=1e-3, atol=1e-4
        )

    def test_occlusion(self, rng):
        mesh = cube(position=(0, 0, 0), size=(1, 1, 1))
        scene = pack_trace_scene([(0, mesh, None)], [(0, np.eye(4, dtype=np.float32)[None])])
        # rays through the cube -> occluded; rays beside it -> clear
        o = np.array([[0, 0, 3], [0, 3, 3]], np.float32)
        d = np.array([[0, 0, -1], [0, 0, -1]], np.float32)
        occ = bvh_occluded(scene_dev(scene), jnp.asarray(o), jnp.asarray(d), 10.0)
        assert bool(occ[0]) and not bool(occ[1])
        # t_limit shorter than the distance -> not occluded
        occ2 = bvh_occluded(scene_dev(scene), jnp.asarray(o), jnp.asarray(d), 1.0)
        assert not bool(occ2[0])


class TestBvhBuild:
    def test_leaves_cover_all_prims(self, rng):
        mesh = sphere(quality=3)
        v = mesh.tri_vertices()
        mn, mx = triangle_aabbs(v[:, 0], v[:, 1], v[:, 2])
        bvh = build_bvh_sah(mn, mx)
        assert sorted(bvh.prim_order.tolist()) == list(range(mesh.num_triangles))
        covered = np.zeros(mesh.num_triangles, bool)
        for i in range(bvh.num_nodes):
            if bvh.node_count[i] > 0:
                ids = bvh.prim_order[bvh.node_left[i] : bvh.node_left[i] + bvh.node_count[i]]
                assert not covered[ids].any()  # each prim in exactly one leaf
                covered[ids] = True
        assert covered.all()

    def test_refit_after_deform(self, rng):
        mesh = sphere(quality=2)
        v = mesh.tri_vertices()
        mn, mx = triangle_aabbs(v[:, 0], v[:, 1], v[:, 2])
        bvh = build_bvh_sah(mn, mx)
        v2 = v * 2.0
        mn2, mx2 = triangle_aabbs(v2[:, 0], v2[:, 1], v2[:, 2])
        refit = refit_bvh(bvh, mn2, mx2)
        np.testing.assert_allclose(refit.node_min[0], mn2.min(0), atol=1e-6)
        np.testing.assert_allclose(refit.node_max[0], mx2.max(0), atol=1e-6)


def scene_dev(scene: TraceScene) -> TraceScene:
    """numpy pytree -> jnp pytree."""
    return TraceScene(*[jnp.asarray(x) for x in scene])


def test_align_leaf_tris_invariants():
    """Every leaf TREELET-aligned, ranges disjoint, every source triangle
    mapped exactly once, fillers degenerate (pack._align_leaf_tris)."""
    import numpy as np

    from rfw_tpu.accel.bvh_cpu import TREELET, build_bvh_sah, triangle_aabbs
    from rfw_tpu.models import sphere
    from rfw_tpu.render.pack import _align_leaf_tris, _pad_gather

    m = sphere(quality=3)
    idx = m.indices.reshape(-1, 3)
    v0 = m.positions[idx[:, 0]]
    v1 = m.positions[idx[:, 1]]
    v2 = m.positions[idx[:, 2]]
    mn, mx = triangle_aabbs(v0, v1, v2)
    bvh = build_bvh_sah(mn, mx, max_leaf=TREELET)
    n = len(idx)
    aligned, gather, new_size = _align_leaf_tris(bvh, n)

    assert new_size % TREELET == 0 and gather.shape[0] == new_size
    leaves = np.nonzero(aligned.node_count > 0)[0]
    seen = np.zeros(new_size, bool)
    for li in leaves:
        first = int(aligned.node_left[li])
        count = int(aligned.node_count[li])
        assert first % TREELET == 0, "leaf first must be TREELET-aligned"
        assert 1 <= count <= TREELET
        assert not seen[first:first + count].any(), "leaf ranges overlap"
        seen[first:first + count] = True
        assert (gather[first:first + count] >= 0).all()
    # every source triangle appears exactly once
    valid = gather[gather >= 0]
    assert len(valid) == n and len(np.unique(valid)) == n
    # fillers scatter to the fill value (input is the leaf-ordered array)
    po = bvh.prim_order.astype(np.int64)
    padded = _pad_gather(v0[po].astype(np.float32), gather)
    assert np.all(padded[gather < 0] == 0)
    # non-fillers carry the reordered data
    np.testing.assert_array_equal(padded[gather >= 0], v0[po][valid])


def test_refit_pack_matches_rebuild(rng):
    """A deformed mesh packed via the cached-topology REFIT path (the
    per-frame skinned path, reference gpu-rt lib.rs:1345-1384) must trace
    identically to a full SAH rebuild: same hit masks, same t (prim ids may
    differ — leaf orders diverge)."""
    from rfw_tpu.render import pack_trace_scene

    mesh = sphere(quality=2)
    eye = np.eye(4, dtype=np.float32)[None]
    cache: dict = {}
    pack_trace_scene([(0, mesh, None)], [(0, eye)], built_blas_out=cache)
    assert 0 in cache, "first build must cache topology for later refits"

    deformed = (mesh.positions * np.array([1.6, 0.6, 1.2], np.float32)
                + np.array([0.2, 0.1, 0.0], np.float32))
    refit_scene = pack_trace_scene(
        [(0, mesh, cache[0])], [(0, eye)], deformed_positions={0: deformed})
    rebuild_scene = pack_trace_scene(
        [(0, mesh, None)], [(0, eye)], deformed_positions={0: deformed})

    o, d = make_rays(512, rng)
    h_refit = bvh_closest_hit(scene_dev(refit_scene), jnp.asarray(o), jnp.asarray(d))
    h_re = bvh_closest_hit(scene_dev(rebuild_scene), jnp.asarray(o), jnp.asarray(d))
    m1 = np.asarray(h_refit.prim) >= 0
    m2 = np.asarray(h_re.prim) >= 0
    assert (m1 == m2).all()
    np.testing.assert_allclose(
        np.asarray(h_refit.t)[m1], np.asarray(h_re.t)[m1], rtol=1e-4, atol=1e-5)


def test_refit_native_matches_python(rng):
    """Native C++ refit and the python reverse-order loop agree bitwise-ish."""
    import os

    mesh = sphere(quality=2)
    v = mesh.tri_vertices()
    mn, mx = triangle_aabbs(v[:, 0], v[:, 1], v[:, 2])
    bvh = build_bvh_sah(mn, mx)
    v2 = v * np.array([2.0, 0.5, 1.3], np.float32)
    mn2, mx2 = triangle_aabbs(v2[:, 0], v2[:, 1], v2[:, 2])
    r_native = refit_bvh(bvh, mn2, mx2)
    os.environ["RFW_NO_NATIVE"] = "1"
    try:
        r_py = refit_bvh(bvh, mn2, mx2)
    finally:
        del os.environ["RFW_NO_NATIVE"]
    np.testing.assert_allclose(r_native.node_min, r_py.node_min, atol=1e-6)
    np.testing.assert_allclose(r_native.node_max, r_py.node_max, atol=1e-6)


def test_empty_bvh_is_unhittable():
    """A 0-primitive build must encode an inverted (unhittable) box, not a
    self-referential internal node at a point box — a ray through that point
    would cycle the lockstep walk forever."""
    import numpy as np

    from rfw_tpu.accel.bvh_cpu import build_bvh_sah

    nodes = build_bvh_sah(np.zeros((0, 3)), np.zeros((0, 3)))
    assert (nodes.node_min[0] > nodes.node_max[0]).all()
