"""Mesh geometry pipeline tests (normals/tangents/ranges/primitives)."""

import numpy as np

from rfw_tpu.models import build_mesh3d, cube, quad3d, sphere


def test_smooth_normals_flat_quad():
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    m = build_mesh3d(pos, idx)
    np.testing.assert_allclose(m.normals, np.tile([0, 0, 1], (4, 1)), atol=1e-6)


def test_tangents_orthonormal():
    m = sphere(quality=2)
    t = m.tangents[:, :3]
    # unit length
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-3)
    # orthogonal to normals
    assert np.abs(np.sum(t * m.normals, axis=-1)).max() < 1e-3
    # handedness is +-1
    assert set(np.unique(m.tangents[:, 3])).issubset({-1.0, 1.0})


def test_material_ranges_sorted_contiguous():
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2], [1, 3, 2], [0, 2, 1], [2, 3, 1]], np.int32)
    mats = np.array([2, 0, 2, 1], np.int32)
    m = build_mesh3d(pos, idx, material_ids=mats)
    assert (np.diff(m.tri_material) >= 0).all()
    # ranges: (first, count, mat)
    by_mat = {int(r[2]): (int(r[0]), int(r[1])) for r in m.ranges}
    assert by_mat == {0: (0, 1), 1: (1, 1), 2: (2, 2)}
    # triangle content preserved under sort
    assert m.num_triangles == 4


def test_sphere_subdivision_counts():
    # reference: 20 * 4^q triangles (sphere.rs Quality)
    for q in (0, 1, 2):
        m = sphere(quality=q)
        assert m.num_triangles == 20 * 4**q
    # all vertices on unit sphere
    m = sphere(quality=2, radius=2.0, position=(1, 0, 0))
    d = np.linalg.norm(m.positions - np.array([1, 0, 0]), axis=-1)
    np.testing.assert_allclose(d, 2.0, atol=1e-5)


def test_cube_aabb_and_quad():
    c = cube(position=(1, 2, 3), size=(2, 4, 6))
    np.testing.assert_allclose(c.aabb_min, [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(c.aabb_max, [2, 4, 6], atol=1e-6)
    q = quad3d(normal=(0, 1, 0), width=2, height=2)
    np.testing.assert_allclose(q.normals[:, 1], 1.0, atol=1e-6)


def test_mesh_view_validates():
    m = sphere(quality=1)
    v = m.view()
    assert v.num_triangles == m.num_triangles
    assert v.num_vertices == m.num_vertices
