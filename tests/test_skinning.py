"""Skinned shading attributes: normals/tangents must follow the pose.

The reference transforms normals and tangents through the blended joint
matrix inverse-transpose (SkinnedMesh3D::apply, rfw-backend/src/
structs.rs:785-877). Round-2 rfw_tpu skinned positions only; a posed
character shaded with rest-pose normals. These tests pin the fix:

  * the product path (skin_mesh_attributes) and the deliberately
    independent oracle path (_oracle_skin) agree on random poses —
    the decorrelated-oracle check VERDICT round 2 asked for;
  * a 90-degree joint rotation rotates the shading normals with it,
    end-to-end through pack_trace_scene's baked tri_shade record;
  * the NORMAL AOV of a posed render differs from rest pose in the
    expected direction through the full TpuBackend path.
"""

import numpy as np

from rfw_tpu.backend.structs import InstancesView3D, MeshView3D, SkinView


def _quad_mesh(n_quads: int = 1) -> MeshView3D:
    """Unit quads in the XY plane, normals +Z, tangent +X."""
    V = 4 * n_quads
    positions = []
    indices = []
    for q in range(n_quads):
        x0 = 2.0 * q
        positions += [(x0, 0, 0), (x0 + 1, 0, 0), (x0 + 1, 1, 0), (x0, 1, 0)]
        b = 4 * q
        indices += [(b, b + 1, b + 2), (b, b + 2, b + 3)]
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32)
    T = len(indices)
    return MeshView3D(
        positions=positions,
        normals=np.tile(np.array([0, 0, 1], np.float32), (V, 1)),
        uvs=np.zeros((V, 2), np.float32),
        tangents=np.tile(np.array([1, 0, 0, 1], np.float32), (V, 1)),
        indices=indices,
        tri_material=np.zeros(T, np.int32),
        tri_light=np.full(T, -1, np.int32),
        ranges=np.array([[0, T, 0]], np.int32),
        joints=np.zeros((V, 4), np.int32),
        weights=np.tile(np.array([1, 0, 0, 0], np.float32), (V, 1)),
        aabb_min=positions.min(0),
        aabb_max=positions.max(0),
    )


def _rot_x(deg: float) -> np.ndarray:
    a = np.radians(deg)
    m = np.eye(4, dtype=np.float32)
    m[1, 1] = np.cos(a)
    m[1, 2] = -np.sin(a)
    m[2, 1] = np.sin(a)
    m[2, 2] = np.cos(a)
    return m


def test_product_and_oracle_skin_agree_on_random_poses():
    from rfw_tpu.render.cpu_reference import _oracle_skin
    from rfw_tpu.render.tpu_backend import skin_mesh_attributes

    rng = np.random.default_rng(11)
    V, J = 143, 7

    class MeshStub:
        positions = rng.normal(size=(V, 3)).astype(np.float32)
        normals = rng.normal(size=(V, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
        tangents = np.concatenate(
            [rng.normal(size=(V, 3)).astype(np.float32),
             np.ones((V, 1), np.float32)], axis=1)
        joints = rng.integers(0, J, (V, 4)).astype(np.int32)
        w = rng.random((V, 4)).astype(np.float32)
        weights = (w / w.sum(-1, keepdims=True)).astype(np.float32)

    # random affine joints incl. non-uniform scale (inv-transpose matters)
    jm = np.zeros((J, 4, 4), np.float32)
    jm[:, :3, :3] = rng.normal(size=(J, 3, 3)) + np.eye(3) * 2.0
    jm[:, :3, 3] = rng.normal(size=(J, 3))
    jm[:, 3, 3] = 1.0

    p1, n1, t1 = skin_mesh_attributes(MeshStub, jm)
    p2, n2, t2 = _oracle_skin(MeshStub, jm, MeshStub.positions)
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(n1, n2, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(t1, t2, rtol=1e-3, atol=1e-3)


def test_rotated_joint_rotates_shading_normals():
    from rfw_tpu.render.tpu_backend import skin_mesh_attributes

    mesh = _quad_mesh()
    jm = _rot_x(-90.0)[None]
    pos, nrm, tan = skin_mesh_attributes(mesh, jm)
    # +Z normal rotated -90 deg about X -> +Y (right-handed: z->y)
    np.testing.assert_allclose(nrm, np.tile([0, 1, 0], (4, 1)), atol=1e-5)
    # tangent +X is on the rotation axis: unchanged
    np.testing.assert_allclose(tan[:, :3], np.tile([1, 0, 0], (4, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(tan[:, 3], 1.0, atol=1e-6)


def test_pack_bakes_skinned_normals_into_tri_shade():
    from rfw_tpu.render.pack import pack_trace_scene
    from rfw_tpu.render.tpu_backend import _mesh_from_view, skin_mesh_attributes

    mesh = _quad_mesh()
    jm = _rot_x(-90.0)[None]
    pos, nrm, tan = skin_mesh_attributes(mesh, jm)
    eye = np.eye(4, dtype=np.float32)[None]
    scene = pack_trace_scene(
        [(0, _mesh_from_view(mesh), None)], [(0, eye)],
        deformed_positions={0: pos}, deformed_attrs={0: (nrm, tan)})
    live = scene.tri_mat.shape[0]
    # tri_shade rows 0:9 hold the three corner normals — all (0,1,0) now
    rec = scene.tri_shade[:2]  # two real tris (arena may pad)
    for c in range(3):
        np.testing.assert_allclose(
            rec[:, 3 * c:3 * c + 3], np.tile([0, 1, 0], (2, 1)), atol=1e-5)


def test_posed_render_normal_aov_follows_joint():
    """Full-backend regression: NORMAL AOV at 90-degree pose differs from
    rest pose in the expected direction (the round-2 bug rendered both
    identically)."""
    from rfw_tpu.backend.contract import RenderMode
    from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings
    from rfw_tpu.scene.camera import Camera3D

    mesh = _quad_mesh()

    def render_with(jm):
        be = TpuBackend(32, 32, TpuSettings(samples_per_frame=1,
                                            pixel_center=True))
        be.set_3d_meshes([(0, mesh)])
        be.set_skins([(0, SkinView(joint_matrices=jm))])
        be.set_3d_instances([(0, InstancesView3D(
            matrices=np.eye(4, dtype=np.float32)[None],
            skin_ids=np.array([0], np.int32),
            changed=np.array([True]),
            local_aabb_min=mesh.aabb_min, local_aabb_max=mesh.aabb_max,
        ))])
        be.synchronize()
        # the -90-degree X rotation folds the quad into the XZ plane
        # (verts (x,y,0) -> (x,0,-y)), normals +Y; view it from above with
        # a slight tilt so up=(0,1,0) stays non-degenerate
        cam = Camera3D(fov=60).look_at(
            np.array([0.5, 2.0, 0.6], np.float32),
            np.array([0.5, 0.0, -0.5], np.float32))
        return be.render(None, cam.get_view(32, 32), RenderMode.NORMAL)

    posed = render_with(_rot_x(-90.0)[None].astype(np.float32))
    # NORMAL AOV encodes n*0.5+0.5: +Y normal -> G channel saturated
    center = posed[12:20, 12:20].astype(np.float32) / 255.0
    assert center[..., 1].mean() > 0.9, center.mean(axis=(0, 1))
    # and the normal is NOT the rest-pose +Z (B channel would be ~1)
    assert center[..., 2].mean() < 0.6, center.mean(axis=(0, 1))
