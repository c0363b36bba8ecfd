"""Scene -> Backend sync protocol + graph/animation tests."""

import numpy as np
import pytest

from rfw_tpu.backend.contract import RecordingBackend, RenderMode
from rfw_tpu.models import sphere
from rfw_tpu.scene import Material, Scene
from rfw_tpu.scene.camera import Camera2D, Camera3D

CESIUM = "/root/reference/assets/models/CesiumMan/CesiumMan.gltf"


class TestSyncProtocol:
    def test_full_sync_sequence(self):
        scene = Scene()
        mid = scene.add_3d_object(sphere(quality=1))
        scene.add_3d_instance(mid)
        scene.add_point_light((0, 2, 0), (10, 10, 10))
        be = RecordingBackend()
        scene.synchronize(be)
        names = [c[0] for c in be.calls]
        assert "set_3d_meshes" in names
        assert "set_3d_instances" in names
        assert "set_point_lights" in names
        assert "set_materials" in names
        assert names[-1] == "synchronize"
        # mesh/instance set before synchronize
        assert names.index("set_3d_meshes") < names.index("synchronize")

    def test_second_sync_is_empty(self):
        scene = Scene()
        mid = scene.add_3d_object(sphere(quality=1))
        scene.add_3d_instance(mid)
        be = RecordingBackend()
        scene.synchronize(be)
        be.calls.clear()
        scene.synchronize(be)
        names = [c[0] for c in be.calls]
        # nothing changed: only the synchronize barrier flows
        assert names == ["synchronize"]

    def test_instance_move_triggers_instances_only(self):
        scene = Scene()
        mid = scene.add_3d_object(sphere(quality=1))
        h = scene.add_3d_instance(mid)
        be = RecordingBackend()
        scene.synchronize(be)
        be.calls.clear()
        h.set_trs((1, 0, 0), (0, 0, 0, 1), (1, 1, 1))
        scene._instances_changed = True
        scene.synchronize(be)
        names = [c[0] for c in be.calls]
        assert "set_3d_instances" in names
        assert "set_3d_meshes" not in names

    def test_emissive_material_creates_area_lights(self):
        scene = Scene()
        lm = scene.add_material(Material(name="glow", color=np.array([5, 5, 5, 1], np.float32)))
        m = sphere(quality=0, material_id=lm)
        mid = scene.add_3d_object(m)
        scene.add_3d_instance(mid)
        be = RecordingBackend()
        scene.synchronize(be)
        area_calls = [c for c in be.calls if c[0] == "set_area_lights"]
        assert area_calls and area_calls[0][1] == 20  # 20 icosa faces
        # light ids back-written into the mesh
        assert (scene.meshes_3d[mid].tri_light >= 0).all()


class TestGraphAnimation:
    def test_load_and_instantiate_cesium(self):
        scene = Scene()
        desc = scene.load(CESIUM)
        handle = scene.add_3d(desc)
        g = handle.graph
        assert g.num_nodes == 22
        assert len(g.skins) == 1
        assert len(g.animations) == 1
        # instance created and wired
        total_instances = sum(len(il) for il in scene.instances_3d.values())
        assert total_instances == 1

    def test_animation_moves_joints(self):
        scene = Scene()
        handle = scene.add_3d(scene.load(CESIUM))
        g = handle.graph
        scene.synchronize_graph()
        jm0 = g.skins[0].joint_matrices.copy()
        handle.set_time(0.5)
        scene.synchronize_graph()
        jm1 = g.skins[0].joint_matrices
        assert not np.allclose(jm0, jm1, atol=1e-5)
        # skins storage updated + flagged
        assert scene.skins.any_changed or True  # flag consumed by sync below
        be = RecordingBackend()
        handle.set_time(1.0)
        scene.synchronize(be)
        assert "set_skins" in [c[0] for c in be.calls]

    def test_root_matrix_scales_instances(self):
        scene = Scene()
        handle = scene.add_3d(scene.load(CESIUM))
        scene.synchronize_graph()
        g = handle.graph
        node, _ = g.mesh_nodes[0]
        m0 = g.instance_handles[node][0].get_matrix()
        from rfw_tpu.mathx import compose_trs, quat_identity

        handle.set_root_matrix(
            compose_trs(np.array([5, 0, 0], np.float32), quat_identity(), np.ones(3, np.float32))
        )
        scene.synchronize_graph()
        m1 = g.instance_handles[node][0].get_matrix()
        np.testing.assert_allclose(m1[:3, 3], m0[:3, 3] + [5, 0, 0], atol=1e-5)


class TestLevelOrderPropagation:
    def test_matches_recursive_reference(self, rng):
        """Level-order batched propagation == naive recursion."""
        from rfw_tpu.scene.descriptor import NodeDescriptor, SceneDescriptor
        from rfw_tpu.scene.graph import NodeGraph
        from rfw_tpu.mathx import compose_trs, quat_normalize

        n = 30
        parents = [-1] + [int(rng.integers(0, i)) for i in range(1, n)]
        nodes = []
        for i in range(n):
            nd = NodeDescriptor(
                translation=rng.normal(size=3).astype(np.float32),
                rotation=quat_normalize(rng.normal(size=4).astype(np.float32)),
                scale=(0.5 + rng.uniform(size=3)).astype(np.float32),
            )
            nodes.append(nd)
        for i, p in enumerate(parents):
            if p >= 0:
                nodes[p].children.append(i)
        desc = SceneDescriptor(nodes=nodes, roots=[0])
        g = NodeGraph(desc, {})
        g.update()

        local = compose_trs(
            np.stack([nd.translation for nd in nodes]),
            np.stack([nd.rotation for nd in nodes]),
            np.stack([nd.scale for nd in nodes]),
        )
        expected = np.zeros_like(local)

        def rec(i, pm):
            expected[i] = pm @ local[i]
            for c in nodes[i].children:
                rec(c, expected[i])

        rec(0, np.eye(4, dtype=np.float32))
        np.testing.assert_allclose(g.combined, expected, atol=1e-4)


def test_light_shadow_projections():
    """Per-light-type shadow matrices + LightInfo packing (reference
    rfw-scene/src/lights/mod.rs:8-287, rfw-backend/src/lights.rs:137-180)."""
    import numpy as np

    from rfw_tpu.scene.lights import (
        DirectionalLight,
        PointLight,
        SpotLight,
        area_light_shadow_matrix,
        pack_light_info,
    )

    def project(pm, p):
        h = pm @ np.array([p[0], p[1], p[2], 1.0], np.float32)
        return h[:3] / h[3]

    # point: each cube face sees a point straight down its axis at ndc center
    pl = PointLight(np.array([1.0, 2.0, 3.0], np.float32), np.ones(3, np.float32))
    cubes = pl.cube_matrices(near=0.1, far=50.0)
    assert cubes.shape == (6, 4, 4)
    dirs = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                     [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
    for pm, d in zip(cubes, dirs):
        ndc = project(pm, pl.position + 5.0 * d)
        assert abs(ndc[0]) < 1e-4 and abs(ndc[1]) < 1e-4
        assert 0.0 <= ndc[2] <= 1.0 or -1.0 <= ndc[2] <= 1.0

    # spot: a point on the axis lands at ndc center; a point on the outer
    # cone boundary lands at |ndc| ~ 1 in one axis
    sl = SpotLight(np.zeros(3, np.float32), np.array([0, 0, -1], np.float32),
                   np.ones(3, np.float32), inner_angle=20.0, outer_angle=30.0)
    pm = sl.shadow_matrix()
    ndc = project(pm, np.array([0, 0, -10], np.float32))
    assert np.linalg.norm(ndc[:2]) < 1e-4
    edge = np.array([10 * np.tan(np.deg2rad(30.0)), 0, -10], np.float32)
    assert abs(abs(project(pm, edge)[0]) - 1.0) < 1e-3

    # directional: every corner of the scene AABB stays inside ndc
    dl = DirectionalLight(np.array([0.3, -1.0, 0.2], np.float32),
                          np.ones(3, np.float32))
    lo, hi = np.array([-2, 0, -3], np.float32), np.array([4, 5, 1], np.float32)
    pm = dl.shadow_matrix(lo, hi)
    for c in range(8):
        p = np.where([c & 1, c & 2, c & 4], hi, lo).astype(np.float32)
        ndc = project(pm, p)
        assert np.all(np.abs(ndc[:2]) <= 1.0 + 1e-4)

    # area: 150-degree frustum sees points well off-axis in front
    pm = area_light_shadow_matrix(np.zeros(3, np.float32),
                                  np.array([0, 1, 0], np.float32))
    ndc = project(pm, np.array([3.0, 1.0, 0.0], np.float32))
    assert np.all(np.isfinite(ndc)) and abs(ndc[0]) < 1.0

    # LightInfo: 256-byte block, fields in place
    info = pack_light_info(pm, np.array([1, 2, 3], np.float32), 42.0)
    assert info.nbytes == 256
    np.testing.assert_allclose(info[:16].reshape(4, 4), pm)
    np.testing.assert_allclose(info[16:20], [1, 2, 3, 42])


def test_emissive_hit_pick_prob_reconstruction():
    """The integrator reconstructs an emissive hit's pick probability from
    lum(radiance) * world_area * pi (render/wavefront.py) instead of a
    tri_light-keyed gather; it must match pack_lights' actual per-light
    probability for EVERY instance, including non-uniformly scaled ones."""
    import numpy as np

    from rfw_tpu.backend.lights import (
        DirectionalLightsView, PointLightsView, SpotLightsView,
    )
    from rfw_tpu.models import cube
    from rfw_tpu.render.lights_pack import pack_lights
    from rfw_tpu.scene.lights import extract_area_lights

    lamp = cube(size=(1, 0.05, 1))
    radiance = np.tile(np.array([[8.0, 6.0, 4.0]], np.float32),
                       (lamp.num_triangles, 1))
    emissive = np.ones(lamp.num_triangles, bool)
    m0 = np.eye(4, dtype=np.float32)
    m1 = np.eye(4, dtype=np.float32)
    m1[:3, :3] *= 3.0  # instance 1 scaled: 9x area, different pick prob
    m1[1, 3] = 4.0
    area, _ = extract_area_lights(
        emissive, radiance, lamp.tri_vertices(),
        np.stack([m0, m1]), 0, np.array([0, 1], np.int32),
    )
    point = PointLightsView(
        position=np.array([[0, 5, 0]], np.float32),
        energy=np.array([[20, 20, 20]], np.float32),
        changed=np.ones(1, bool),
    )
    dl = pack_lights(point, SpotLightsView.empty(),
                     DirectionalLightsView.empty(), area)

    n = float(dl.pick_n[0])
    total = float(dl.pick_w_total[0])
    lum = 0.2126 * area.radiance[:, 0] + 0.7152 * area.radiance[:, 1] \
        + 0.0722 * area.radiance[:, 2]
    w = lum * area.area * np.pi
    reconstructed = 0.5 * w / total + 0.5 / n
    a0 = 1  # one point light precedes the area block
    np.testing.assert_allclose(
        reconstructed, dl.pick_prob[a0 : a0 + area.count], rtol=1e-5
    )
    # instance 1's lights really have a different probability than instance 0
    per_inst = area.count // 2
    assert not np.allclose(reconstructed[:per_inst], reconstructed[per_inst:])


def test_update_lights_incremental_cache():
    """Moving one mesh's instance re-extracts only that mesh; the other
    mesh's cached light chunk is reused by identity (the O(E*I) full rescan
    is the thing this guards against)."""
    import numpy as np

    from rfw_tpu.models import cube
    from rfw_tpu.scene import Material, Scene

    scene = Scene()
    glow = scene.add_material(Material(color=np.array([5, 5, 5, 1], np.float32)))
    a = scene.add_3d_object(cube(size=(1, 0.1, 1), material_id=glow))
    b = scene.add_3d_object(cube(size=(2, 0.1, 2), material_id=glow))
    ha = scene.add_3d_instance(a)
    scene.add_3d_instance(b)

    scene.update_lights()
    count0 = scene.lights.area.count
    assert count0 == 24  # 12 tris per cube, 1 instance each
    chunk_b = scene._area_cache[b]

    # simulate the synchronize() decision: only mesh a's instances moved
    scene.instances_3d[a].reset_changed()
    scene.instances_3d[b].reset_changed()
    m = np.eye(4, dtype=np.float32)
    m[0, 3] = 3.0
    ha.set_matrix(m)
    moved = {s for s, il in scene.instances_3d.items() if il.any_changed}
    assert moved == {a}
    scene.update_lights(moved)

    assert scene.lights.area.count == count0
    assert scene._area_cache[b] is chunk_b  # untouched mesh: cache reused
    # mesh a's lights actually moved
    pa = scene._area_cache[a].position
    assert pa[:, 0].mean() > 2.0


def test_skybox_sync_pushes_once():
    """Scene.set_skybox pumps through the Tracked flag: pushed on change,
    silent when unchanged, clearable (reference Backend::set_skybox)."""
    import numpy as np

    from rfw_tpu.backend.contract import RecordingBackend
    from rfw_tpu.scene import Scene
    from rfw_tpu.scene.materials import Texture

    scene = Scene()
    be = RecordingBackend()
    scene.synchronize(be)
    n0 = sum(1 for c in be.calls if c[0] == "set_skybox")
    assert n0 == 0

    tex = Texture.from_array(
        np.full((8, 8, 4), 128, np.uint8), srgb=True)
    scene.set_skybox(tex)
    scene.synchronize(be)
    calls = [c for c in be.calls if c[0] == "set_skybox"]
    assert len(calls) == 1 and calls[0][1] is not None

    scene.synchronize(be)  # unchanged -> no new push
    assert sum(1 for c in be.calls if c[0] == "set_skybox") == 1

    scene.set_skybox(None)
    scene.synchronize(be)
    calls = [c for c in be.calls if c[0] == "set_skybox"]
    assert len(calls) == 2 and calls[1][1] is None


def test_native_skin_matches_numpy():
    """apply_skin's native C++ LBS path agrees with the numpy einsum."""
    import os

    import numpy as np

    from rfw_tpu.render.tpu_backend import apply_skin

    rng = np.random.default_rng(5)
    V, J = 257, 9

    class MeshStub:
        positions = rng.normal(size=(V, 3)).astype(np.float32)
        joints = rng.integers(0, J, (V, 4)).astype(np.int32)
        w = rng.random((V, 4)).astype(np.float32)
        weights = (w / w.sum(-1, keepdims=True)).astype(np.float32)

    jm = rng.normal(size=(J, 4, 4)).astype(np.float32)
    jm[:, 3] = [0, 0, 0, 1]
    native_out = apply_skin(MeshStub, jm)
    os.environ["RFW_NO_NATIVE"] = "1"
    try:
        py_out = apply_skin(MeshStub, jm)
    finally:
        del os.environ["RFW_NO_NATIVE"]
    np.testing.assert_allclose(native_out, py_out, rtol=1e-5, atol=1e-5)
