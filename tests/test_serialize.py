"""Scene snapshot/resume roundtrip (reference serde feature, SURVEY §5)."""

import os

import numpy as np

from rfw_tpu.models import cube, sphere
from rfw_tpu.scene import Material, Scene
from rfw_tpu.scene.camera import Camera3D
from rfw_tpu.scene.serialize import load_scene, save_scene


def test_roundtrip(tmp_path):
    scene = Scene()
    red = scene.add_material(Material(name="red", color=np.array([0.8, 0.1, 0.1, 1], np.float32), roughness=0.3))
    mid = scene.add_3d_object(sphere(quality=1, material_id=red))
    h = scene.add_3d_instance(mid)
    h.set_trs((1, 2, 3), (0, 0, 0, 1), (2, 2, 2))
    scene.add_point_light((0, 5, 0), (10, 9, 8))
    scene.add_spot_light((1, 4, 0), (0, -1, 0), (5, 5, 5), 20, 30)
    scene.add_directional_light((0.3, -1, 0.2), (2, 2, 2))
    cam = Camera3D(fov=42.0).look_at(np.array([0, 1, 5], np.float32), np.zeros(3, np.float32))
    film = np.random.default_rng(0).random((64, 3)).astype(np.float32)

    path = str(tmp_path / "snap")
    save_scene(scene, path, camera=cam, film=film, spp=7)

    s2, cam2, film2, spp = load_scene(path)
    assert spp == 7
    np.testing.assert_allclose(film2, film)
    np.testing.assert_allclose(cam2.position, cam.position)
    assert abs(cam2.fov - 42.0) < 1e-6
    # mesh content
    m0 = scene.meshes_3d[mid]
    m1 = s2.meshes_3d[mid]
    np.testing.assert_allclose(m1.positions, m0.positions)
    np.testing.assert_array_equal(m1.indices, m0.indices)
    # instance transform survives
    il = s2.instances_3d[mid]
    got = il.matrices[il.active][0]
    np.testing.assert_allclose(got[:3, 3], [1, 2, 3], atol=1e-6)
    # material fields
    assert s2.materials.get(red).name == "red"
    assert abs(s2.materials.get(red).roughness - 0.3) < 1e-6
    # lights
    assert len(s2.lights.point) == 1
    assert len(s2.lights.spot) == 1
    assert len(s2.lights.directional) == 1
    # loaded scene syncs cleanly
    from rfw_tpu.backend.contract import RecordingBackend

    be = RecordingBackend()
    s2.synchronize(be)
    names = [c[0] for c in be.calls]
    assert "set_3d_meshes" in names and "set_3d_instances" in names


def test_graph_roundtrip(tmp_path):
    """Skinned graph + animation survives snapshot/resume and keeps animating."""
    scene = Scene()
    handle = scene.add_3d(scene.load(
        "/root/reference/assets/models/CesiumMan/CesiumMan.gltf"))
    scene.synchronize_graph()
    path = str(tmp_path / "graphsnap")
    save_scene(scene, path)

    s2, _, _, _ = load_scene(path)
    assert len(s2.graph.storage) == 1
    g2 = next(g for _, g in s2.graph.storage)
    assert g2.num_nodes == handle.graph.num_nodes
    assert len(g2.animations) == 1
    assert len(g2.skins) == 1
    np.testing.assert_allclose(
        g2.skins[0].inverse_bind, handle.graph.skins[0].inverse_bind)
    # animation still drives instances after reload
    s2.set_animations_time(0.0)
    s2.synchronize_graph()
    jm0 = g2.skins[0].joint_matrices.copy()
    s2.set_animations_time(0.8)
    s2.synchronize_graph()
    assert not np.allclose(jm0, g2.skins[0].joint_matrices, atol=1e-5)
    # instance wiring restored: node matrices propagate into instance pools
    total = sum(len(il) for il in s2.instances_3d.values())
    assert total == 1


def test_morphs_and_skybox_round_trip(tmp_path):
    """Round 2 state survives snapshots: morph targets + instance weights
    + the skybox env map."""
    import numpy as np

    from rfw_tpu.models import quad3d
    from rfw_tpu.models.mesh3d import build_mesh3d
    from rfw_tpu.scene import Scene
    from rfw_tpu.scene.materials import Texture
    from rfw_tpu.scene.serialize import load_scene, save_scene

    scene = Scene()
    q = quad3d(normal=(0, 0, 1), position=(0, 0, 0), width=2, height=2)
    target = np.zeros((1, q.num_vertices, 3), np.float32)
    target[0, :, 2] = 1.0
    nrm_t = np.zeros((1, q.num_vertices, 3), np.float32)
    nrm_t[0, :, 0] = 0.7
    mid = scene.add_3d_object(build_mesh3d(
        q.positions, q.indices, normals=q.normals, uvs=q.uvs,
        morph_targets=target, morph_normals=nrm_t))
    scene.add_3d_instance(mid).set_morph_weights(np.array([0.4], np.float32))
    sky = np.zeros((8, 8, 4), np.uint8)
    sky[..., 2] = 200
    sky[..., 3] = 255
    scene.set_skybox(Texture.from_array(sky, srgb=False))

    path = str(tmp_path / "snap")
    save_scene(scene, path)
    loaded, _, _, _ = load_scene(path)

    m = loaded.meshes_3d[mid]
    assert m.has_morphs
    np.testing.assert_allclose(m.morph_targets[0, :, 2], 1.0)
    # NORMAL deltas must survive the round trip too (review finding:
    # they were silently dropped)
    assert m.morph_normals is not None
    np.testing.assert_allclose(m.morph_normals[0, :, 0], 0.7)
    il = loaded.instances_3d[mid]
    assert il.morph_weights is not None
    np.testing.assert_allclose(il.morph_weights[il.active][0], [0.4])
    assert loaded.skybox.value is not None
    assert loaded.skybox.value.srgb is False
    assert loaded.skybox.value.mips[0][..., 2].max() == 200
