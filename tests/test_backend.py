"""TpuBackend end-to-end (on CPU) + instance-repack fast path."""

import numpy as np
import pytest

from rfw_tpu.backend.contract import RenderMode
from rfw_tpu.models import cube, sphere
from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings
from rfw_tpu.scene import Material, Scene
from rfw_tpu.scene.camera import Camera2D, Camera3D


@pytest.fixture(scope="module")
def app_scene():
    scene = Scene()
    m = scene.add_material(Material(color=np.array([0.7, 0.3, 0.2, 1], np.float32),
                                    roughness=0.6))
    mid = scene.add_3d_object(sphere(quality=1, material_id=m))
    scene.add_3d_instance(mid)
    fid = scene.add_3d_object(cube(position=(0, -1.2, 0), size=(6, 0.2, 6)))
    scene.add_3d_instance(fid)
    scene.add_point_light((2, 3, 2), (30, 30, 30))
    return scene, mid


def test_render_modes(app_scene):
    scene, _ = app_scene
    be = TpuBackend(64, 64, TpuSettings(samples_per_frame=1, max_bounces=1,
                                        sky_intensity=0.3))
    scene.meshes_3d.trigger_changed_all()
    scene._instances_changed = True
    scene.materials.materials.trigger_changed_all()
    scene.synchronize(be)
    cam = Camera3D(fov=45).look_at(np.array([0, 1, 4], np.float32), np.zeros(3, np.float32))
    view = cam.get_view(64, 64)
    v2 = Camera2D.from_width_height(64, 64).get_view()

    default = be.render(v2, view, RenderMode.DEFAULT)
    assert default.shape == (64, 64, 4) and default.dtype == np.uint8
    # center pixels show the lit sphere, not background
    assert default[24:40, 24:40, :3].mean() > 4

    normal = be.render(v2, view, RenderMode.NORMAL)
    albedo = be.render(v2, view, RenderMode.ALBEDO)
    depth = be.render(v2, view, RenderMode.GBUFFER)
    for img in (normal, albedo, depth):
        assert img.shape == (64, 64, 4)
    # albedo center equals material color-ish
    c = albedo[28:36, 28:36, :3].mean(axis=(0, 1)) / 255.0
    assert c[0] > c[2]  # red-ish


def test_progressive_accumulation_and_reset(app_scene):
    scene, mid = app_scene
    be = TpuBackend(32, 32, TpuSettings(samples_per_frame=2, max_bounces=1,
                                        sky_intensity=0.3))
    scene.meshes_3d.trigger_changed_all()
    scene._instances_changed = True
    scene.materials.materials.trigger_changed_all()
    scene.synchronize(be)
    cam = Camera3D(fov=45).look_at(np.array([0, 1, 4], np.float32), np.zeros(3, np.float32))
    view = cam.get_view(32, 32)
    be.render(None, view)
    assert be._spp == 2
    be.render(None, view)
    assert be._spp == 4  # same view accumulates
    cam2 = Camera3D(fov=45).look_at(np.array([1, 1, 4], np.float32), np.zeros(3, np.float32))
    be.render(None, cam2.get_view(32, 32))
    assert be._spp == 2  # camera move resets film


def test_repack_instances_matches_full_pack():
    from rfw_tpu.render.pack import pack_trace_scene, repack_instances

    s1 = sphere(quality=1)
    c1 = cube()
    eye = np.eye(4, dtype=np.float32)
    m_a = np.stack([eye, eye])
    m_a[1, 0, 3] = 2.0
    base = pack_trace_scene([(0, s1, None), (1, c1, None)],
                            [(0, m_a), (1, eye[None])])
    # move instances
    m_b = m_a.copy()
    m_b[0, 1, 3] = 1.5
    full = pack_trace_scene([(0, s1, None), (1, c1, None)],
                            [(0, m_b), (1, eye[None])])
    fast = repack_instances(
        base,
        [(0, s1.aabb_min, s1.aabb_max), (1, c1.aabb_min, c1.aabb_max)],
        [(0, m_b), (1, eye[None])],
    )
    np.testing.assert_allclose(fast.inst_matrix, full.inst_matrix)
    np.testing.assert_allclose(fast.tlas_min, full.tlas_min, atol=1e-6)
    np.testing.assert_array_equal(fast.blas_wide_root, full.blas_wide_root)
    # geometry arenas untouched (shared with base)
    assert fast.tri_v0 is base.tri_v0
    assert fast.blas_wide_f is base.blas_wide_f


def test_instance_motion_updates_all_device_arenas(app_scene):
    """Instance-only sync on the HOST repack path must upload every
    TLAS-derived arena, including the 8-wide supernode fields the Pallas
    tier traverses (a stale tlas8_box leaves rays transformed by the new
    inst_inv but traversed against last frame's TLAS — and the equality
    gate then keeps it stale forever). device_motion=False pins that
    path; the round-4 device fast path intentionally leaves the HOST
    arrays behind (tracked via _dev_stale) and is covered by
    tests/test_device_motion.py instead."""
    scene, mid = app_scene
    be = TpuBackend(32, 32, TpuSettings(samples_per_frame=1, max_bounces=0,
                                        device_motion=False))
    scene.meshes_3d.trigger_changed_all()
    scene._instances_changed = True
    scene.materials.materials.trigger_changed_all()
    scene.synchronize(be)

    # move the sphere instance (same count -> the fast _inst_dirty path)
    m = np.eye(4, dtype=np.float32)
    m[0, 3] = 2.5
    scene.instances_3d[mid].set_matrix(0, m)
    scene._instances_changed = True
    scene.synchronize(be)

    # every device field must now match the repacked host scene
    for f in be._scene_host._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(be._scene_dev, f)),
            getattr(be._scene_host, f),
            err_msg=f"device arena {f!r} stale after instance-only sync",
        )


def test_skybox_renders_on_miss():
    """Scene.set_skybox -> TpuBackend: miss rays sample the equirect env
    map (reference Backend::set_skybox -> gpu-rt sky sampling)."""
    import numpy as np

    from rfw_tpu.scene import Scene
    from rfw_tpu.scene.camera import Camera3D
    from rfw_tpu.scene.materials import Texture
    from rfw_tpu.models import cube

    scene = Scene()
    cid = scene.add_3d_object(cube(position=(0, 0, -50), size=(1, 1, 1)))
    scene.add_3d_instance(cid)
    # solid green sky
    sky = np.zeros((8, 8, 4), np.uint8)
    sky[..., 1] = 255
    sky[..., 3] = 255
    scene.set_skybox(Texture.from_array(sky, srgb=True))

    be = TpuBackend(32, 32, TpuSettings(samples_per_frame=2, max_bounces=0,
                                        sky_intensity=1.0))
    scene.meshes_3d.trigger_changed_all()
    scene._instances_changed = True
    scene.materials.materials.trigger_changed_all()
    scene.synchronize(be)
    view = Camera3D(fov=45).look_at(np.array([0, 0, 4], np.float32),
                                    np.zeros(3, np.float32)).get_view(32, 32)
    frame = be.render(None, view).astype(np.float32)
    border = frame[2:6, 2:6, :3].mean(axis=(0, 1))
    assert border[1] > 100, border  # sky green dominates
    assert border[1] > 3 * max(border[0], 1) and border[1] > 3 * max(border[2], 1)


def test_ssao_modes_render():
    """RenderMode.SSAO / FILTERED_SSAO produce [0,255] occlusion maps with
    geometry contact regions darker than open floor (reference ssao.comp)."""
    import numpy as np

    from rfw_tpu.scene import Material, Scene
    from rfw_tpu.scene.camera import Camera3D
    from rfw_tpu.models import cube, quad3d

    scene = Scene()
    fid = scene.add_3d_object(quad3d(normal=(0, 1, 0), position=(0, 0, 0),
                                     width=8, height=8))
    scene.add_3d_instance(fid)
    cid = scene.add_3d_object(cube(position=(0, 0.5, 0), size=(1, 1, 1)))
    scene.add_3d_instance(cid)

    be = TpuBackend(48, 48, TpuSettings(samples_per_frame=4, max_bounces=0,
                                        sky_intensity=0.5))
    scene.meshes_3d.trigger_changed_all()
    scene._instances_changed = True
    scene.materials.materials.trigger_changed_all()
    scene.synchronize(be)
    view = Camera3D(fov=45).look_at(np.array([2.5, 2.5, 2.5], np.float32),
                                    np.array([0, 0.3, 0], np.float32)).get_view(48, 48)
    ao = be.render(None, view, RenderMode.SSAO).astype(np.float32)[..., 0]
    fao = be.render(None, view, RenderMode.FILTERED_SSAO).astype(np.float32)[..., 0]
    for img in (ao, fao):
        assert img.shape == (48, 48)
        assert img.min() >= 0 and img.max() <= 255
    # open floor regions are mostly unoccluded (bright)
    assert ao.mean() > 80, ao.mean()
    # the frame contains genuinely occluded (dark) pixels near the cube
    assert (ao < 100).sum() > 5, (ao < 100).sum()
    # filtering smooths: fewer extreme-dark pixels, similar mean
    assert abs(fao.mean() - ao.mean()) < 40


def test_hdr_frame(app_scene):
    """hdr_frame() exposes the linear pre-tonemap radiance mean — values
    above 1.0 survive (the uint8 render() clamps them)."""
    import numpy as np

    scene, _ = app_scene
    be = TpuBackend(32, 32, TpuSettings(samples_per_frame=2, max_bounces=1,
                                        sky_intensity=2.5, clamp=50.0))
    assert be.hdr_frame() is None
    scene.meshes_3d.trigger_changed_all()
    scene._instances_changed = True
    scene.materials.materials.trigger_changed_all()
    scene.synchronize(be)
    from rfw_tpu.scene.camera import Camera3D

    view = Camera3D(fov=45).look_at(np.array([0, 1, 4], np.float32),
                                    np.zeros(3, np.float32)).get_view(32, 32)
    be.render(None, view)
    hdr = be.hdr_frame()
    assert hdr.shape == (32, 32, 3) and hdr.dtype == np.float32
    assert hdr.max() > 1.0  # sky_intensity 2.5 passes through linearly
    assert np.isfinite(hdr).all()
