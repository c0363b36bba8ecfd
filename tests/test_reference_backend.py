"""CpuReferenceBackend pixel-parity matrix (SURVEY §4 / VERDICT round-1
item 6): the same Scene syncs into BOTH Backend implementations and the
frames must agree — exactly (<=1e-3 RMSE in [0,1]) for the deterministic
AOV modes and single-delta-light direct lighting, statistically for the
noisy path-traced modes. Covers the BASELINE.json config axes at small
resolutions (brute-force oracle is O(rays x tris) on one CPU core)."""

import numpy as np
import pytest

from rfw_tpu.backend.contract import RenderMode
from rfw_tpu.models import cube, quad3d, sphere
from rfw_tpu.render.cpu_reference import CpuReferenceBackend
from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings
from rfw_tpu.scene import Material, Scene
from rfw_tpu.scene.camera import Camera3D


def sync_full(scene: Scene, backend) -> None:
    """Re-trigger every change feed, then drain into `backend` (the pump is
    consuming, so a second backend needs a full re-trigger)."""
    scene.meshes_3d.trigger_changed_all()
    scene.meshes_2d.trigger_changed_all()
    for il in scene.instances_2d.values():
        il.changed[il.active] = True
        il.any_changed = bool(il.active.any())
    scene.materials.materials.trigger_changed_all()
    scene.materials.textures.trigger_changed_all()
    scene._instances_changed = True
    scene.lights.point.trigger_changed_all()
    scene.lights.spot.trigger_changed_all()
    scene.lights.directional.trigger_changed_all()
    scene.lights.area_changed = True
    scene.skybox.trigger_changed()
    scene.skins.trigger_changed_all()
    scene.synchronize(backend)


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    fa = a[..., :3].astype(np.float32) / 255.0
    fb = b[..., :3].astype(np.float32) / 255.0
    return float(np.sqrt(np.mean((fa - fb) ** 2)))


@pytest.fixture(scope="module")
def prim_scene():
    """Config-1-style scene: mixed primitives, untextured materials."""
    scene = Scene()
    red = scene.add_material(Material(
        color=np.array([0.7, 0.2, 0.2, 1], np.float32), roughness=0.8,
        specular_f=0.3))
    gray = scene.add_material(Material(
        color=np.array([0.6, 0.6, 0.6, 1], np.float32), roughness=1.0,
        specular_f=0.0))
    sid = scene.add_3d_object(sphere(quality=2, material_id=red))
    scene.add_3d_instance(sid)
    cid = scene.add_3d_object(cube(position=(1.2, -0.4, 0.2),
                                   size=(0.8, 0.8, 0.8), material_id=gray))
    scene.add_3d_instance(cid)
    fid = scene.add_3d_object(quad3d(normal=(0, 1, 0), position=(0, -0.9, 0),
                                     width=8, height=8, material_id=gray))
    scene.add_3d_instance(fid)
    return scene


CAM = Camera3D(fov=45).look_at(np.array([0.6, 1.2, 3.6], np.float32),
                               np.array([0.3, 0.0, 0.0], np.float32))
W, H = 96, 72


def _pair(scene, settings) -> tuple:
    bt = TpuBackend(W, H, settings)
    bc = CpuReferenceBackend(W, H, settings)
    sync_full(scene, bt)
    sync_full(scene, bc)
    return bt, bc


class TestAovParity:
    """BASELINE config 1: primary rays + normal/albedo/depth AOVs,
    deterministic pixel-center primaries -> exact 1e-3 RMSE bar."""

    def test_normal_albedo_depth(self, prim_scene):
        settings = TpuSettings(samples_per_frame=1, max_bounces=0,
                               pixel_center=True)
        bt, bc = _pair(prim_scene, settings)
        view = CAM.get_view(W, H)
        for mode in (RenderMode.NORMAL, RenderMode.ALBEDO, RenderMode.GBUFFER):
            ft = bt.render(None, view, mode)
            fc = bc.render(None, view, mode)
            e = rmse(ft, fc)
            assert e <= 1e-3, f"{mode}: RMSE {e:.5f}"


class TestDirectLighting:
    """BASELINE config 2 core: delta lights, direct lighting only. With a
    single light the integrator's light pick is deterministic, so the whole
    frame is noise-free on both sides -> exact bar."""

    @pytest.mark.parametrize("light", ["dir", "spot", "point"])
    def test_single_delta_light_exact(self, prim_scene, light):
        scene = prim_scene
        # fresh light set per case
        from rfw_tpu.scene.lights import Lights

        scene.lights = Lights()
        if light == "dir":
            scene.add_directional_light((-0.5, -1.0, -0.3), (3.0, 3.0, 2.6))
        elif light == "spot":
            scene.add_spot_light((1.5, 3.0, 2.0), (-0.35, -0.8, -0.45),
                                 (40, 38, 30), 18, 30)
        else:
            scene.add_point_light((1.5, 2.5, 1.5), (24, 24, 22))
        settings = TpuSettings(samples_per_frame=1, max_bounces=0,
                               clamp=1e6, pixel_center=True, tonemap="aces")
        bt, bc = _pair(scene, settings)
        view = CAM.get_view(W, H)
        ft = bt.render(None, view, RenderMode.DEFAULT)
        fc = bc.render(None, view, RenderMode.DEFAULT)
        e = rmse(ft, fc)
        assert e <= 1.5e-3, f"{light}: RMSE {e:.5f}"


class TestAreaLightStatistical:
    """BASELINE config 3 core: emissive-quad GI. Different unbiased
    estimators (power-CDF pick + MIS vs per-light NEE sum) -> means must
    agree within the noise floor."""

    def test_emissive_quad_gi(self):
        scene = Scene()
        white = scene.add_material(Material(
            color=np.array([0.73, 0.73, 0.73, 1], np.float32), roughness=1.0,
            specular_f=0.0))
        lamp = scene.add_material(Material(
            color=np.array([14.0, 13.0, 11.0, 1], np.float32)))
        fid = scene.add_3d_object(quad3d(normal=(0, 1, 0), position=(0, 0, 0),
                                         width=4, height=4, material_id=white))
        scene.add_3d_instance(fid)
        bid = scene.add_3d_object(cube(position=(0, 0.4, 0),
                                       size=(0.8, 0.8, 0.8),
                                       material_id=white))
        scene.add_3d_instance(bid)
        lid = scene.add_3d_object(quad3d(normal=(0, -1, 0),
                                         position=(0, 2.2, 0), width=1.2,
                                         height=1.2, material_id=lamp))
        scene.add_3d_instance(lid)

        w, h = 48, 36
        spp = 48
        settings = TpuSettings(samples_per_frame=spp, max_bounces=3,
                               clamp=100.0, pixel_center=False,
                               sampler="sobol")
        cam = Camera3D(fov=50).look_at(np.array([0, 1.6, 3.2], np.float32),
                                       np.array([0, 0.5, 0], np.float32))
        bt = TpuBackend(w, h, settings)
        bc = CpuReferenceBackend(w, h, settings)
        bc.pixel_center = False
        sync_full(scene, bt)
        sync_full(scene, bc)
        view = cam.get_view(w, h)
        ft = bt.render(None, view, RenderMode.DEFAULT)
        fc = bc.render(None, view, RenderMode.DEFAULT)
        a = ft[..., :3].astype(np.float32) / 255.0
        b = fc[..., :3].astype(np.float32) / 255.0
        mad = float(np.abs(a.mean(axis=(0, 1)) - b.mean(axis=(0, 1))).max())
        assert mad < 0.03, f"channel-mean abs diff {mad:.4f}"
        # and pixelwise agreement at the noise floor
        assert float(np.abs(a - b).mean()) < 0.06


class TestInstancingAndSkinning:
    """BASELINE config 4 core: multi-instance TLAS + (shared-code) skinning
    path through both backends — AOV-exact."""

    def test_transformed_instances_aov(self):
        scene = Scene()
        m = scene.add_material(Material(
            color=np.array([0.3, 0.5, 0.8, 1], np.float32), roughness=0.7))
        sid = scene.add_3d_object(sphere(quality=1, material_id=m))
        for k in range(6):
            t = np.array([(k % 3) * 1.4 - 1.4, 0.0, -(k // 3) * 1.3],
                         np.float32)
            a = 0.2 * k
            q = np.array([0.0, np.sin(a), 0.0, np.cos(a)], np.float32)
            s = np.full(3, 0.4 + 0.1 * k, np.float32)
            scene.add_3d_instance(sid).set_trs(t, q, s)
        settings = TpuSettings(samples_per_frame=1, max_bounces=0,
                               pixel_center=True)
        bt, bc = _pair(scene, settings)
        view = Camera3D(fov=50).look_at(
            np.array([0, 1.8, 3.6], np.float32),
            np.array([0, 0, -0.4], np.float32)).get_view(W, H)
        for mode in (RenderMode.NORMAL, RenderMode.GBUFFER):
            e = rmse(bt.render(None, view, mode), bc.render(None, view, mode))
            assert e <= 1e-3, f"{mode}: RMSE {e:.5f}"


class TestMixedLightTypes:
    """All four light types live at once: exercises the unified per-light
    record's shared columns + the power-CDF pick across type boundaries
    (the one-at-a-time exact tests cannot catch cross-type row mixups)."""

    def test_combined_statistical(self, prim_scene):
        scene = prim_scene
        from rfw_tpu.scene.lights import Lights

        scene.lights = Lights()
        scene.add_point_light((2.0, 2.5, 1.0), (14, 13, 12))
        scene.add_spot_light((-1.5, 3.0, 1.5), (0.3, -0.9, -0.3),
                             (30, 28, 26), 18, 32)
        scene.add_directional_light((-0.4, -1.0, -0.2), (1.4, 1.4, 1.3))
        lamp = scene.add_material(Material(
            color=np.array([9.0, 8.0, 7.0, 1], np.float32)))
        lid = scene.add_3d_object(quad3d(normal=(0, -1, 0),
                                         position=(0.6, 2.4, 0.4),
                                         width=0.8, height=0.8,
                                         material_id=lamp))
        scene.add_3d_instance(lid)

        w, h, spp = 40, 30, 48
        settings = TpuSettings(samples_per_frame=spp, max_bounces=1,
                               clamp=200.0, sampler="sobol")
        bt = TpuBackend(w, h, settings)
        bc = CpuReferenceBackend(w, h, settings)
        bc.pixel_center = False
        sync_full(scene, bt)
        sync_full(scene, bc)
        view = CAM.get_view(w, h)
        a = bt.render(None, view).astype(np.float32)[..., :3] / 255
        b = bc.render(None, view).astype(np.float32)[..., :3] / 255
        mad = float(np.abs(a.mean(axis=(0, 1)) - b.mean(axis=(0, 1))).max())
        assert mad < 0.035, f"channel-mean abs diff {mad:.4f}"
        assert float(np.abs(a - b).mean()) < 0.07


class TestTexturedAlbedoParity:
    def test_checker_texture_albedo(self):
        """Textured base color: the oracle's numpy bilinear sampler must
        match the TPU atlas (same wrap/half-texel/sRGB math) on the ALBEDO
        AOV at the exact bar (tiny texture keeps both at mip 0)."""
        from rfw_tpu.scene.materials import Texture

        scene = Scene()
        checker = np.zeros((8, 8, 4), np.uint8)
        checker[::2, ::2] = (230, 40, 40, 255)
        checker[1::2, 1::2] = (230, 40, 40, 255)
        checker[checker[..., 3] == 0] = (40, 40, 230, 255)
        checker[..., 3] = 255
        tid = scene.materials.push_texture(
            Texture.from_array(checker, srgb=True))
        m = scene.add_material(Material(
            color=np.array([1, 1, 1, 1], np.float32), roughness=1.0,
            diffuse_tex=tid))
        qid = scene.add_3d_object(quad3d(normal=(0, 0, 1), position=(0, 0, 0),
                                         width=2, height=2, material_id=m))
        scene.add_3d_instance(qid)

        settings = TpuSettings(samples_per_frame=1, max_bounces=0,
                               pixel_center=True)
        bt, bc = _pair(scene, settings)
        cam = Camera3D(fov=40).look_at(np.array([0, 0, 3.0], np.float32),
                                       np.zeros(3, np.float32))
        view = cam.get_view(W, H)
        ft = bt.render(None, view, RenderMode.ALBEDO)
        fc = bc.render(None, view, RenderMode.ALBEDO)
        e = rmse(ft, fc)
        # filtering parity: within ~1 uint8 step per pixel (bilinear
        # weight rounding differs in the last ulp between numpy and XLA)
        assert e <= 4e-3, f"textured albedo RMSE {e:.5f}"
        # and the checker actually shows (two distinct colors present)
        reds = (ft[..., 0] > 150) & (ft[..., 2] < 100)
        blues = (ft[..., 2] > 150) & (ft[..., 0] < 100)
        assert reds.sum() > 50 and blues.sum() > 50


class TestNormalMapParity:
    def test_tilted_normal_map(self):
        """A constant tilted tangent-space normal map: both backends build
        the same tangent frame and transform — NORMAL AOV at the exact
        bar, and the normals genuinely tilt away from the geometric one."""
        from rfw_tpu.scene.materials import Texture

        scene = Scene()
        nm = np.zeros((8, 8, 4), np.uint8)
        # n_ts = (0.39, 0.0, 0.92) encoded as (n*0.5+0.5)*255
        nm[...] = (177, 128, 245, 255)
        tid = scene.materials.push_texture(
            Texture.from_array(nm, srgb=False))
        m = scene.add_material(Material(
            color=np.array([0.7, 0.7, 0.7, 1], np.float32), roughness=1.0,
            normal_tex=tid))
        qid = scene.add_3d_object(quad3d(normal=(0, 0, 1), position=(0, 0, 0),
                                         width=2, height=2, material_id=m))
        scene.add_3d_instance(qid)

        settings = TpuSettings(samples_per_frame=1, max_bounces=0,
                               pixel_center=True)
        bt, bc = _pair(scene, settings)
        cam = Camera3D(fov=40).look_at(np.array([0, 0, 3.0], np.float32),
                                       np.zeros(3, np.float32))
        view = cam.get_view(W, H)
        ft = bt.render(None, view, RenderMode.NORMAL)
        fc = bc.render(None, view, RenderMode.NORMAL)
        e = rmse(ft, fc)
        assert e <= 2e-3, f"normal-mapped NORMAL RMSE {e:.5f}"
        # the mapped normal tilts: red channel (x) well above the 0.5 mid
        center = ft[H // 2 - 4:H // 2 + 4, W // 2 - 4:W // 2 + 4, 0]
        assert center.mean() > 150, center.mean()


class TestSkyboxParity:
    def test_equirect_sky(self):
        """Env-map sampling parity: a two-band sky (green up, blue down)
        through both backends; miss pixels must agree at the exact bar."""
        from rfw_tpu.scene.materials import Texture

        scene = Scene()
        cid = scene.add_3d_object(cube(position=(0, 0, -40), size=(1, 1, 1)))
        scene.add_3d_instance(cid)
        sky = np.zeros((8, 16, 4), np.uint8)
        sky[:4, :, 1] = 220  # upper hemisphere green
        sky[4:, :, 2] = 220  # lower hemisphere blue
        sky[..., 3] = 255
        scene.set_skybox(Texture.from_array(sky, srgb=True))

        settings = TpuSettings(samples_per_frame=1, max_bounces=0,
                               sky_intensity=1.0, pixel_center=True)
        bt, bc = _pair(scene, settings)
        view = Camera3D(fov=60).look_at(np.array([0, 0, 4], np.float32),
                                        np.zeros(3, np.float32)).get_view(W, H)
        ft = bt.render(None, view, RenderMode.DEFAULT)
        fc = bc.render(None, view, RenderMode.DEFAULT)
        e = rmse(ft, fc)
        assert e <= 4e-3, f"skybox RMSE {e:.5f}"
        assert ft[..., 1].mean() > 40  # the sky is actually visible


class TestGlassParity:
    def test_glass_sphere_statistical(self):
        """Transmission through both backends: a glass sphere over a lit
        floor — different estimators, means agree."""
        scene = Scene()
        gray = scene.add_material(Material(
            color=np.array([0.6, 0.6, 0.6, 1], np.float32), roughness=1.0))
        glass = scene.add_material(Material(
            color=np.array([1, 1, 1, 1], np.float32), roughness=0.0,
            specular_f=0.0, transmission=1.0, eta=1.5))
        fid = scene.add_3d_object(quad3d(normal=(0, 1, 0), position=(0, -1, 0),
                                         width=8, height=8, material_id=gray))
        scene.add_3d_instance(fid)
        sid = scene.add_3d_object(sphere(quality=2, material_id=glass,
                                         radius=0.6))
        scene.add_3d_instance(sid)

        w, h, spp = 40, 30, 48
        settings = TpuSettings(samples_per_frame=spp, max_bounces=6,
                               clamp=100.0, sky_intensity=1.2,
                               sampler="sobol")
        bt = TpuBackend(w, h, settings)
        bc = CpuReferenceBackend(w, h, settings)
        bc.pixel_center = False
        sync_full(scene, bt)
        sync_full(scene, bc)
        view = Camera3D(fov=40).look_at(np.array([0, 0.6, 3.4], np.float32),
                                        np.zeros(3, np.float32)).get_view(w, h)
        a = bt.render(None, view).astype(np.float32)[..., :3] / 255
        b = bc.render(None, view).astype(np.float32)[..., :3] / 255
        mad = float(np.abs(a.mean(axis=(0, 1)) - b.mean(axis=(0, 1))).max())
        assert mad < 0.04, f"channel-mean abs diff {mad:.4f}"
        assert float(np.abs(a - b).mean()) < 0.08
