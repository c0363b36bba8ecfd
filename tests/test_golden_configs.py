"""Golden gates for the BASELINE.json eval configs (VERDICT round-2 #7).

One small pinned golden per config (cornell — config 3 — lives in
test_golden.py):

  1. single OBJ mesh, primary rays + normal/albedo/depth AOVs
  2. glTF scene with directional + spot lights, direct lighting only
  4. animated: skinned glTF character (posed mid-animation) + BVH refit
  5. physics-coupled dynamic scene + per-frame TLAS rebuild + 2D/font
     overlay compositing

Regenerate after INTENTIONAL estimator/pipeline changes with
REGEN_GOLDEN=1 (same workflow as test_golden.py). Frames are uint8; the
gate allows tiny float-noise drift but pins structure exactly.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")
CESIUM = "/root/reference/assets/models/CesiumMan/CesiumMan.gltf"


def _gate(name, img):
    """Compare against (or regenerate) tests/golden/<name>.npy."""
    path = os.path.join(GOLD_DIR, name + ".npy")
    img = np.asarray(img)
    if os.environ.get("REGEN_GOLDEN") == "1" or not os.path.exists(path):
        np.save(path, img)
        pytest.skip(f"golden {name} (re)generated")
    ref = np.load(path)
    assert ref.shape == img.shape, (ref.shape, img.shape)
    a = img.astype(np.float32)
    b = ref.astype(np.float32)
    mad = float(np.abs(a - b).mean())
    frac_off = float((np.abs(a - b) > 3.0).mean())
    assert mad < 1.0, f"{name}: mean abs diff {mad:.3f}"
    assert frac_off < 0.01, f"{name}: {frac_off:.4f} of texels differ > 3"


# ---------------------------------------------------------- config 1: OBJ
OBJ_SRC = (
    "mtllib gold.mtl\n"
    "v -1 0 -1\nv 1 0 -1\nv 1 0 1\nv -1 0 1\n"
    "v -0.4 0 -0.4\nv 0.4 0 -0.4\nv 0 1.0 0\n"
    "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
    "vn 0 1 0\n"
    "usemtl floor\n"
    "f 1/1/1 3/3/1 2/2/1\nf 1/1/1 4/4/1 3/3/1\n"
    "usemtl pyramid\n"
    "f 5/1 6/2 7/3\n"
)
MTL_SRC = (
    "newmtl floor\nKd 0.6 0.62 0.65\nNs 40\n"
    "\nnewmtl pyramid\nKd 0.8 0.25 0.2\nNs 160\n"
)


def test_golden_obj_primary(tmp_path):
    from rfw_tpu.backend.lights import (
        AreaLightsView, DirectionalLightsView, PointLightsView,
        SpotLightsView,
    )
    from rfw_tpu.loaders.obj import ObjLoader
    from rfw_tpu.render import pack_trace_scene
    from rfw_tpu.render.pack import TraceScene
    from rfw_tpu.render.atlas import atlas_to_device, pack_atlas
    from rfw_tpu.render.lights_pack import DeviceLights, pack_lights
    from rfw_tpu.render.wavefront import RenderConfig, render_sample
    from rfw_tpu.scene.camera import Camera3D
    from rfw_tpu.scene.materials import Materials

    (tmp_path / "gold.mtl").write_text(MTL_SRC)
    obj = tmp_path / "gold.obj"
    obj.write_text(OBJ_SRC)

    mats = Materials()
    mesh = ObjLoader().load(str(obj), mats).mesh
    scene = pack_trace_scene(
        [(0, mesh, None)], [(0, np.eye(4, dtype=np.float32)[None])])
    sd = TraceScene(*[jnp.asarray(x) for x in scene])
    dmats = jax.device_put(mats.to_device())
    atlas = atlas_to_device(pack_atlas([t for _, t in mats.textures]))
    dl = pack_lights(PointLightsView.empty(), SpotLightsView.empty(),
                     DirectionalLightsView.empty(), AreaLightsView.empty())
    dlights = DeviceLights(*[jnp.asarray(x) for x in dl])
    cam = Camera3D(fov=50).look_at(np.array([1.6, 1.5, 2.2], np.float32),
                                   np.array([0, 0.4, 0], np.float32))
    size = 64
    view = jnp.asarray(cam.get_view(size, size).as_array())
    cfg = RenderConfig(max_bounces=0, sky_intensity=0.8, pixel_center=True)
    r = render_sample(sd, dmats, atlas, dlights, view, jax.random.PRNGKey(1),
                      size, size, cfg)
    depth = np.asarray(r.depth)
    depth_img = np.clip(depth / 6.0, 0, 1)  # misses (T_MAX) saturate to 1
    frame = np.concatenate([
        np.asarray(r.albedo).reshape(size, size, 3),
        np.asarray(r.normal).reshape(size, size, 3) * 0.5 + 0.5,
        depth_img.reshape(size, size, 1),
    ], axis=-1)
    _gate("obj_primary_64", np.clip(frame * 255.0, 0, 255).astype(np.uint8))


# --------------------------------------------- config 2: glTF direct light
def test_golden_gltf_direct():
    from rfw_tpu.app import Instance
    from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings

    W = H = 64
    backend = TpuBackend(W, H, TpuSettings(
        samples_per_frame=2, max_bounces=0, sky_intensity=0.4))
    app = Instance(backend, W, H)
    man = app.scene.add_3d(app.scene.load(CESIUM))
    del man  # rest pose
    app.scene.add_directional_light((0.4, -1.0, 0.3), (2.5, 2.4, 2.2))
    app.scene.add_spot_light((1.5, 2.5, 2.0), (-0.4, -0.9, -0.6),
                             (30, 29, 27), 22, 38)
    app.camera.look_at(np.array([1.4, 1.2, 2.2], np.float32),
                       np.array([0, 0.8, 0], np.float32))
    app.camera.fov = 50
    frame = app.render_frame()
    _gate("gltf_direct_64", frame)


# ------------------------------------------- config 4: animated + skinning
def test_golden_animated_skinned():
    from rfw_tpu.app import Instance
    from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings

    W = H = 64
    backend = TpuBackend(W, H, TpuSettings(
        samples_per_frame=1, max_bounces=1, sky_intensity=0.5))
    app = Instance(backend, W, H)
    man = app.scene.add_3d(app.scene.load(CESIUM))
    app.scene.add_directional_light((0.35, -1.0, 0.25), (2.2, 2.1, 1.9))
    app.scene.add_point_light((2, 3, 2), (25, 24, 23))
    app.camera.look_at(np.array([1.4, 1.2, 2.2], np.float32),
                       np.array([0, 0.8, 0], np.float32))
    app.camera.fov = 50
    man.set_time(0.5)  # mid-stride pose: skin + refit must both fire
    frame = app.render_frame()
    _gate("animated_skinned_64", frame)


# --------------------------------------- config 5: physics + font overlay
def test_golden_physics_overlay():
    from rfw_tpu.app import Instance
    from rfw_tpu.app.timer import GameTimer
    from rfw_tpu.font import FontPlugin, Section, Text
    from rfw_tpu.models import plane, sphere
    from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings
    from rfw_tpu.scene import Material
    from rfw_tpu.utils.physics import SphereWorld

    W, H = 96, 64
    backend = TpuBackend(W, H, TpuSettings(
        samples_per_frame=1, max_bounces=1, sky_intensity=0.6))
    app = Instance(backend, W, H)
    font = FontPlugin()
    app.with_plugin(font)
    scene = app.scene
    m_floor = scene.add_material(Material(
        color=np.array([0.55, 0.55, 0.6, 1], np.float32), roughness=0.9))
    m_ball = scene.add_material(Material(
        color=np.array([0.8, 0.35, 0.2, 1], np.float32), roughness=0.35,
        metallic=0.6))
    scene.add_3d_instance(scene.add_3d_object(
        plane(up=(0, 1, 0), size=(16, 16), material_id=m_floor)))
    ball_id = scene.add_3d_object(sphere(quality=2, radius=0.5,
                                         material_id=m_ball))
    world = SphereWorld.new()
    handles = []
    rng = np.random.default_rng(5)
    for k in range(4):
        world.add_sphere(np.array([rng.uniform(-1, 1), 1.5 + k,
                                   rng.uniform(-1, 1)], np.float32),
                         radius=0.5)
        handles.append(scene.add_3d_instance(ball_id))
    scene.add_directional_light((0.4, -1, 0.3), (2.5, 2.4, 2.2))

    def physics_system(w):
        world.step(0.03)  # fixed dt: deterministic trajectory
        for i, h in enumerate(handles):
            h.set_trs(world.positions[i], (0, 0, 0, 1), (1, 1, 1))

    def overlay(w):
        t = w.get(GameTimer)
        font.draw(Section((4, 4), [Text(f"f{t.frame}", px=14)]))

    app.with_system(physics_system).with_system(overlay)
    app.camera.look_at(np.array([5, 3.5, 6], np.float32),
                       np.array([0, 1, 0], np.float32))
    app.camera.fov = 50
    frame = None
    for _ in range(4):  # a few sim frames: TLAS rebuild every frame
        frame = app.render_frame()
    _gate("physics_overlay_96x64", frame)
