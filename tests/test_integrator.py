"""Integrator correctness: furnace test, analytic direct lighting, MIS/NEE
consistency. These are the statistical gates the Pallas fast path must also
pass (SURVEY.md §4: do better than the reference's thin testing)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rfw_tpu.backend.lights import (
    DirectionalLightsView,
    PointLightsView,
    SpotLightsView,
)
from rfw_tpu.models import quad3d, sphere
from rfw_tpu.render import pack_trace_scene
from rfw_tpu.render.pack import TraceScene
from rfw_tpu.render.atlas import atlas_to_device, pack_atlas
from rfw_tpu.render.lights_pack import DeviceLights, pack_lights
from rfw_tpu.render.wavefront import RenderConfig, render_sample
from rfw_tpu.scene.camera import Camera3D
from rfw_tpu.scene.lights import extract_area_lights
from rfw_tpu.scene.materials import Material, Materials


def to_dev(scene):
    return TraceScene(*[jnp.asarray(x) for x in scene])


def make_ctx(meshes, instances, materials: Materials, area_lights=None,
             point=None, spot=None, directional=None):
    scene = to_dev(pack_trace_scene(meshes, instances))
    mats = jax.device_put(materials.to_device())
    atlas = atlas_to_device(pack_atlas([t for _, t in materials.textures]))
    from rfw_tpu.backend.lights import AreaLightsView

    dl = pack_lights(
        point or PointLightsView.empty(),
        spot or SpotLightsView.empty(),
        directional or DirectionalLightsView.empty(),
        area_lights or AreaLightsView.empty(),
    )
    lights = DeviceLights(*[jnp.asarray(x) for x in dl])
    return scene, mats, atlas, lights


def render(scene, mats, atlas, lights, cam, size, spp, cfg):
    view = jnp.asarray(cam.get_view(size, size).as_array())
    acc = jnp.zeros((size * size, 3), jnp.float32)
    key = jax.random.PRNGKey(3)
    for s in range(spp):
        r = render_sample(scene, mats, atlas, lights, view,
                          jax.random.fold_in(key, s), size, size, cfg)
        acc = acc + r.radiance
    return np.asarray(acc / spp)


class TestFurnace:
    def test_white_furnace(self):
        """Unit-albedo diffuse sphere in a unit-radiance sky: every path
        returns 1.0 exactly (f*cos/pdf == albedo for cosine sampling), so
        radiance must equal 1 up to the bounce cutoff."""
        mats = Materials()
        white = mats.push(Material(color=np.array([1.0, 1.0, 1.0, 1], np.float32),
                                   roughness=1.0, specular_f=0.0, metallic=0.0))
        mesh = sphere(quality=2, material_id=white)
        ctx = make_ctx([(0, mesh, None)], [(0, np.eye(4, dtype=np.float32)[None])], mats)
        cam = Camera3D(fov=30).look_at(np.array([0, 0, 4.0], np.float32), np.zeros(3, np.float32))
        cfg = RenderConfig(max_bounces=16, clamp=1e9, sky_intensity=1.0)
        img = render(*ctx, cam, 32, 16, cfg)
        center = img.reshape(32, 32, 3)[12:20, 12:20]
        # Residual = energy beyond 16 bounces; tiny for unit albedo because
        # cosine-sampled diffuse terminates geometrically only via cap.
        assert abs(center.mean() - 1.0) < 0.05, center.mean()

    def test_gray_furnace(self):
        """albedo 0.5 sphere in unit sky: L = sum_k a^k -> L_inf = 1/(1-a)*?
        Actually for a furnace, L = 1 (the sky) regardless of albedo as
        k->inf: L = sum a^k*(1-a)... no — classic result: L == 1 requires
        white albedo. For a=0.5, L = sky * (a^0 terms...): the escape
        probability after each bounce weights throughput a^k; with cap N,
        L = sum_{k=0..N} a^k * P(escape at k). For diffuse closed sphere
        interior we can't derive cheaply — just require L < 1 and > a."""
        mats = Materials()
        gray = mats.push(Material(color=np.array([0.5, 0.5, 0.5, 1], np.float32),
                                  roughness=1.0, specular_f=0.0))
        mesh = sphere(quality=2, material_id=gray)
        ctx = make_ctx([(0, mesh, None)], [(0, np.eye(4, dtype=np.float32)[None])], mats)
        cam = Camera3D(fov=30).look_at(np.array([0, 0, 4.0], np.float32), np.zeros(3, np.float32))
        cfg = RenderConfig(max_bounces=8, clamp=1e9, sky_intensity=1.0)
        img = render(*ctx, cam, 32, 8, cfg)
        center = img.reshape(32, 32, 3)[12:20, 12:20].mean()
        assert 0.4 < center < 1.0


class TestDirectLighting:
    def test_point_light_analytic(self):
        """Diffuse plane, point light straight above: L = albedo/pi * I / d^2."""
        mats = Materials()
        albedo = 0.8
        m = mats.push(Material(color=np.array([albedo] * 3 + [1], np.float32),
                               roughness=1.0, specular_f=0.0))
        mesh = quad3d(normal=(0, 1, 0), position=(0, 0, 0), width=20, height=20,
                      material_id=m)
        I = 4.0
        d = 2.0
        point = PointLightsView(
            position=np.array([[0, d, 0]], np.float32),
            energy=np.array([[I, I, I]], np.float32),
            changed=np.ones(1, bool),
        )
        ctx = make_ctx([(0, mesh, None)], [(0, np.eye(4, dtype=np.float32)[None])],
                       mats, point=point)
        cam = Camera3D(fov=20).look_at(np.array([0, 3.0, 0.01], np.float32),
                                       np.zeros(3, np.float32))
        cfg = RenderConfig(max_bounces=1, clamp=1e9)
        img = render(*ctx, cam, 32, 32, cfg).reshape(32, 32, 3)
        got = img[14:18, 14:18].mean()
        # Burley diffuse at normal incidence ~= lambert albedo/pi
        expected = albedo / np.pi * I / (d * d)
        assert abs(got - expected) / expected < 0.08, (got, expected)

    def test_shadowing(self):
        """An off-axis blocker casts a hard shadow to the side: the shadowed
        floor band must be near-black while the mirrored lit band is not.

        Geometry: light at (-3,3,0), 2x2 blocker at y=1 -> shadow band
        x in (0,3) on the floor; camera looks straight down so both the
        shadow band (x ~ +2) and the lit mirror band (x ~ -2) are visible."""
        mats = Materials()
        m = mats.push(Material(color=np.array([0.8, 0.8, 0.8, 1], np.float32), roughness=1.0))
        floor = quad3d(normal=(0, 1, 0), position=(0, 0, 0), width=10, height=10, material_id=m)
        blocker = quad3d(normal=(0, 1, 0), position=(0, 1, 0), width=2, height=2, material_id=m)
        point = PointLightsView(
            position=np.array([[-3, 3, 0]], np.float32),
            energy=np.array([[20, 20, 20]], np.float32),
            changed=np.ones(1, bool),
        )
        ctx = make_ctx(
            [(0, floor, None), (1, blocker, None)],
            [(0, np.eye(4, dtype=np.float32)[None]), (1, np.eye(4, dtype=np.float32)[None])],
            mats, point=point,
        )
        cam = Camera3D(fov=60).look_at(np.array([0, 6.0, 0.01], np.float32), np.zeros(3, np.float32))
        cfg = RenderConfig(max_bounces=1, clamp=1e9)
        img = render(*ctx, cam, 48, 8, cfg).reshape(48, 48, 3)
        # x = +-2 maps to +-14px from center (6.93 px/unit); handedness-agnostic
        a = img[22:26, 8:12].mean()
        b = img[22:26, 36:40].mean()
        lit, shadow = max(a, b), min(a, b)
        assert lit > 0.05, (a, b)
        assert shadow < 0.1 * lit, (a, b)


class TestMIS:
    def test_nee_and_bsdf_agree(self):
        """Area-light scene: rendering with NEE+MIS must converge to the
        same value as BSDF-only sampling (different estimators, same
        integral)."""
        mats = Materials()
        m = mats.push(Material(color=np.array([0.7, 0.7, 0.7, 1], np.float32),
                               roughness=1.0, specular_f=0.0))
        lm = mats.push(Material(color=np.array([8, 8, 8, 1], np.float32)))
        floor = quad3d(normal=(0, 1, 0), position=(0, 0, 0), width=4, height=4, material_id=m)
        lamp = quad3d(normal=(0, -1, 0), position=(0, 2, 0), width=1.5, height=1.5, material_id=lm)
        # one merged mesh
        from rfw_tpu.models.mesh3d import build_mesh3d

        pos = np.concatenate([floor.positions, lamp.positions])
        idx = np.concatenate([floor.indices, lamp.indices + floor.num_vertices])
        nrm = np.concatenate([floor.normals, lamp.normals])
        uv = np.concatenate([floor.uvs, lamp.uvs])
        mid = np.concatenate([floor.tri_material, lamp.tri_material])
        mesh = build_mesh3d(pos, idx, normals=nrm, uvs=uv, material_ids=mid)

        flags = mats.light_flags()
        emissive = flags[mesh.tri_material]
        radiance = np.stack([mats.get(int(t)).emission for t in mesh.tri_material])
        lights, light_id = extract_area_lights(
            emissive, radiance, mesh.tri_vertices(),
            np.eye(4, dtype=np.float32)[None], 0, np.array([0]),
        )
        mesh.tri_light[:] = light_id
        ctx_nee = make_ctx([(0, mesh, None)], [(0, np.eye(4, dtype=np.float32)[None])],
                           mats, area_lights=lights)
        # BSDF-only: no registered lights (emissive still glows on hit)
        ctx_bsdf = make_ctx([(0, mesh, None)], [(0, np.eye(4, dtype=np.float32)[None])], mats)

        cam = Camera3D(fov=45).look_at(np.array([0, 1.2, 2.8], np.float32),
                                       np.array([0, 0.5, 0], np.float32))
        cfg = RenderConfig(max_bounces=2, clamp=1e9)
        img_nee = render(*ctx_nee, cam, 32, 48, cfg).reshape(32, 32, 3)
        img_bsdf = render(*ctx_bsdf, cam, 32, 192, cfg).reshape(32, 32, 3)
        # compare mid-floor patch means
        a = img_nee[20:28, 8:24].mean()
        b = img_bsdf[20:28, 8:24].mean()
        assert abs(a - b) / max(b, 1e-6) < 0.15, (a, b)


def test_vmem_budget_fallback_renders():
    """A scene over the Pallas VMEM budget must auto-select the jnp packet
    tier and still render (the large-scene fallback path had no coverage)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from rfw_tpu.models import sphere
    from rfw_tpu.ops.traverse import VMEM_SCENE_BUDGET, pallas_scene_bytes
    from rfw_tpu.render import pack_trace_scene
    from rfw_tpu.render.pack import TraceScene

    # DISTINCT meshes grow the shared tri arena (instances alone do not);
    # enough dense spheres push the packed arena past the kernel budget
    # (~64 B/tri kernel footprint)
    mesh = sphere(quality=4)  # ~20k tris
    n_meshes = int(VMEM_SCENE_BUDGET / (mesh.num_triangles * 64)) + 2
    meshes = [(i, sphere(quality=4, radius=0.4 + 0.01 * i), None)
              for i in range(n_meshes)]
    mats = np.eye(4, dtype=np.float32)[None]
    insts = []
    for i in range(n_meshes):
        m = mats.copy()
        m[0, 0, 3] = (i % 4) * 1.5 - 2.25
        m[0, 1, 3] = (i // 4) * 1.5 - 1.5
        insts.append((i, m))
    scene = pack_trace_scene(meshes, insts)
    assert pallas_scene_bytes(scene) > VMEM_SCENE_BUDGET

    from tests.test_integrator import make_ctx, render
    from rfw_tpu.render.wavefront import RenderConfig
    from rfw_tpu.scene.camera import Camera3D

    from rfw_tpu.scene.materials import Materials

    ctx = make_ctx(meshes, insts, Materials())
    cam = Camera3D(fov=40).look_at(np.array([0, 0, 6.0], np.float32),
                                   np.zeros(3, np.float32))
    cfg = RenderConfig(max_bounces=0, sky_intensity=1.0, traversal="auto")
    img = render(*ctx, cam, 16, 1, cfg)
    assert np.isfinite(img).all()
    assert img.min() < 0.9  # spheres occlude part of the sky
