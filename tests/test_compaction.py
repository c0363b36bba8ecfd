"""Live-prefix compaction parity: the lax.switch prefix dispatch must be an
exact no-op on the estimator. With the pixel-keyed Sobol sampler every
lane's random stream follows its PIXEL, not its lane index, so a compacted
render and an uncompacted one must agree to float tolerance per pixel —
any divergence means prefix selection dropped a live lane or the
suffix-passthrough leaked state.

Frame is 256x256 (R=65536): large enough that _prefix_sizes emits multiple
static lengths and the switch actually exercises a proper sub-R branch
(the scene leaves ~half the frame as sky, mirroring the bench live
fraction)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rfw_tpu.backend.lights import (
    AreaLightsView, DirectionalLightsView, PointLightsView, SpotLightsView,
)
from rfw_tpu.models import sphere, quad3d
from rfw_tpu.render import pack_trace_scene
from rfw_tpu.render.pack import TraceScene
from rfw_tpu.render.atlas import atlas_to_device, pack_atlas
from rfw_tpu.render.lights_pack import DeviceLights, pack_lights
from rfw_tpu.render.wavefront import RenderConfig, _prefix_sizes, render_sample
from rfw_tpu.scene.camera import Camera3D
from rfw_tpu.scene.materials import Material, Materials


def _ctx():
    mats = Materials()
    m0 = mats.push(Material(roughness=0.6,
                            color=np.array([0.7, 0.7, 0.7, 1], np.float32)))
    m1 = mats.push(Material(roughness=0.25, metallic=0.6,
                            color=np.array([0.8, 0.4, 0.3, 1], np.float32)))
    floor = quad3d(normal=(0.0, 1.0, 0.0), width=6.0, height=6.0,
                   material_id=m0)
    ball = sphere(quality=2, material_id=m1)
    scene = pack_trace_scene(
        [(0, floor, None), (1, ball, None)],
        [(0, np.eye(4, dtype=np.float32)[None]),
         (1, (np.diag([1, 1, 1, 1]).astype(np.float32)
              + np.array([[0, 0, 0, 0], [0, 0, 0, 1.0],
                          [0, 0, 0, 0], [0, 0, 0, 0]], np.float32))[None])],
    )
    sd = TraceScene(*[jnp.asarray(x) for x in scene])
    dmats = jax.device_put(mats.to_device())
    atlas = atlas_to_device(pack_atlas([t for _, t in mats.textures]))
    dl = pack_lights(
        PointLightsView(position=np.array([[2, 4, 2]], np.float32),
                        energy=np.array([[60, 58, 55]], np.float32),
                        changed=np.ones(1, bool)),
        SpotLightsView.empty(), DirectionalLightsView.empty(),
        AreaLightsView.empty(),
    )
    dlights = DeviceLights(*[jnp.asarray(x) for x in dl])
    # look toward the horizon so a large fraction of the frame is sky —
    # the live count lands strictly inside a sub-R prefix branch
    cam = Camera3D(fov=60).look_at(np.array([0, 1.2, 5], np.float32),
                                   np.array([0, 1.0, 0], np.float32))
    return sd, dmats, atlas, dlights, cam


def test_prefix_sizes_shape():
    sizes = _prefix_sizes(256 * 256, 256)
    assert sizes[-1] == 256 * 256
    assert sizes == sorted(sizes)
    assert all(p % 256 == 0 for p in sizes[:-1])
    assert len(sizes) > 1
    # small fronts opt out (single full-length branch)
    assert _prefix_sizes(4096, 256) == [4096]


def test_compacted_matches_uncompacted():
    sd, dmats, atlas, dlights, cam = _ctx()
    size = 256
    view = jnp.asarray(cam.get_view(size, size).as_array())
    key = jax.random.PRNGKey(7)

    def run(compaction):
        cfg = RenderConfig(max_bounces=2, clamp=50.0, sky_intensity=0.6,
                           traversal="packet", sampler="sobol",
                           has_area_lights=False, compaction=compaction)
        return render_sample(sd, dmats, atlas, dlights, view, key, size,
                             size, cfg, sample_index=jnp.uint32(5))

    a = run("auto")
    b = run("off")
    # sky fraction sanity: the prefix branch must actually be sub-R
    hit_frac = float((np.asarray(a.depth) < 1e25).mean())
    assert 0.2 < hit_frac < 0.95, hit_frac
    # 3e-5: the two static prefix shapes fuse/vectorize differently, so
    # float op order inside a lane is not bitwise-pinned (observed worst
    # case 1 px / 196k at 1.1e-5 rel). A real compaction bug (dropped live
    # lane, suffix leak) diverges by whole radiance values, not 1e-5.
    np.testing.assert_allclose(np.asarray(a.radiance),
                               np.asarray(b.radiance), rtol=3e-5, atol=3e-5)
    for f in ("albedo", "normal", "depth", "position", "ao"):
        np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                   np.asarray(getattr(b, f)),
                                   rtol=3e-5, atol=3e-5, err_msg=f)
