"""2D overlay parity: the oracle's independent full-frame edge-function
rasterizer must match the product's bbox-scan barycentric fill through the
Backend seam (the last piece of the contract the oracle did not cover).
Edge-tie pixels may differ by float rounding — RMSE gate, not bit-exact."""

import numpy as np

from rfw_tpu.backend.contract import RenderMode
from rfw_tpu.models import quad2d, quad3d
from rfw_tpu.render.cpu_reference import CpuReferenceBackend
from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings
from rfw_tpu.scene import Scene
from rfw_tpu.scene.camera import Camera2D, Camera3D
from rfw_tpu.scene.materials import Material, Texture

from tests.test_reference_backend import rmse, sync_full

W = H = 96


def _scene():
    scene = Scene()
    m = scene.add_material(Material(
        color=np.array([0.4, 0.45, 0.5, 1], np.float32), roughness=0.8))
    scene.add_3d_instance(scene.add_3d_object(
        quad3d(normal=(0, 0, 1), width=4, height=4, material_id=m)))
    scene.add_point_light((1, 1, 3), (12, 12, 12))

    # textured quad + rotated vertex-colored quad, pixel space
    c = np.indices((16, 16)).sum(axis=0) % 2
    tex = np.stack([c * 255, 255 - c * 200, np.full_like(c, 90),
                    np.full_like(c, 255)], axis=-1).astype(np.uint8)
    tid = scene.add_texture(Texture.from_array(tex))
    scene.add_2d_instance(scene.add_2d_object(
        quad2d(center=(30, 30), size=(36, 28), texture_id=tid)))
    rot = np.eye(4, dtype=np.float32)
    a = 0.6
    rot[0, 0] = np.cos(a); rot[0, 1] = -np.sin(a)
    rot[1, 0] = np.sin(a); rot[1, 1] = np.cos(a)
    tr1 = np.eye(4, dtype=np.float32); tr1[:2, 3] = (-64, -60)
    tr2 = np.eye(4, dtype=np.float32); tr2[:2, 3] = (64, 60)
    scene.add_2d_instance(
        scene.add_2d_object(quad2d(center=(0, 0), size=(40, 24),
                                   color=(1.0, 0.4, 0.2, 0.7))),
        matrix=tr2 @ rot @ tr1,
    )
    return scene


def test_overlay_matches_product():
    scene = _scene()
    settings = TpuSettings(samples_per_frame=1, max_bounces=0,
                           pixel_center=True)
    bt = TpuBackend(W, H, settings)
    bc = CpuReferenceBackend(W, H, settings)
    sync_full(scene, bt)
    sync_full(scene, bc)
    cam3 = Camera3D(fov=50).look_at(np.array([0, 0, 5], np.float32),
                                    np.zeros(3, np.float32))
    v3 = cam3.get_view(W, H)
    v2 = Camera2D.from_width_height(W, H).get_view()

    ft = bt.render(v2, v3, RenderMode.ALBEDO)
    fc = bc.render(v2, v3, RenderMode.ALBEDO)
    # overlay actually appears (differs from a no-overlay render)
    base = bt.render(None, v3, RenderMode.ALBEDO)
    assert np.abs(ft.astype(int) - base.astype(int)).max() > 30
    # the two rasterizers use different edge rules (bbox-scan barycentric
    # vs full-frame edge functions): pixels exactly on the rotated quad's
    # diagonal edges may differ — interior must agree
    e = rmse(ft, fc)
    assert e <= 8e-3, f"overlay parity RMSE {e:.5f}"
    d = np.abs(ft[..., :3].astype(int) - fc[..., :3].astype(int)).max(-1)
    assert (d > 8).mean() < 0.005, f"{(d > 8).mean():.4f} pixels differ"
