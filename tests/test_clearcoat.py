"""Clearcoat parity (VERDICT round-2 #7).

Round 2's oracle BSDF transcription stopped at the base reflection lobes,
so the product's GTR1 clearcoat (render/disney.py:134-140, mirroring the
reference's disney.glsl clearcoat branch) had no independent check.
`disney_eval_np` now carries the lobe; these tests pin

  * numeric lobe parity: jnp `disney_eval` vs the numpy transcription over
    random hemisphere directions with clearcoat swept 0 -> 1;
  * image parity: a clearcoat-heavy sphere renders the same through
    TpuBackend and CpuReferenceBackend.
"""

import numpy as np
import jax.numpy as jnp

from rfw_tpu.backend.contract import RenderMode
from rfw_tpu.render.disney import MatParams, disney_eval
from rfw_tpu.render.cpu_reference import CpuReferenceBackend, disney_eval_np
from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings
from rfw_tpu.scene.camera import Camera3D
from rfw_tpu.scene import Material, Scene
from rfw_tpu.models import sphere


def _hemisphere(rng, n):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v[:, 2] = np.abs(v[:, 2]) + 1e-3
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_clearcoat_lobe_matches_oracle_eval():
    rng = np.random.default_rng(7)
    n = 256
    wo = _hemisphere(rng, n)
    wi = _hemisphere(rng, n)
    base = rng.uniform(0.05, 1.0, size=(n, 3)).astype(np.float32)
    rough = rng.uniform(0.05, 1.0, size=n).astype(np.float32)
    metal = rng.uniform(0.0, 1.0, size=n).astype(np.float32)
    cc = np.repeat(np.array([0.0, 0.25, 0.5, 1.0], np.float32), n // 4)
    gloss = rng.uniform(0.0, 1.0, size=n).astype(np.float32)
    zeros = np.zeros(n, np.float32)

    p = MatParams(
        base_color=jnp.asarray(base), metallic=jnp.asarray(metal),
        roughness=jnp.asarray(rough), specular_f=jnp.full(n, 0.5),
        specular_tint=zeros, sheen=zeros, sheen_tint=zeros,
        clearcoat=jnp.asarray(cc), clearcoat_gloss=jnp.asarray(gloss),
        subsurface=zeros, anisotropic=zeros, transmission=zeros,
        eta_rel=jnp.full(n, 1.5),
    )
    f_jnp = np.asarray(disney_eval(p, jnp.asarray(wo), jnp.asarray(wi)))
    f_np = disney_eval_np(
        base, metal, rough, np.full(n, 0.5, np.float32), zeros, zeros,
        zeros, zeros, wo, wi, clearcoat=cc, clearcoat_gloss=gloss)
    np.testing.assert_allclose(f_jnp, f_np, rtol=2e-4, atol=1e-5)

    # the lobe actually contributes: cc=1 rows exceed their cc=0 twins
    p0 = p._replace(clearcoat=jnp.zeros(n))
    f0 = np.asarray(disney_eval(p0, jnp.asarray(wo), jnp.asarray(wi)))
    gain = (f_jnp - f0).sum()
    assert gain > 0.0


def test_clearcoat_sphere_image_parity():
    W, H = 64, 48
    cam = Camera3D(fov=55).look_at(np.array([0.0, 0.6, 2.6], np.float32),
                                   np.array([0.0, 0.0, 0.0], np.float32))
    frames = {}
    # max_bounces=0 keeps the comparison deterministic (NEE direct light
    # only) — the same envelope the other DEFAULT-mode parity tests use
    for cls in (TpuBackend, CpuReferenceBackend):
        be = cls(W, H, TpuSettings(samples_per_frame=1, max_bounces=0,
                                   clamp=1e6, pixel_center=True,
                                   sky_intensity=0.4))
        sc = Scene()
        mid = sc.add_material(Material(
            name="cc", color=np.array([0.7, 0.1, 0.1, 1], np.float32),
            roughness=0.6, clearcoat=1.0, clearcoat_gloss=0.9))
        ball = sphere(quality=3, radius=1.0, material_id=mid)
        oid = sc.add_3d_object(ball)
        sc.add_3d_instance(oid)
        sc.add_directional_light(direction=(-0.4, -1.0, -0.3),
                                 energy=(2.5, 2.5, 2.5))
        sc.synchronize(be)
        frames[cls] = be.render(None, cam.get_view(W, H), RenderMode.DEFAULT)
    a = frames[TpuBackend].astype(np.float32) / 255.0
    b = frames[CpuReferenceBackend].astype(np.float32) / 255.0
    e = float(np.sqrt(np.mean((a - b) ** 2)))
    assert e <= 2e-3, f"clearcoat sphere RMSE {e:.5f}"
    assert a.mean() * 255.0 > 1  # not black

    # clearcoat visibly brightens the highlight vs the same sphere w/o it
    be0 = CpuReferenceBackend(W, H, TpuSettings(
        samples_per_frame=1, max_bounces=0, clamp=1e6, pixel_center=True,
        sky_intensity=0.4))
    sc0 = Scene()
    m0 = sc0.add_material(Material(
        name="nocc", color=np.array([0.7, 0.1, 0.1, 1], np.float32),
        roughness=0.6))
    o0 = sc0.add_3d_object(sphere(quality=3, radius=1.0, material_id=m0))
    sc0.add_3d_instance(o0)
    sc0.add_directional_light(direction=(-0.4, -1.0, -0.3),
                              energy=(2.5, 2.5, 2.5))
    sc0.synchronize(be0)
    plain = be0.render(None, cam.get_view(W, H), RenderMode.DEFAULT)
    assert frames[CpuReferenceBackend].astype(int).sum() > plain.astype(int).sum()
