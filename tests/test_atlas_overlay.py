"""Texture atlas sampling + 2D overlay compositor."""

import numpy as np
import jax.numpy as jnp

from rfw_tpu.render.atlas import atlas_to_device, pack_atlas, sample_bilinear
from rfw_tpu.render.overlay import composite_overlay, rasterize_2d
from rfw_tpu.scene.materials import Texture, generate_mips
from rfw_tpu.backend.structs import InstancesView2D
from rfw_tpu.models import quad2d


def test_atlas_bilinear_and_mips():
    # 64x64: left half red, right half blue (linear data to skip srgb decode)
    img = np.zeros((64, 64, 4), np.uint8)
    img[:, :32] = [255, 0, 0, 255]
    img[:, 32:] = [0, 0, 255, 255]
    tex = Texture.from_array(img, srgb=False)
    atlas = atlas_to_device(pack_atlas([tex]))

    uv = jnp.asarray([[0.25, 0.5], [0.75, 0.5], [0.5, 0.5]], jnp.float32)
    tid = jnp.zeros(3, jnp.int32)
    c = np.asarray(sample_bilinear(atlas, tid, uv, jnp.zeros(3)))
    assert c[0, 0] > 0.9 and c[0, 2] < 0.1  # red side
    assert c[1, 2] > 0.9 and c[1, 0] < 0.1  # blue side
    assert 0.3 < c[2, 0] < 0.7  # seam blends
    # top mip is the average color
    top = np.asarray(sample_bilinear(atlas, tid[:1], uv[:1], jnp.full(1, 20.0)))
    assert abs(top[0, 0] - 0.5) < 0.06 and abs(top[0, 2] - 0.5) < 0.06
    # invalid texture id -> white
    w = np.asarray(sample_bilinear(atlas, jnp.full(1, -1, jnp.int32), uv[:1], jnp.zeros(1)))
    np.testing.assert_allclose(w[0], 1.0)


def test_mips_converge_to_mean():
    img = (np.random.default_rng(0).random((128, 128, 4)) * 255).astype(np.uint8)
    mips = generate_mips(img)
    assert mips[-1].shape[:2] == (1, 1)
    np.testing.assert_allclose(
        mips[-1][0, 0, :3].astype(float), img[..., :3].mean(axis=(0, 1)), atol=2.0
    )


def test_overlay_alpha_composite():
    mesh = quad2d(center=(32, 32), size=(32, 32), color=(1, 0, 0, 0.5)).view()
    inst = InstancesView2D(matrices=np.eye(4, dtype=np.float32)[None],
                           changed=np.ones(1, bool))
    from rfw_tpu.scene.camera import Camera2D

    cam = Camera2D.from_width_height(64, 64)
    ov = rasterize_2d([(mesh, inst)], {}, cam.matrix, 64, 64)
    assert ov[32, 32, 3] > 0.4  # covered center
    assert ov[4, 4, 3] == 0.0  # outside
    frame = np.full((64, 64, 4), 100, np.uint8)
    out = composite_overlay(frame, ov)
    assert out[32, 32, 0] > out[4, 4, 0]  # red blended over
    assert out[4, 4, 0] == 100  # untouched outside
