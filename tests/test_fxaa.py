"""FXAA post-pass (reference deferred_fxaa.frag parity, VERDICT round-1
missing item 7): edge stairsteps smooth out, flat regions pass through
bit-exact."""

import numpy as np
import jax.numpy as jnp

from rfw_tpu.render.film import tonemap
from rfw_tpu.render.fxaa import fxaa


def _staircase(h=64, w=64):
    """Hard diagonal black/white edge with 4-pixel stairsteps."""
    img = np.zeros((h, w, 3), np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    img[(xs // 4) * 4 > ys * 1.0] = 1.0
    return img


def test_flat_regions_unchanged():
    flat = np.full((32, 32, 3), 0.4, np.float32)
    out = np.asarray(fxaa(jnp.asarray(flat)))
    np.testing.assert_allclose(out, flat, atol=1e-6)


def test_edge_smoothing_reduces_stairsteps():
    img = _staircase()
    out = np.asarray(fxaa(jnp.asarray(img)))
    # hard full-contrast steps become gradients: far fewer |delta| > 0.9
    hard_in = (np.abs(np.diff(img[..., 0], axis=1)) > 0.9).sum()
    hard_out = (np.abs(np.diff(out[..., 0], axis=1)) > 0.9).sum()
    assert hard_out < hard_in * 0.8, (hard_in, hard_out)
    # intermediate (blended) values appear on the edge
    interior = out[8:-8, 8:-8, 0]
    blended = (interior > 0.05) & (interior < 0.95)
    assert blended.sum() > 20
    # global energy roughly preserved (no brightening/darkening)
    assert abs(out.mean() - img.mean()) < 0.01


def test_tonemap_fxaa_path():
    h = w = 32
    accum = np.zeros((h * w, 3), np.float32)
    accum[: h * w // 2] = 4.0  # hard horizontal edge in accumulated light
    base = np.asarray(tonemap(jnp.asarray(accum), jnp.float32(1.0), w, h))
    aa = np.asarray(tonemap(jnp.asarray(accum), jnp.float32(1.0), w, h,
                            fxaa=True))
    assert base.shape == aa.shape == (h, w, 4)
    assert base.dtype == aa.dtype == np.uint8
    # alpha untouched; frame not identical (edge pixels blended)
    assert (aa[..., 3] == 255).all()
