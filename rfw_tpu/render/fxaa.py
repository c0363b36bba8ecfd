"""FXAA post-pass (console/3.11-style) on the tonemapped frame.

Reference parity: backends/wgpu/shaders/deferred_fxaa.frag:1-73 — the
reference runs FXAA as a fullscreen pass on the LDR output. This is the
same algorithm family expressed as one vectorized jnp function over the
whole frame (edge-clamped neighborhood taps + a direction-driven pair of
bilinear samples), so XLA fuses it into the tonemap dispatch.

Operates on sRGB-encoded float RGB in [0,1] (FXAA is defined on
perceptually-encoded data; running it pre-encode blurs shadows)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)

_EDGE_THRESHOLD = 1.0 / 8.0
_EDGE_THRESHOLD_MIN = 1.0 / 24.0
_DIR_REDUCE_MUL = 1.0 / 8.0
_DIR_REDUCE_MIN = 1.0 / 128.0
_SPAN_MAX = 8.0


def _shift(img: jax.Array, dy: int, dx: int) -> jax.Array:
    """Edge-clamped neighbor fetch: img[(y+dy, x+dx)] with border clamp."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


def _bilinear(img: jax.Array, fy: jax.Array, fx: jax.Array) -> jax.Array:
    """Bilinear sample of (H,W,3) at fractional pixel offsets per pixel."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    ay = (fy - y0)[..., None]
    ax = (fx - x0)[..., None]
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    flat = img.reshape(-1, img.shape[-1])

    def tap(y, x):
        return flat[(y * w + x).reshape(-1)].reshape(img.shape)

    return (tap(y0, x0) * (1 - ax) * (1 - ay) + tap(y0, x1) * ax * (1 - ay)
            + tap(y1, x0) * (1 - ax) * ay + tap(y1, x1) * ax * ay)


@jax.jit
def fxaa(rgb: jax.Array) -> jax.Array:
    """(H,W,3) sRGB-encoded float frame -> antialiased frame, same shape."""
    h, w = rgb.shape[0], rgb.shape[1]
    luma = rgb @ _LUMA  # (H,W)

    l_m = luma
    l_nw = _shift(luma, -1, -1)
    l_ne = _shift(luma, -1, 1)
    l_sw = _shift(luma, 1, -1)
    l_se = _shift(luma, 1, 1)

    l_min = jnp.minimum(l_m, jnp.minimum(jnp.minimum(l_nw, l_ne),
                                         jnp.minimum(l_sw, l_se)))
    l_max = jnp.maximum(l_m, jnp.maximum(jnp.maximum(l_nw, l_ne),
                                         jnp.maximum(l_sw, l_se)))
    contrast = l_max - l_min
    skip = contrast < jnp.maximum(_EDGE_THRESHOLD_MIN,
                                  l_max * _EDGE_THRESHOLD)

    # edge direction from the diagonal luma cross
    dir_x = -((l_nw + l_ne) - (l_sw + l_se))
    dir_y = (l_nw + l_sw) - (l_ne + l_se)
    dir_reduce = jnp.maximum(
        (l_nw + l_ne + l_sw + l_se) * 0.25 * _DIR_REDUCE_MUL,
        _DIR_REDUCE_MIN,
    )
    rcp = 1.0 / (jnp.minimum(jnp.abs(dir_x), jnp.abs(dir_y)) + dir_reduce)
    dir_x = jnp.clip(dir_x * rcp, -_SPAN_MAX, _SPAN_MAX)
    dir_y = jnp.clip(dir_y * rcp, -_SPAN_MAX, _SPAN_MAX)

    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")

    a0 = _bilinear(rgb, gy + dir_y * (1.0 / 3.0 - 0.5),
                   gx + dir_x * (1.0 / 3.0 - 0.5))
    a1 = _bilinear(rgb, gy + dir_y * (2.0 / 3.0 - 0.5),
                   gx + dir_x * (2.0 / 3.0 - 0.5))
    rgb_a = 0.5 * (a0 + a1)
    b0 = _bilinear(rgb, gy - dir_y * 0.5, gx - dir_x * 0.5)
    b1 = _bilinear(rgb, gy + dir_y * 0.5, gx + dir_x * 0.5)
    rgb_b = rgb_a * 0.5 + 0.25 * (b0 + b1)

    l_b = rgb_b @ _LUMA
    use_a = (l_b < l_min) | (l_b > l_max)
    out = jnp.where(use_a[..., None], rgb_a, rgb_b)
    return jnp.where(skip[..., None], rgb, out)
