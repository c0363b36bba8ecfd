"""Progressive film accumulation + tonemapping.

Reference: gpu-rt's accumulator texture + sample_count + blit.comp
(src/lib.rs:1731, RenderMode::Reset zeroing :1690-1692). The film is a
device-resident (H*W,3) f32 accumulator; `add_sample` is donated/in-place
under jit; tonemap produces uint8 RGBA for host streaming.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, donate_argnames=("accum",))
def add_sample(accum: jax.Array, sample: jax.Array) -> jax.Array:
    return accum + sample


def new_film(width: int, height: int) -> jax.Array:
    return jnp.zeros((width * height, 3), jnp.float32)


def _aces(x: jax.Array) -> jax.Array:
    """ACES filmic approximation (Narkowicz)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("width", "height", "mode", "fxaa"))
def tonemap(
    accum: jax.Array,
    spp: jax.Array,
    width: int,
    height: int,
    exposure: float = 1.0,
    mode: str = "aces",
    fxaa: bool = False,
) -> jax.Array:
    """(H*W,3) accumulator -> (H,W,4) uint8 sRGB frame. fxaa=True runs the
    FXAA post-pass on the encoded frame (reference deferred_fxaa.frag)."""
    c = accum / jnp.maximum(spp, 1.0) * exposure
    if mode == "aces":
        c = _aces(c)
    elif mode == "reinhard":
        c = c / (1.0 + c)
    else:  # clamp
        c = jnp.clip(c, 0.0, 1.0)
    # sRGB encode
    c = jnp.where(c <= 0.0031308, 12.92 * c, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055)
    c = jnp.clip(c, 0.0, 1.0)
    if fxaa:
        from rfw_tpu.render.fxaa import fxaa as _fxaa

        c = _fxaa(c.reshape(height, width, 3)).reshape(-1, 3)
    rgb = (c * 255.0 + 0.5).astype(jnp.uint8).reshape(height, width, 3)
    alpha = jnp.full((height, width, 1), 255, jnp.uint8)
    return jnp.concatenate([rgb, alpha], axis=-1)


def frame_to_host(frame: jax.Array) -> np.ndarray:
    return np.asarray(frame)
