"""Texture atlas: flat device texel pool + gather-based sampling.

TPUs have no texture units (SURVEY.md §7 hard part #3): all mips of all
textures are packed into one flat (N,) uint32 RGBA8 array in HBM, with a
per-(texture, mip) offset/size table, and sampling is pure gather +
arithmetic. Replaces the reference's 128-slot bind-group texture array
(backends/wgpu/src/lib.rs:133, trilinear fetch in gpu-rt shade.comp).

Layout: texel index = offset[tex, mip] + ty * width[tex, mip] + tx.
sRGB decode happens at *pack* time into the pool? No — pool keeps raw
RGBA8; decode after gather (cheap pow approximation) so linear-data
textures (normal maps) stay exact.

Quad rows: the pool is (N, 4) — row (x, y) holds the texel's whole
wrapped 2x2 bilinear footprint [t(x,y), t(x+1,y), t(x,y+1), t(x+1,y+1)]
(neighbors precomputed with wrap at pack time). TPU gathers are
latency/burst-bound per ROW, not per byte: one 16-byte contiguous row
costs the same as one 4-byte texel, so a bilinear fetch is ONE scattered
gather instead of four, at 4x pool memory (~190MB for the pica set —
HBM-resident, uploaded once). Bit-identical to the old 4-gather path.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

MAX_MIPS = 16


class TextureAtlas(NamedTuple):
    texels: np.ndarray  # (N,4) uint32 packed RGBA8 quad rows (see module
    #   docstring): [:,0]=t(x,y) [:,1]=t(x+1,y) [:,2]=t(x,y+1) [:,3]=t(x+1,y+1)
    offset: np.ndarray  # (T, MAX_MIPS) i32
    width: np.ndarray  # (T, MAX_MIPS) i32
    height: np.ndarray  # (T, MAX_MIPS) i32
    mip_count: np.ndarray  # (T,) i32
    srgb: np.ndarray  # (T,) bool — decode gamma after gather
    meta: Optional[np.ndarray] = None  # (T,8) i32 packed per-texture row
    #   [off0, w0, h0, mip_count, srgb, 0, 0, 0]. Every (R,) gather costs
    #   ~12ms/2M rays on this TPU regardless of table size (latency-bound
    #   per ROW), so the 6 per-lane metadata gathers sample_bilinear needs
    #   (mip_count/width0/offset/width/height/srgb — measured 76ms vs the
    #   190MB texel pool's 50) collapse into THIS one row; per-mip
    #   offset/width/height derive arithmetically (textures are POT with
    #   exact-halving mips — materials._to_pow2 + generate_mips). None when
    #   any packed chain violates the halving rule (pack_atlas verifies):
    #   sample_bilinear then falls back to the table gathers.


def pack_atlas(textures: Sequence, pad_to: int = 1) -> TextureAtlas:
    """textures: sequence of scene.materials.Texture (or None placeholders)."""
    chunks: List[np.ndarray] = []
    n_tex = max(len(textures), 1)
    offset = np.zeros((n_tex, MAX_MIPS), np.int32)
    width = np.ones((n_tex, MAX_MIPS), np.int32)
    height = np.ones((n_tex, MAX_MIPS), np.int32)
    mip_count = np.ones(n_tex, np.int32)
    srgb = np.zeros(n_tex, bool)
    cursor = 0
    for ti, tex in enumerate(textures):
        if tex is None:
            continue
        srgb[ti] = tex.srgb
        mip_count[ti] = min(len(tex.mips), MAX_MIPS)
        for mi, mip in enumerate(tex.mips[:MAX_MIPS]):
            h, w = mip.shape[:2]
            rgba = mip.astype(np.uint32)
            packed = (
                rgba[..., 0] | (rgba[..., 1] << 8) | (rgba[..., 2] << 16) | (rgba[..., 3] << 24)
            )  # (h, w)
            # bake the wrapped 2x2 bilinear footprint into each row
            px = np.roll(packed, -1, axis=1)
            py = np.roll(packed, -1, axis=0)
            pxy = np.roll(px, -1, axis=0)
            quad = np.stack([packed, px, py, pxy], axis=-1).reshape(-1, 4)
            chunks.append(quad)
            offset[ti, mi] = cursor
            width[ti, mi] = w
            height[ti, mi] = h
            cursor += quad.shape[0]
    if not chunks:
        chunks = [np.full((1, 4), 0xFFFFFFFF, np.uint32)]
        cursor = 1
    texels = np.concatenate(chunks).astype(np.uint32)
    if pad_to > 1 and texels.shape[0] % pad_to:
        texels = np.concatenate(
            [texels, np.zeros((pad_to - texels.shape[0] % pad_to, 4), np.uint32)]
        )
    # packed one-gather metadata row (see TextureAtlas.meta): valid only if
    # every recorded mip chain follows the exact-halving derivation
    meta: Optional[np.ndarray] = np.zeros((n_tex, 8), np.int32)
    meta[:, 0] = offset[:, 0]
    meta[:, 1] = width[:, 0]
    meta[:, 2] = height[:, 0]
    meta[:, 3] = mip_count
    meta[:, 4] = srgb.astype(np.int32)
    for ti in range(n_tex):
        acc = int(offset[ti, 0])
        for mi in range(int(mip_count[ti])):
            w_m = max(int(width[ti, 0]) >> mi, 1)
            h_m = max(int(height[ti, 0]) >> mi, 1)
            if (w_m != width[ti, mi] or h_m != height[ti, mi]
                    or acc != offset[ti, mi]):
                meta = None
                break
            acc += w_m * h_m
        if meta is None:
            break
    return TextureAtlas(texels, offset, width, height, mip_count, srgb, meta)


def _unpack_rgba(px: jax.Array) -> jax.Array:
    """(...,) uint32 -> (...,4) float in [0,1]."""
    r = (px & 0xFF).astype(jnp.float32)
    g = ((px >> 8) & 0xFF).astype(jnp.float32)
    b = ((px >> 16) & 0xFF).astype(jnp.float32)
    a = ((px >> 24) & 0xFF).astype(jnp.float32)
    return jnp.stack([r, g, b, a], axis=-1) * (1.0 / 255.0)


def _srgb_to_linear(c: jax.Array) -> jax.Array:
    return jnp.where(c <= 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4))


def sample_bilinear(
    atlas: TextureAtlas,
    tex_id: jax.Array,  # (R,) i32; <0 allowed (returns white)
    uv: jax.Array,  # (R,2) f32, wrapped
    lod: jax.Array,  # (R,) f32 — mip level
    trilinear: bool = False,
    meta_row=None,  # optional prefetched metadata columns
    #   (off0, w0, h0, mip_count, srgb) as (R,) i32/bool arrays — the
    #   integrator delivers them through the material one-hot MXU fetch
    #   (wavefront._fetch_material_c) so this call gathers ONLY texels
) -> jax.Array:
    """Mip-mapped RGBA fetch. Returns (R,4) linear values.

    Default is bilinear at the NEAREST mip (ONE quad-row gather brings the
    whole 2x2 footprint — see module docstring); trilinear blends two mips
    (2 gathers). Scattered texel-pool gathers are the dominant material-
    stage cost at 2M rays, so quad rows are worth ~4x over per-corner
    gathers; the nearest-mip default halves trilinear's cost again for a
    visually minor mip-snap."""
    # uv: (R,2) stacked, or a (u, v) tuple of (R,) components (the
    # integrator's component-form hot path avoids the stack+slice pair)
    uv_u, uv_v = (uv[0], uv[1]) if isinstance(uv, tuple) else (
        uv[..., 0], uv[..., 1])
    valid = tex_id >= 0
    t = jnp.maximum(tex_id, 0)
    if meta_row is not None or atlas.meta is not None:
        if meta_row is not None:
            # zero metadata gathers: the caller already carries the row
            off0, w0i, h0i, mipc, srgb_f = meta_row
        else:
            # ONE metadata gather; per-mip (off, w, h) derive
            # arithmetically (POT + exact halving, verified at pack time)
            # — the six table gathers this replaces measured 76ms/2M rays
            # vs ~12 for one row
            row = atlas.meta[t]  # (R,8)
            off0, w0i, h0i = row[..., 0], row[..., 1], row[..., 2]
            mipc = row[..., 3]
            srgb_f = row[..., 4] > 0

        def mip_owh(m):
            w = jnp.maximum(w0i >> m, 1)
            h = jnp.maximum(h0i >> m, 1)
            off = off0
            for k in range(MAX_MIPS - 1):
                wk = jnp.maximum(w0i >> k, 1)
                hk = jnp.maximum(h0i >> k, 1)
                off = off + jnp.where(k < m, wk * hk, 0)
            return off, w, h
    else:
        mipc = atlas.mip_count[t]
        w0i = atlas.width[t, 0]
        srgb_f = atlas.srgb[t]

        def mip_owh(m):
            return atlas.offset[t, m], atlas.width[t, m], atlas.height[t, m]

    max_mip = (mipc - 1).astype(jnp.float32)
    # the integrator's footprint is in 1024-reference texels (wavefront
    # lod = log2(t*spread*lodf*1024)); rebase to THIS texture's actual
    # resolution or small textures over-blur (an 8x8 map sampled at a 3m
    # viewing distance landed on its 1x1 mip) and >1024 maps under-filter
    w0 = jnp.maximum(w0i.astype(jnp.float32), 1.0)
    lod = lod + jnp.log2(w0) - 10.0
    lod = jnp.clip(lod, 0.0, max_mip)
    if trilinear:
        m0 = jnp.floor(lod).astype(jnp.int32)
        m1 = jnp.minimum(m0 + 1, mipc - 1)
        frac = (lod - m0.astype(jnp.float32))[..., None]
    else:
        m0 = jnp.round(lod).astype(jnp.int32)

    def fetch_mip(m):
        off, w, h = mip_owh(m)
        # wrap repeat
        u = uv_u - jnp.floor(uv_u)
        v = uv_v - jnp.floor(uv_v)
        x = u * w.astype(jnp.float32) - 0.5
        y = v * h.astype(jnp.float32) - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0.astype(jnp.float32))[..., None]
        fy = (y - y0.astype(jnp.float32))[..., None]

        xi = jnp.mod(x0, w)
        yi = jnp.mod(y0, h)
        quad = atlas.texels[off + yi * w + xi]  # (R,4) — the ONE gather
        c00 = _unpack_rgba(quad[..., 0])
        c10 = _unpack_rgba(quad[..., 1])
        c01 = _unpack_rgba(quad[..., 2])
        c11 = _unpack_rgba(quad[..., 3])
        return (
            (c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy
        )

    if trilinear:
        c = fetch_mip(m0) * (1 - frac) + fetch_mip(m1) * frac
    else:
        c = fetch_mip(m0)
    rgb = jnp.where(
        srgb_f[..., None], _srgb_to_linear(c[..., :3]), c[..., :3]
    )
    c = jnp.concatenate([rgb, c[..., 3:4]], axis=-1)
    return jnp.where(valid[..., None], c, jnp.ones_like(c))


def atlas_to_device(atlas: TextureAtlas) -> TextureAtlas:
    return TextureAtlas(
        *[None if x is None else jnp.asarray(x) for x in atlas])
