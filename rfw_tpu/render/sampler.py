"""Low-discrepancy sampling: Owen-scrambled Sobol (0,2)-sequence.

Parity with the reference's blue-noise/Sobol sampler (gpu-rt blue_noise.rs
+ blueNoiseSampler in ray_gen.comp/shade.comp): instead of shipping 41k
lines of scrambling tables, the TPU rebuild generates Owen-scrambled Sobol
points in registers (Laine-Karras hash) — fully vectorized uint32 math,
no tables, no HBM.

Scheme ("padded Sobol"): every logical 2-D sample slot (pixel jitter, lens,
light pick, BSDF, ...) uses the first two Sobol dimensions with an Owen
scramble seeded by hash(pixel, slot) — stratified within each slot,
decorrelated across slots and pixels.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

U32 = jnp.uint32


def _hash_u32(x: jax.Array) -> jax.Array:
    """Finalizer-style integer hash (xxhash/murmur-like avalanche)."""
    x = x.astype(U32)
    x ^= x >> 16
    x = x * U32(0x7FEB352D)
    x ^= x >> 15
    x = x * U32(0x846CA68B)
    x ^= x >> 16
    return x


def _reverse_bits(x: jax.Array) -> jax.Array:
    x = x.astype(U32)
    x = ((x & U32(0x55555555)) << 1) | ((x >> 1) & U32(0x55555555))
    x = ((x & U32(0x33333333)) << 2) | ((x >> 2) & U32(0x33333333))
    x = ((x & U32(0x0F0F0F0F)) << 4) | ((x >> 4) & U32(0x0F0F0F0F))
    x = ((x & U32(0x00FF00FF)) << 8) | ((x >> 8) & U32(0x00FF00FF))
    return (x << 16) | (x >> 16)


def _laine_karras(x: jax.Array, seed: jax.Array) -> jax.Array:
    """Laine-Karras hash: a random Owen permutation of the bit tree."""
    x = x.astype(U32) + seed.astype(U32)
    x ^= x * U32(0x6C50B47C)
    x ^= x * U32(0xB82F1E52)
    x ^= x * U32(0xC7AFE638)
    x ^= x * U32(0x8D22F6E6)
    return x


def _owen_scramble(x: jax.Array, seed: jax.Array) -> jax.Array:
    return _reverse_bits(_laine_karras(_reverse_bits(x), seed))


def _sobol_dim1(index: jax.Array) -> jax.Array:
    """Second Sobol dimension via its generator matrix (first is van der
    Corput = bit reversal). Direction numbers v_j = pattern of the standard
    d=2 Sobol matrix, computed on the fly."""
    index = index.astype(U32)
    result = jnp.zeros_like(index)
    v = U32(1 << 31)
    for j in range(32):
        bit = (index >> j) & U32(1)
        result = jnp.where(bit == 1, result ^ v, result)
        v = v ^ (v >> 1)
    return result


def sobol2d(index: jax.Array, scramble_seed: jax.Array):
    """Owen-scrambled (0,2)-sequence point for `index` (uint32).

    index/scramble_seed broadcast; returns (u0, u1) floats in [0,1)."""
    index = index.astype(U32)
    # scramble the index itself (decorrelates pixels without losing the
    # (0,2) stratification property), then the two outputs independently
    idx = _owen_scramble(index, _hash_u32(scramble_seed))
    d0 = _reverse_bits(idx)
    d1 = _sobol_dim1(idx)
    d0 = _owen_scramble(d0, _hash_u32(scramble_seed ^ U32(0x68BC21EB)))
    d1 = _owen_scramble(d1, _hash_u32(scramble_seed ^ U32(0x02E5BE93)))
    scale = jnp.float32(1.0 / 4294967296.0)
    return d0.astype(jnp.float32) * scale, d1.astype(jnp.float32) * scale


def sample_slot(
    sample_index: jax.Array,  # () or (R,) uint32 — progressive spp index
    pixel_id: jax.Array,  # (R,) int32
    slot,  # logical dimension-pair id (static int or traced scalar)
    n: int = 2,  # 2 or 3 uniforms
) -> jax.Array:
    """(R, n) low-discrepancy uniforms for one use-site ("slot")."""
    slot_u = jnp.asarray(slot).astype(U32) * U32(0x85EBCA6B)
    seed = _hash_u32(pixel_id.astype(U32) * U32(0x9E3779B9) + slot_u)
    u0, u1 = sobol2d(jnp.broadcast_to(sample_index, pixel_id.shape), seed)
    if n == 2:
        return jnp.stack([u0, u1], axis=-1)
    # third uniform from a scrambled vdC of a re-hashed seed (padding dim)
    idx = _owen_scramble(
        jnp.broadcast_to(sample_index, pixel_id.shape).astype(U32),
        _hash_u32(seed ^ U32(0x94D049BB)),
    )
    u2 = _reverse_bits(idx).astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)
    return jnp.stack([u0, u1, u2], axis=-1)
