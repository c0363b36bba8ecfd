"""On-device LBVH builder (JAX): Morton sort + Karras binary radix tree.

Replaces the reference's per-frame rtbvh SAH rebuilds for *dynamic* work —
TLAS over instance bounds every frame, and BLAS for skinned meshes — with a
fully data-parallel construction that runs under jit on TPU (reference
behavior being replaced: gpu-rt/src/lib.rs:1570-1581 TLAS
BVH::construct/MBVH::construct per synchronize).

Algorithm (all O(n log n), no sequential dependencies):
  1. quantize AABB centroids to a 30-bit Morton grid;
  2. sort (morton, index) — XLA radix sort via jnp.argsort;
  3. Karras 2012 binary radix tree: every internal node i in [0, n-2] is
     determined independently from common-prefix lengths of adjacent codes
     (vectorized binary searches, fixed trip counts);
  4. node AABBs via a sparse table (log n levels of windowed min/max) —
     every Karras node covers a *contiguous* sorted-leaf range, so its box
     is a range min/max query, computable without any bottom-up sweep or
     atomics (the TPU answer to Karras's atomic parent walks).

Output uses the same flat SoA node schema as accel.bvh_cpu.BvhNodes:
internal nodes occupy [0, n-2], leaf j sits at index (n-1) + j with
node_left = j (position in sorted order), prim_order = the Morton sort
permutation. For n == 1 a single-leaf root is emitted.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DeviceBvh(NamedTuple):
    """Device-side flat BVH (same schema as accel.bvh_cpu.BvhNodes)."""

    node_min: jax.Array  # (N,3) f32
    node_max: jax.Array  # (N,3) f32
    node_left: jax.Array  # (N,) i32
    node_right: jax.Array  # (N,) i32
    node_count: jax.Array  # (N,) i32
    prim_order: jax.Array  # (P,) i32


def _expand_bits(v: jax.Array) -> jax.Array:
    """Spread 10 bits over 30 (standard Morton magic)."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(centroids: jax.Array, scene_min: jax.Array, scene_max: jax.Array) -> jax.Array:
    """(n,3) centroids -> (n,) uint32 30-bit Morton codes."""
    return morton_codes_c(
        (centroids[:, 0], centroids[:, 1], centroids[:, 2]),
        scene_min, scene_max)


def morton_codes_c(c, scene_min: jax.Array, scene_max: jax.Array) -> jax.Array:
    """Component-form morton_codes: c is an (x, y, z) tuple of (n,) arrays
    (full-lane VPU vectors — see disney.py LAYOUT note)."""
    extent = jnp.maximum(scene_max - scene_min, 1e-9)
    q = [
        jnp.clip((c[j] - scene_min[j]) / extent[j] * 1024.0, 0.0, 1023.0
                 ).astype(jnp.uint32)
        for j in range(3)
    ]
    return (_expand_bits(q[0]) << 2) | (_expand_bits(q[1]) << 1) | _expand_bits(q[2])


def _clz32(x: jax.Array) -> jax.Array:
    """Vectorized count-leading-zeros for uint32 (32 for x == 0)."""
    x = x.astype(jnp.uint32)
    n = jnp.full(x.shape, 0, jnp.int32)
    for shift in (16, 8, 4, 2, 1):
        y = x >> shift
        big = y != 0
        n = jnp.where(big, n, n + shift)
        x = jnp.where(big, y, x)
    # here x in {0,1}; if original was 0, x==0 -> count is 32
    return jnp.where(x == 0, jnp.int32(32), n)


def build_lbvh_device(
    aabb_min: jax.Array, aabb_max: jax.Array
) -> DeviceBvh:
    """Build an LBVH from per-primitive AABBs, entirely on device.

    Shapes are static (n primitives); jit-compatible. Degenerate/duplicate
    Morton codes are broken by index (delta falls through to index bits).
    """
    n = aabb_min.shape[0]
    if n == 0:
        z3 = jnp.zeros((1, 3), jnp.float32)
        zi = jnp.zeros((1,), jnp.int32)
        return DeviceBvh(z3, z3, zi, zi, zi, jnp.zeros((0,), jnp.int32))
    if n == 1:
        return DeviceBvh(
            aabb_min[:1], aabb_max[:1],
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
            jnp.ones((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        )

    centroids = 0.5 * (aabb_min + aabb_max)
    scene_min = jnp.min(aabb_min, axis=0)
    scene_max = jnp.max(aabb_max, axis=0)
    codes = morton_codes(centroids, scene_min, scene_max)
    order = jnp.argsort(codes).astype(jnp.int32)
    sorted_codes = codes[order]

    idx32 = jnp.arange(n, dtype=jnp.uint32)

    def delta(i: jax.Array, j: jax.Array) -> jax.Array:
        """Common-prefix length of keys (code, index) at i, j; -1 out of range."""
        valid = (j >= 0) & (j < n)
        jc = jnp.clip(j, 0, n - 1)
        ci = sorted_codes[i]
        cj = sorted_codes[jc]
        same = ci == cj
        d = jnp.where(same, 32 + _clz32(idx32[i] ^ idx32[jc]), _clz32(ci ^ cj))
        return jnp.where(valid, d, jnp.int32(-1))

    i = jnp.arange(n - 1, dtype=jnp.int32)

    # --- Karras: direction + range end -------------------------------------
    d_right = delta(i, i + 1)
    d_left = delta(i, i - 1)
    d = jnp.where(d_right > d_left, jnp.int32(1), jnp.int32(-1))
    delta_min = delta(i, i - d)

    # exponential upper bound for the range length
    def grow(carry):
        lmax, cont = carry
        nxt = lmax * 2
        more = delta(i, i + nxt * d) > delta_min
        return (jnp.where(more & cont, nxt, lmax), more & cont)

    lmax = jnp.full(n - 1, 2, jnp.int32)
    cont = delta(i, i + 2 * d) > delta_min
    # 32 doublings cover n < 2^32
    for _ in range(31):
        lmax, cont = grow((lmax, cont))

    # binary search for exact length
    def shrink(carry, t):
        l, step = carry
        step = jnp.maximum(step // 2, 1)
        ok = delta(i, i + (l + step) * d) > delta_min
        l = jnp.where(ok, l + step, l)
        return (l, step), None

    l0 = jnp.zeros(n - 1, jnp.int32)
    (l, _), _ = jax.lax.scan(shrink, (l0, lmax), None, length=33)
    j = i + l * d  # other end of the range

    # --- split position ----------------------------------------------------
    delta_node = delta(i, j)

    def find_split(carry, t):
        s, step = carry
        step = (step + 1) // 2
        ok = delta(i, i + (s + step) * d) > delta_node
        s = jnp.where((s + step < l) & ok, s + step, s)
        return (s, step), None

    (s, _), _ = jax.lax.scan(find_split, (jnp.zeros(n - 1, jnp.int32), l), None, length=33)
    gamma = i + s * d + jnp.minimum(d, 0)  # split index: left range ends at gamma

    left_range = jnp.minimum(i, j)
    right_range = jnp.maximum(i, j)
    # children: leaf if the child range is a single element
    leaf_base = n - 1
    left_is_leaf = left_range == gamma
    right_is_leaf = right_range == gamma + 1
    node_left = jnp.where(left_is_leaf, leaf_base + gamma, gamma).astype(jnp.int32)
    node_right = jnp.where(right_is_leaf, leaf_base + gamma + 1, gamma + 1).astype(jnp.int32)

    # --- AABBs via sparse-table range min/max ------------------------------
    leaf_min = aabb_min[order]
    leaf_max = aabb_max[order]
    levels = max(1, (n - 1).bit_length())
    tbl_min = [leaf_min]
    tbl_max = [leaf_max]
    for k in range(1, levels):
        half = 1 << (k - 1)
        prev_min, prev_max = tbl_min[-1], tbl_max[-1]
        # windowed combine; rows past the end just repeat (harmless)
        shifted_min = jnp.concatenate([prev_min[half:], prev_min[-half:]], axis=0)
        shifted_max = jnp.concatenate([prev_max[half:], prev_max[-half:]], axis=0)
        tbl_min.append(jnp.minimum(prev_min, shifted_min))
        tbl_max.append(jnp.maximum(prev_max, shifted_max))
    tbl_min = jnp.stack(tbl_min)  # (L, n, 3)
    tbl_max = jnp.stack(tbl_max)

    length = right_range - left_range + 1
    # floor(log2(length)) exactly via frexp: x = m * 2^e, m in [0.5,1)
    _, e = jnp.frexp(length.astype(jnp.float32))
    k = (e - 1).astype(jnp.int32)
    second = right_range - (1 << k) + 1
    in_min = jnp.minimum(tbl_min[k, left_range], tbl_min[k, second])
    in_max = jnp.maximum(tbl_max[k, left_range], tbl_max[k, second])

    # --- assemble flat arrays ----------------------------------------------
    node_min = jnp.concatenate([in_min, leaf_min], axis=0)
    node_max = jnp.concatenate([in_max, leaf_max], axis=0)
    all_left = jnp.concatenate([node_left, jnp.arange(n, dtype=jnp.int32)])
    all_right = jnp.concatenate([node_right, jnp.zeros(n, jnp.int32)])
    all_count = jnp.concatenate([jnp.zeros(n - 1, jnp.int32), jnp.ones(n, jnp.int32)])
    return DeviceBvh(node_min, node_max, all_left, all_right, all_count, order)
