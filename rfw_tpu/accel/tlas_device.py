"""Device-side TLAS: a complete 8-ary morton-ordered tree, built in pure
jnp under jit — the per-frame dynamic-TLAS path for moving instances.

The host path (pack.repack_instances) runs a binned-SAH build + 8-wide
collapse per frame; fine for hundreds of instances, O(I log I) host time +
upload for 10k+ (reference gpu-rt rebuilds only the TLAS per synchronize,
lib.rs:1570-1581). Here the tree TOPOLOGY is fixed (a complete 8-ary tree
over the morton-sorted instance order, instances padded to a power of 8),
so the whole build is sort + segmented min/max reductions — no
data-dependent control flow, everything static-shaped, jit/pjit friendly.
Quality is slightly below SAH (no adaptive splits) but the supernode
visits it costs are paid on the wide, latency-tolerant TLAS top levels.

Output matches the wide8 supernode encoding the Pallas kernel consumes
(render/pack.build_wide8 / ops/traverse docstring):
  box (S,48): child c sublanes 6c..6c+5 = min3|max3 (+inf/-inf = never hit)
  code (S,8): >= 0 internal child node index (TLAS-local), < 0 leaf with
              instance id = -code-1
  cnt  (S,8): leaf instance count (1 for real leaves, 0 padding)
Root is node 0 (prepare_pallas_scene rebases TLAS codes by the BLAS node
count and enters at tlas_root = nb8 + 0).

Cited reference behavior: per-frame TLAS-only refit from transformed
instance bounds, backends/gpu-rt/src/lib.rs:1345-1384,1570-1581.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from rfw_tpu.accel.lbvh import morton_codes

_INF = jnp.float32(jnp.inf)


def _pow8_at_least(n: int) -> int:
    p = 1
    while p < n:
        p *= 8
    return max(p, 8)


@functools.partial(jax.jit, static_argnames=("pad_nodes",))
def build_tlas8_device(
    inst_matrix: jax.Array,  # (I,4,4) object->world
    local_min: jax.Array,  # (I,3) per-instance mesh AABB
    local_max: jax.Array,  # (I,3)
    pad_nodes: int = 0,  # pad the node arrays to this many rows (0 = exact)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(I) instances -> (S,48) box, (S,8) code, (S,8) cnt on device."""
    I = inst_matrix.shape[0]
    P = _pow8_at_least(I)

    # world AABBs of the 8 transformed corners (jnp clone of
    # mathx.aabb_transform, which is numpy/host)
    corners = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.where(bit & 1, local_max[:, 0], local_min[:, 0]),
                    jnp.where(bit & 2, local_max[:, 1], local_min[:, 1]),
                    jnp.where(bit & 4, local_max[:, 2], local_min[:, 2]),
                ],
                axis=-1,
            )
            for bit in range(8)
        ],
        axis=1,
    )  # (I,8,3)
    wc = (
        jnp.einsum("iab,icb->ica", inst_matrix[:, :3, :3], corners)
        + inst_matrix[:, None, :3, 3]
    )
    wmin = wc.min(axis=1)
    wmax = wc.max(axis=1)

    # morton order over centroids
    centroid = 0.5 * (wmin + wmax)
    scene_min = wmin.min(axis=0)
    scene_max = wmax.max(axis=0)
    codes = morton_codes(centroid, scene_min, scene_max)
    order = jnp.argsort(codes).astype(jnp.int32)  # (I,)

    # pad to a power of 8 with never-hit leaves
    pad = P - I
    inst_sorted = jnp.concatenate([order, jnp.full((pad,), -1, jnp.int32)])
    lmin = jnp.concatenate([wmin[order], jnp.full((pad, 3), _INF)])
    lmax = jnp.concatenate([wmax[order], jnp.full((pad, 3), -_INF)])

    # bottom-up complete 8-ary levels. Level sizes P/8, P/64, ..., 1.
    # Node array is level-order with the ROOT FIRST: offsets of level l
    # (root = level 0) are cumulative sums of 8^l.
    sizes = []
    s = P // 8
    while s >= 1:
        sizes.append(s)
        s //= 8
    sizes = sizes[::-1]  # [1, 8, ..., P/8]
    offsets = [0]
    for s in sizes[:-1]:
        offsets.append(offsets[-1] + s)
    n_nodes = sum(sizes)

    boxes = jnp.zeros((n_nodes, 48), jnp.float32)
    codes8 = jnp.full((n_nodes, 8), -1, jnp.int32)
    cnts = jnp.zeros((n_nodes, 8), jnp.int32)

    # deepest internal level: children are instance leaves
    deep_off = offsets[-1]
    deep_n = sizes[-1]
    ch_min = lmin.reshape(deep_n, 8, 3)
    ch_max = lmax.reshape(deep_n, 8, 3)
    box_rows = jnp.concatenate([ch_min, ch_max], axis=-1).reshape(deep_n, 48)
    leaf_inst = inst_sorted.reshape(deep_n, 8)
    code_rows = jnp.where(leaf_inst >= 0, -(leaf_inst + 1), -1)
    cnt_rows = (leaf_inst >= 0).astype(jnp.int32)
    boxes = boxes.at[deep_off:deep_off + deep_n].set(box_rows)
    codes8 = codes8.at[deep_off:deep_off + deep_n].set(code_rows)
    cnts = cnts.at[deep_off:deep_off + deep_n].set(cnt_rows)

    # interior levels: children are the 8 nodes of the level below
    nmin = ch_min.min(axis=1)  # (deep_n,3) per deepest-level node
    nmax = jnp.where(
        (cnt_rows.sum(axis=1) > 0)[:, None], ch_max.max(axis=1), -_INF
    )
    nmin = jnp.where((cnt_rows.sum(axis=1) > 0)[:, None], nmin, _INF)
    child_off = deep_off
    for li in range(len(sizes) - 2, -1, -1):
        off = offsets[li]
        n = sizes[li]
        cm = nmin.reshape(n, 8, 3)
        cx = nmax.reshape(n, 8, 3)
        boxes = boxes.at[off:off + n].set(
            jnp.concatenate([cm, cx], axis=-1).reshape(n, 48))
        child_ids = child_off + jnp.arange(n * 8, dtype=jnp.int32).reshape(n, 8)
        # empty children keep code -1 (their +inf boxes never pass the
        # slab test, so the kernel never dereferences them)
        live = (cx[:, :, 0] > -_INF)
        codes8 = codes8.at[off:off + n].set(jnp.where(live, child_ids, -1))
        cnts = cnts.at[off:off + n].set(jnp.zeros((n, 8), jnp.int32))
        nmin = jnp.where(live.any(axis=1)[:, None], cm.min(axis=1), _INF)
        nmax = jnp.where(live.any(axis=1)[:, None], cx.max(axis=1), -_INF)
        child_off = off

    if pad_nodes and pad_nodes > n_nodes:
        extra = pad_nodes - n_nodes
        boxes = jnp.concatenate([boxes, jnp.full((extra, 48), _INF)])
        codes8 = jnp.concatenate([codes8, jnp.full((extra, 8), -1, jnp.int32)])
        cnts = jnp.concatenate([cnts, jnp.zeros((extra, 8), jnp.int32)])
    return boxes, codes8, cnts


def tlas8_node_count(n_instances: int) -> int:
    """Static node count build_tlas8_device will produce for I instances."""
    P = _pow8_at_least(n_instances)
    total, s = 0, P // 8
    while s >= 1:
        total += s
        s //= 8
    return total
