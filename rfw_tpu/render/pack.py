"""Flatten scene data into packed device arenas ("TraceScene").

The reference packs per-mesh BVH/triangle/prim-index arrays into single GPU
buffers with offset tables (gpu-rt/src/lib.rs:1387-1470 GPUMeshData, and the
wgpu VertexList arenas list.rs:35-243). The TPU layout goes one step
further: *all* cross-array offsets are pre-applied at pack time, so the
traversal kernels never consult an offset table —

  * BLAS child indices are rebased into one global node arena;
  * BLAS leaf `first` indices point into one global prim arena;
  * the prim arena stores *global* triangle ids;
  * TLAS leaves store instance ids.

Triangles are stored as (v0, e1, e2) ready for Moller-Trumbore, alongside
shading indices into a packed vertex arena.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from rfw_tpu.accel.bvh_cpu import BvhNodes, build_bvh_sah, triangle_aabbs
from rfw_tpu.mathx import Aabb, aabb_transform, inverse_transpose3
from rfw_tpu.models.mesh3d import Mesh3D


class TraceScene(NamedTuple):
    """Packed SoA arenas for two-level traversal. All numpy here; the
    backend device_puts the pytree once and updates slices on change."""

    # TLAS over instances
    tlas_min: np.ndarray  # (Nt,3)
    tlas_max: np.ndarray
    tlas_left: np.ndarray  # (Nt,)
    tlas_right: np.ndarray
    tlas_count: np.ndarray
    tlas_prim: np.ndarray  # (I,) instance ids

    # instances
    inst_matrix: np.ndarray  # (I,4,4) object->world
    inst_inv: np.ndarray  # (I,4,4) world->object
    inst_normal: np.ndarray  # (I,3,3) inverse-transpose for normals
    inst_mesh: np.ndarray  # (I,) mesh slot

    # BLAS node arena (offsets pre-applied)
    blas_min: np.ndarray  # (Nb,3)
    blas_max: np.ndarray
    blas_left: np.ndarray
    blas_right: np.ndarray
    blas_count: np.ndarray
    blas_root: np.ndarray  # (I,) root node index per *instance*

    # triangle arena
    tri_v0: np.ndarray  # (T,3)
    tri_e1: np.ndarray
    tri_e2: np.ndarray
    tri_i0: np.ndarray  # (T,) vertex arena indices
    tri_i1: np.ndarray
    tri_i2: np.ndarray
    tri_mat: np.ndarray  # (T,)
    tri_light: np.ndarray  # (T,)
    tri_mesh: np.ndarray  # (T,) owning mesh slot
    tri_lodf: np.ndarray  # (T,) sqrt(uv_area/world_area) — texture LOD factor
    #   (reference Mesh3D per-tri LOD, objects_3d/mod.rs:355-358)

    # vertex arena (shading attributes)
    vtx_normal: np.ndarray  # (V,3)
    vtx_uv: np.ndarray  # (V,2)
    vtx_tangent: np.ndarray  # (V,4)

    @property
    def num_instances(self) -> int:
        return self.inst_matrix.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.tri_v0.shape[0]


def _tri_lod_factor(mesh: Mesh3D, po: np.ndarray) -> np.ndarray:
    """Per-triangle sqrt(uv_area / world_area): multiplied by the ray
    footprint to pick a mip level (reference objects_3d/mod.rs:355-358)."""
    uv = mesh.uvs[mesh.indices[po]]  # (t,3,2)
    e1 = uv[:, 1] - uv[:, 0]
    e2 = uv[:, 2] - uv[:, 0]
    uv_area = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    v = mesh.positions[mesh.indices[po]]
    w_area = 0.5 * np.linalg.norm(np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1)
    return np.sqrt(uv_area / np.maximum(w_area, 1e-12)).astype(np.float32)


def pack_trace_scene(
    meshes: Sequence[Tuple[int, Mesh3D, Optional[BvhNodes]]],
    instances: Sequence[Tuple[int, np.ndarray]],
    deformed_positions: Optional[dict] = None,
) -> TraceScene:
    """Build a TraceScene.

    meshes: (mesh_slot, mesh, optional prebuilt BLAS) — BLAS built here if None.
    instances: (mesh_slot, (I,4,4) world matrices).
    deformed_positions: {mesh_slot: (V,3)} skinned vertex override (BLAS is
    then rebuilt for those meshes).
    """
    deformed_positions = deformed_positions or {}

    # ---- per-mesh: triangles + BLAS ---------------------------------------
    mesh_index = {}
    blas_arrays: List[BvhNodes] = []
    tri_chunks = []
    vtx_chunks = []
    node_offset = 0
    tri_offset = 0
    vtx_offset = 0
    mesh_info = {}  # slot -> (node_root, aabb_min, aabb_max)

    for slot, mesh, prebuilt in meshes:
        pos = deformed_positions.get(slot, mesh.positions)
        i0, i1, i2 = mesh.indices[:, 0], mesh.indices[:, 1], mesh.indices[:, 2]
        v0 = pos[i0]
        e1 = pos[i1] - v0
        e2 = pos[i2] - v0
        bvh = prebuilt
        if bvh is None or slot in deformed_positions:
            mn, mx = triangle_aabbs(v0, v0 + e1, v0 + e2)
            bvh = build_bvh_sah(mn, mx)

        # Rebase node child/leaf indices into global arenas.
        is_leaf = bvh.node_count > 0
        left = np.where(is_leaf, bvh.node_left + tri_offset, bvh.node_left + node_offset)
        right = np.where(is_leaf, 0, bvh.node_right + node_offset)
        blas_arrays.append(
            BvhNodes(bvh.node_min, bvh.node_max, left.astype(np.int32),
                     right.astype(np.int32), bvh.node_count, bvh.prim_order)
        )

        # Triangle arena in *BVH leaf order* (prim_order applied) so leaves
        # are contiguous and no extra indirection is needed at trace time.
        po = bvh.prim_order.astype(np.int64)
        tri_chunks.append(
            dict(
                v0=v0[po], e1=e1[po], e2=e2[po],
                i0=(i0[po] + vtx_offset).astype(np.int32),
                i1=(i1[po] + vtx_offset).astype(np.int32),
                i2=(i2[po] + vtx_offset).astype(np.int32),
                mat=mesh.tri_material[po],
                light=mesh.tri_light[po],
                mesh=np.full(len(po), slot, np.int32),
                lodf=_tri_lod_factor(mesh, po),
            )
        )
        vtx_chunks.append(
            dict(normal=mesh.normals, uv=mesh.uvs, tangent=mesh.tangents)
        )
        pos_mn = pos.min(axis=0) if len(pos) else np.zeros(3, np.float32)
        pos_mx = pos.max(axis=0) if len(pos) else np.zeros(3, np.float32)
        mesh_info[slot] = (node_offset, pos_mn.astype(np.float32), pos_mx.astype(np.float32))
        node_offset += bvh.num_nodes
        tri_offset += len(po)
        vtx_offset += pos.shape[0]

    def cat(key, chunks, default_shape, dtype):
        arrs = [c[key] for c in chunks]
        if not arrs:
            return np.zeros(default_shape, dtype)
        return np.ascontiguousarray(np.concatenate(arrs)).astype(dtype)

    blas_min = cat("node_min", [b.__dict__ for b in blas_arrays], (0, 3), np.float32)
    blas_max = cat("node_max", [b.__dict__ for b in blas_arrays], (0, 3), np.float32)
    blas_left = cat("node_left", [b.__dict__ for b in blas_arrays], (0,), np.int32)
    blas_right = cat("node_right", [b.__dict__ for b in blas_arrays], (0,), np.int32)
    blas_count = cat("node_count", [b.__dict__ for b in blas_arrays], (0,), np.int32)

    # ---- instances + TLAS --------------------------------------------------
    inst_matrix_list = []
    inst_mesh_list = []
    for slot, mats in instances:
        if slot not in mesh_info:
            continue
        mats = np.asarray(mats, np.float32).reshape(-1, 4, 4)
        inst_matrix_list.append(mats)
        inst_mesh_list.append(np.full(mats.shape[0], slot, np.int32))

    if inst_matrix_list:
        inst_matrix = np.concatenate(inst_matrix_list)
        inst_mesh = np.concatenate(inst_mesh_list)
    else:
        inst_matrix = np.zeros((0, 4, 4), np.float32)
        inst_mesh = np.zeros(0, np.int32)

    n_inst = inst_matrix.shape[0]
    inst_inv = (
        np.linalg.inv(inst_matrix).astype(np.float32)
        if n_inst
        else np.zeros((0, 4, 4), np.float32)
    )
    inst_normal = (
        inverse_transpose3(inst_matrix) if n_inst else np.zeros((0, 3, 3), np.float32)
    )
    blas_root = np.array(
        [mesh_info[m][0] for m in inst_mesh], np.int32
    ) if n_inst else np.zeros(0, np.int32)

    # world-space instance bounds for TLAS
    if n_inst:
        local_min = np.stack([mesh_info[m][1] for m in inst_mesh])
        local_max = np.stack([mesh_info[m][2] for m in inst_mesh])
        wb = aabb_transform(Aabb(local_min, local_max), inst_matrix)
        tlas = build_bvh_sah(wb.min, wb.max, max_leaf=1)
    else:
        tlas = build_bvh_sah(np.zeros((0, 3)), np.zeros((0, 3)))

    return TraceScene(
        tlas_min=tlas.node_min, tlas_max=tlas.node_max,
        tlas_left=tlas.node_left, tlas_right=tlas.node_right,
        tlas_count=tlas.node_count, tlas_prim=tlas.prim_order,
        inst_matrix=inst_matrix, inst_inv=inst_inv,
        inst_normal=inst_normal, inst_mesh=inst_mesh,
        blas_min=blas_min, blas_max=blas_max, blas_left=blas_left,
        blas_right=blas_right, blas_count=blas_count, blas_root=blas_root,
        tri_v0=cat("v0", tri_chunks, (0, 3), np.float32),
        tri_e1=cat("e1", tri_chunks, (0, 3), np.float32),
        tri_e2=cat("e2", tri_chunks, (0, 3), np.float32),
        tri_i0=cat("i0", tri_chunks, (0,), np.int32),
        tri_i1=cat("i1", tri_chunks, (0,), np.int32),
        tri_i2=cat("i2", tri_chunks, (0,), np.int32),
        tri_mat=cat("mat", tri_chunks, (0,), np.int32),
        tri_light=cat("light", tri_chunks, (0,), np.int32),
        tri_mesh=cat("mesh", tri_chunks, (0,), np.int32),
        tri_lodf=cat("lodf", tri_chunks, (0,), np.float32),
        vtx_normal=cat("normal", vtx_chunks, (0, 3), np.float32),
        vtx_uv=cat("uv", vtx_chunks, (0, 2), np.float32),
        vtx_tangent=cat("tangent", vtx_chunks, (0, 4), np.float32),
    )
