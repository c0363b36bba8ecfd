"""Vectorized math foundation (reference crates/rfw-math — glam re-export + SIMD).

The reference leans on glam Vec3/Mat4 + hand-rolled SSE (rfw-math/src/lib.rs:1-33);
on TPU everything is batched numpy/jnp, so this module provides *batch-first*
transform, quaternion, and AABB helpers shared by the host scene layer and the
device render layer. All functions take numpy arrays and broadcast over
leading axes.
"""

from rfw_tpu.mathx.transform import (
    compose_trs,
    look_at_rh,
    mat4_identity,
    normalize,
    orthographic_rh,
    perspective_rh,
    quat_identity,
    quat_mul,
    quat_normalize,
    quat_slerp,
    quat_to_mat3,
    transform_points,
    transform_vectors,
    inverse_transpose3,
)
from rfw_tpu.mathx.aabb import Aabb, aabb_empty, aabb_from_points, aabb_transform, aabb_union
