"""Wavefront path-tracing integrator (jnp, jit-compiled).

The TPU re-architecture of the reference's wavefront GPU path tracer
(backends/gpu-rt/src/lib.rs:1685-1780 render loop; shaders/shade.comp NEE+MIS;
ray_shadow.comp occlusion; blit.comp accumulate):

  * The reference's 5 compute pipelines + atomic queue counters + GPU->CPU
    readback per bounce collapse into ONE fused XLA program with a peeled
    vertex structure: vertex 0 (coherent classic trace, full front, AOV
    capture), middle vertices in one `lax.fori_loop` (single traversal
    instance — compile time stays flat in bounce count), and a peeled
    FINAL vertex that never samples the BSDF. No host round trips (the
    single readback the reference needs at lib.rs:1709-1729 does not
    exist here).
  * The reference's queue compaction (GPU atomics) becomes the sorted
    live-prefix: every bounce vertex re-sorts lanes (dead last), then
    dispatches its ENTIRE pipeline on the smallest of a few static prefix
    lengths covering the live count (`lax.switch` — only that branch
    executes). Dead lanes cost nothing; static shapes are preserved.
  * Progressive accumulation: render_sample() returns one spp; the film
    (rfw_tpu.render.film) accumulates across calls like the reference's
    sample_count blit.

Light strategy: next-event estimation at every path vertex. Small light
sets use the reference's potential-weighted pick (shade.comp:283-470)
re-designed for the unified light table (static row slices, exact
per-lane pick pdf, centroid-anchored MIS reconstruction); large sets use
a global power CDF. Balance-heuristic MIS against BSDF sampling for area
lights (delta lights get no MIS).
"""

from __future__ import annotations

import functools
import os as _os
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rfw_tpu.render import disney
from rfw_tpu.render.disney import (
    Vec3C, _luminance_c, v3_add, v3_cross, v3_dot, v3_mul, v3_neg,
    v3_normalize, v3_scale, v3_split, v3_stack, v3_sub, v3_where,
)
from rfw_tpu.render.atlas import TextureAtlas, sample_bilinear
from rfw_tpu.render.intersect import Hit, T_MAX, bvh_closest_hit, bvh_occluded
from rfw_tpu.render.lights_pack import DeviceLights
from rfw_tpu.render.sampler import sample_slot
from rfw_tpu.accel.lbvh import morton_codes_c
from rfw_tpu.render.packet import (
    packet_closest_hit,
    packet_occluded,
    prepare_packet_scene,
)
from rfw_tpu.ops.traverse import (
    LANES8 as PALLAS_LANES,
    VMEM_RESIDENT_BUDGET,
    VMEM_SCENE_BUDGET,
    pallas_closest_hit,
    pallas_occluded,
    pallas_resident_bytes,
    pallas_scene_bytes,
    prepare_pallas_scene,
)


def _block_swizzle(width: int, height: int, lanes: int):
    """Permutation mapping swizzled ray order -> linear pixel index, so
    each packet tile covers a coherent (BY x 32) pixel block. Returns
    (px, py, inv_perm) or None when dimensions don't block-align."""
    for bx in (32, 64, 128, 16):
        by = lanes // bx
        if by and lanes % bx == 0 and width % bx == 0 and height % by == 0:
            break
    else:
        return None
    n = width * height
    s = jnp.arange(n, dtype=jnp.int32)
    nbx = width // bx
    block, off = s // lanes, s % lanes
    iby, ibx = off // bx, off % bx
    gby, gbx = block // nbx, block % nbx
    px = gbx * bx + ibx
    py = gby * by + iby
    lin = py * width + px
    inv = jnp.argsort(lin).astype(jnp.int32)
    return px, py, inv

PI = 3.14159265358979

#: secondary-ray sort key: True prepends the previous hit instance to the
#: (octant, origin-morton) key (A/B knob; see docs/ROUND2.md)
#: bounce-ray re-tiling key (see _sort_state): octmorton (direction-major,
#: the round-3 default), morton (origin-major), mortonoct (origin-major
#: w/ direction tiebreak), instance (previous-hit-instance-major).
#: RFW_SORT_INST=1 is the legacy alias for "instance".
SORT_KEY = _os.environ.get(
    "RFW_SORT_KEY",
    "instance" if _os.environ.get("RFW_SORT_INST", "0") == "1"
    else "octmorton")

#: table-row fetches ride the MXU as one-hot matmuls for tables in this
#: size band: gathers cost 14-25ns/row on this TPU, the matmul streams;
#: K <= 8 stays a gather (tiny-K dot_generals have miscompiled AND wedged
#: this toolchain), K > max would blow up the (R,K) one-hot operand.
ONEHOT_MIN = 8
ONEHOT_MAX = int(_os.environ.get("RFW_ONEHOT_MAX", "1024"))


def _fetch_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table[idx] for a (N,C) float table and (R,) int indices — the one
    shared gather/MXU crossover (lights, materials, instances)."""
    n = table.shape[0]
    if ONEHOT_MIN < n <= ONEHOT_MAX:
        onehot = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None]
                  ).astype(jnp.float32)
        return jax.lax.dot_general(
            onehot, table, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
    return table[idx]


@dataclass(frozen=True)
class RenderConfig:
    """Static integrator knobs (hashable — passed as a jit static arg).

    Defaults mirror the reference gpu-rt: 3-bounce cap (lib.rs:1709),
    radiance clamp 10.0 (shade.comp:204)."""

    max_bounces: int = 3
    clamp: float = 10.0
    sky_intensity: float = 0.0  # constant sky radiance multiplier
    shadow_eps: float = 1e-3
    aovs: bool = True
    ao_aov: bool = False  # ambient-occlusion AOV (RenderMode.SSAO): one
    #   cosine-hemisphere occlusion probe per first hit (reference ssao.comp)
    ao_radius: float = 0.5
    traversal: str = "auto"  # auto | pallas | pallas_hbm | packet | lockstep
    #   (pallas_hbm = per-tile kernel with the treelet arena streamed from
    #   HBM — auto picks it for scenes over the resident VMEM budget)
    lanes: int = 256  # packet tile width (rays per shared stack)
    pixel_center: bool = False  # deterministic pixel-center primaries (no
    #   AA jitter, no lens) — for AOV parity against CpuReferenceBackend
    sampler: str = "random"  # "random" (threefry) | "sobol" (Owen-scrambled;
    #   needs sample_index passed to render_sample)
    tex_mask: int = 15  # static bitmask of texture-map kinds PRESENT in the
    #   material set (1=diffuse 2=normal 4=metallic-roughness 8=emissive):
    #   absent kinds skip their atlas sampling entirely (each mip-fetch is
    #   4 texel-pool gathers ~25-50ms/2M rays). tex_kinds_mask() computes it.
    trilinear: bool = False  # two-mip blend (2 quad gathers vs 1)
    mat_features: int = 15  # static bitmask of BSDF lobes PRESENT in the
    #   material set (disney.FEAT_*: 1=transmission 2=clearcoat
    #   4=subsurface 8=sheen): absent lobes drop out of eval/pdf/sample
    #   and the Beer-Lambert segment entirely. mat_feature_mask() computes
    #   it from a DeviceMaterials.
    sort_secondary: bool = True  # re-tile rays each bounce by (direction
    #   octant, origin morton): secondary rays regain the coherence packet
    #   tiles need. Honest (materialized) timing shows ~2x end-to-end at
    #   1 bounce on v5e; an earlier "net negative" reading was a dispatch
    #   -timing artifact (block_until_ready does not block on this tunnel)
    two_phase: str = "auto"  # "auto" | "on" | "off": two-phase (treelet
    #   ray-binned) closest-hit for bounce rays — phase A enumerates each
    #   ray's K nearest TLAS instance entries, items sort by instance, and
    #   fixed-instance Pallas walks are coherent by construction (measured
    #   6x the classic kernel on pica bounce rays, docs/ROUND2.md). auto =
    #   on when the Pallas tier is selected. Truncated rays retrace through
    #   the classic kernel (exact-result contract).
    has_area_lights: bool = True  # static: the scene has registered area
    #   lights. False lets XLA drop the whole NEE<->BSDF MIS machinery
    #   (disney_pdf at every vertex + the hit-emitter pick-probability
    #   reconstruction) — with delta-only lights both weights are 1.
    #   Callers compute it from the packed lights (bench.py, TpuBackend).
    compaction: str = "auto"  # "auto" | "off": bounce vertices run their
    #   ENTIRE pipeline (trace + occlusion + shading) on the sorted live
    #   PREFIX at the smallest of a few static lengths >= the live count
    #   (lax.switch — only the chosen branch executes). Dead lanes sort to
    #   the back and cost nothing. Measured live fractions on the bench
    #   scene: 0.50 after the primaries, 0.36 after bounce 1.
    tp_K: int = 6  # phase-A entries kept per ray (mean real entries 1.09;
    #   K=6 vs 8 cuts entry traffic while keeping truncation ~0.07% on
    #   pica bounce rays; K=4 saved 20ms more but pushed truncation to 2%
    #   and the fallback retrace ate the saving)
    tp_items_per_ray: float = 1.25  # phase-B item capacity per ray (mean
    #   measured 1.09 on pica bounce rays; overflow -> fallback retrace)


class SampleResult(NamedTuple):
    radiance: jax.Array  # (R,3)
    albedo: jax.Array  # (R,3) first-hit albedo
    normal: jax.Array  # (R,3) first-hit shading normal
    depth: jax.Array  # (R,) first-hit t
    position: jax.Array  # (R,3) first-hit world pos
    ao: jax.Array  # (R,) ambient occlusion (1 = open) — only if config.ao_aov


# ------------------------------------------------------------------ camera
def camera_rays_c(
    view: jax.Array, width: int, height: int, key: jax.Array, pixel_ids=None,
    jitter=None,
) -> Tuple[Vec3C, Vec3C]:
    """Primary rays from the flattened CameraView3D (24,) vector
    (reference CameraView3D::generate_lens_ray, rfw-backend/src/structs.rs:
    585-640): dir = normalize(p1 + r*right + s*up - origin), origin jittered
    on the lens when lens_size > 0. Component form: returns (origin, dir)
    as (x, y, z) tuples of (R,) arrays."""
    pos = view[0:3]
    right = view[3:6]
    up = view[6:9]
    p1 = view[9:12]
    lens_size = view[15]
    inv_w = view[17]
    inv_h = view[18]

    n = width * height
    if pixel_ids is None:
        px = jnp.arange(n, dtype=jnp.int32) % width
        py = jnp.arange(n, dtype=jnp.int32) // width
    else:
        px, py = pixel_ids
    if jitter is None:
        k1, k2 = jax.random.split(key)
        jit_uv = jax.random.uniform(k1, (n, 2))
        lens_uv = jax.random.uniform(k2, (n, 2))
    else:
        jit_uv, lens_uv = jitter
    r = (px.astype(jnp.float32) + jit_uv[:, 0]) * inv_w
    s = (py.astype(jnp.float32) + jit_uv[:, 1]) * inv_h

    # 9-bladed aperture (reference CameraView3D::generate_lens_ray,
    # rfw-backend/src/structs.rs:518-540): pick a blade wedge, then sample
    # the triangle spanned by its two blade directions with the fold trick.
    # (The reference reuses the AA jitter uniform for the blade pick and
    # remaps its r2 accordingly; here the two lens uniforms stratify the
    # wedge + triangle cleanly — same aperture shape, lower correlation.)
    b9 = lens_uv[:, 0] * 9.0
    blade = jnp.floor(b9)
    r2 = b9 - blade  # wedge-local, re-stratified
    r3 = lens_uv[:, 1]
    fold = (r2 + r3) > 1.0
    r2 = jnp.where(fold, 1.0 - r2, r2)
    r3 = jnp.where(fold, 1.0 - r3, r3)
    a1 = blade * (PI / 4.5)
    a2 = (blade + 1.0) * (PI / 4.5)
    xr = (jnp.sin(a1) * r2 + jnp.sin(a2) * r3) * lens_size
    yr = (jnp.cos(a1) * r2 + jnp.cos(a2) * r3) * lens_size
    rn = right / jnp.maximum(jnp.linalg.norm(right), 1e-12)
    un = up / jnp.maximum(jnp.linalg.norm(up), 1e-12)
    o = tuple(pos[j] + xr * rn[j] + yr * un[j] for j in range(3))
    d = tuple(p1[j] + r * right[j] + s * up[j] - o[j] for j in range(3))
    d = v3_normalize(d)
    return (tuple(c.astype(jnp.float32) for c in o),
            tuple(c.astype(jnp.float32) for c in d))


def camera_rays(
    view: jax.Array, width: int, height: int, key: jax.Array, pixel_ids=None,
    jitter=None,
) -> Tuple[jax.Array, jax.Array]:
    """Batched (R,3) wrapper over camera_rays_c (tools/tests API)."""
    o, d = camera_rays_c(view, width, height, key, pixel_ids, jitter)
    return v3_stack(o), v3_stack(d)


# ------------------------------------------------------------------ lights

#: padded light-table row cap for the per-point potential-weighted pick
#: (each row adds an (R,) potential evaluation; above the cap the global
#: power CDF takes over — it scales to thousands of emissive triangles)
POTENTIAL_MAX = int(_os.environ.get("RFW_POTENTIAL_MAX", "16"))


def _light_potentials(lights: DeviceLights, p: Vec3C,
                      ns: Optional[Vec3C]) -> list:
    """Per-point unshadowed contribution estimate for every padded light
    row: a list of L (R,) arrays. The reference scores every light per
    shading point (shade.comp:283-365); this is that scoring with the TPU
    twist that the whole table is scored as ONE batched (L, R) program —
    (L, 1) row columns broadcast against the (R,) lane axis, so the lane
    (minor) dimension stays the full ray count and the traced program is
    FLAT in L. (Round 4's Python-unrolled per-row version made the
    16-light compile exceed a 40-minute budget on the remote toolchain —
    docs/ROUND4.md; this form compiles in ordinary time at any
    RFW_POTENTIAL_MAX, which is what made the crossover measurable.)
    Includes the surface cosine when `ns` is given — lights behind the
    shading point score ~0. Area rows anchor at the triangle centroid
    (the same anchor the emissive-hit MIS reconstruction can rebuild)."""
    np_, nsp, nd = lights.n_point[0], lights.n_spot[0], lights.n_dir[0]
    total = np_ + nsp + nd + lights.n_area[0]
    table = lights.light_table  # (L, 20)
    L = table.shape[0]
    idx = jnp.arange(L)
    is_point = (idx < np_)[:, None]                    # (L, 1)
    is_spot = (~is_point) & (idx < np_ + nsp)[:, None]
    is_dir = (~is_point) & (~is_spot) & (idx < np_ + nsp + nd)[:, None]
    is_area = (idx >= np_ + nsp + nd)[:, None]

    def col(j):
        return table[:, j:j + 1]  # (L, 1) static column slice — no gather

    lum_en = 0.2126 * col(6) + 0.7152 * col(7) + 0.0722 * col(8)
    lum_rad = 0.2126 * col(12) + 0.7152 * col(13) + 0.0722 * col(14)
    cen = tuple(
        jnp.where(is_area, (col(j) + col(3 + j) + col(6 + j)) / 3.0, col(j))
        for j in range(3))
    vec = tuple(cen[j] - p[j][None, :] for j in range(3))  # (L, R)
    d2 = jnp.maximum(
        vec[0] * vec[0] + vec[1] * vec[1] + vec[2] * vec[2], 1e-8)
    inv_d = 1.0 / jnp.sqrt(d2)
    wi = tuple(vec[j] * inv_d for j in range(3))
    # linear spot falloff (matches _sample_light's radiance formula)
    cos_to = -(wi[0] * col(3) + wi[1] * col(4) + wi[2] * col(5))
    falloff = jnp.clip((cos_to - col(16))
                       / jnp.maximum(col(15) - col(16), 1e-6), 0.0, 1.0)
    # emitter-side cosine for area rows
    cos_l = jnp.abs(wi[0] * col(9) + wi[1] * col(10) + wi[2] * col(11))
    q = jnp.where(
        is_point, lum_en / d2,
        jnp.where(
            is_spot, lum_en * falloff / d2,
            jnp.where(is_dir, jnp.broadcast_to(lum_en, d2.shape),
                      lum_rad * col(17) * cos_l / d2),
        ),
    )
    if ns is not None:
        # surface cosine sharpens the pick for DELTA rows only: area
        # rows must stay reconstructible at emissive-hit time from
        # quantities the next vertex can rebuild (centroid anchor, no
        # receiver normal), or the MIS weights stop partitioning unity
        wi_eff = tuple(
            jnp.where(is_dir, -col(3 + j), wi[j]) for j in range(3))
        cos_s = jnp.maximum(
            ns[0][None, :] * wi_eff[0] + ns[1][None, :] * wi_eff[1]
            + ns[2][None, :] * wi_eff[2], 0.0)
        q = q * jnp.where(is_area, 1.0, cos_s)
    q = jnp.where((idx < total)[:, None], q, 0.0)
    # static row slices keep _sample_light_c's sequential CDF walk (and
    # its summation order) bit-identical to the round-3/4 unrolled form
    return [q[i] for i in range(L)]


def _sample_light_c(
    lights: DeviceLights, p: Vec3C, u0: jax.Array, u1: jax.Array,
    u2: jax.Array, ns: Optional[Vec3C] = None,
) -> Tuple[Vec3C, jax.Array, Vec3C, jax.Array, jax.Array, jax.Array]:
    """Pick one light per lane; sample a point/direction toward it.

    Component form (the hot path): p/ns are (x,y,z) tuples of (R,) arrays,
    u0/u1/u2 are (R,) uniforms (pick, two area barycentrics). `ns` enables
    the per-point potential-weighted pick for small light sets — reference
    shade.comp:283-470; large sets use the global power CDF.
    Returns (wi, dist, radiance_over_pdf, is_delta, pdf_area_solidangle,
    pick_norm):
      radiance_over_pdf already includes the 1/pick_prob factor;
      pdf_area_solidangle is the solid-angle NEE pdf (for MIS, area only),
      including the pick probability;
      pick_norm is the per-lane potential normalization Z (0 on the
      power-CDF path) — carried so the emissive-hit MIS reconstruction
      can rebuild this vertex's pick probability at the next vertex.
    """
    np_, ns_l, nd, na = (
        lights.n_point[0], lights.n_spot[0], lights.n_dir[0], lights.n_area[0]
    )
    total = np_ + ns_l + nd + na
    R = p[0].shape[0]
    use_potential = lights.light_table.shape[0] <= POTENTIAL_MAX
    if use_potential:
        # list of L (R,) potential rows — never an (R,L) array whose minor
        # dim starves the 128-lane axis (see _light_potentials)
        qs = _light_potentials(lights, p, ns)
        z = qs[0]
        for q_i in qs[1:]:
            z = z + q_i
        n_f = jnp.maximum(total.astype(jnp.float32), 1.0)
        # defensive 50/50 blend with uniform, mirroring the global pick:
        # bounds 1/pick_p fireflies when the potential misjudges a light
        inv_z = jnp.where(z > 0, 0.5 / jnp.maximum(z, 1e-12), 0.0)
        half_u = 0.5 / n_f
        # _light_potentials already zeroes rows >= total; the uniform term
        # needs the same guard so invalid padded rows carry zero mass
        probs = [
            jnp.where(i < total, q_i * inv_z + half_u, 0.0)
            for i, q_i in enumerate(qs)
        ]
        # probs sum to 1 when Z > 0, to 0.5 on the all-zero-potential
        # degenerate (uniform-only term) — normalize by the actual total.
        # Running-sum CDF walk over the static row list: pick = #(rows
        # whose cdf the scaled uniform clears), picked prob selected in the
        # same pass — all full-lane (R,) ops, no stack/cumsum/gather.
        cdf_total = probs[0]
        for pr in probs[1:]:
            cdf_total = cdf_total + pr
        target = u0 * cdf_total
        run = jnp.zeros_like(target)
        count = jnp.zeros(R, jnp.int32)
        for pr in probs:
            run = run + pr
            count = count + (target > run).astype(jnp.int32)
        pick = jnp.minimum(count, jnp.maximum(total - 1, 0)).astype(jnp.int32)
        pick_pr = jnp.zeros_like(target)
        for i, pr in enumerate(probs):
            pick_pr = jnp.where(pick == i, pr, pick_pr)
        pick_p = jnp.maximum(
            pick_pr / jnp.maximum(cdf_total, 1e-12), 1e-12)
        pick_norm = z
    else:
        # power-proportional pick via the precomputed global cdf
        pick = jnp.minimum(
            jnp.searchsorted(lights.pick_cdf, u0, side="right"
                             ).astype(jnp.int32),
            jnp.maximum(total - 1, 0),
        )
        pick_norm = jnp.zeros(R, jnp.float32)

    # ONE fetch of the unified per-light record replaces ~16 per-type table
    # gathers (each 14-25ns/row on this TPU)
    row = _fetch_rows(lights.light_table, pick)  # (R,20)
    if not use_potential:
        pick_p = jnp.maximum(row[:, 18], 1e-12)
    r_pos = (row[:, 0], row[:, 1], row[:, 2])   # pos | v0
    r_dir = (row[:, 3], row[:, 4], row[:, 5])   # dir | v1
    r_en = (row[:, 6], row[:, 7], row[:, 8])    # energy | v2

    is_point = pick < np_
    is_spot = (~is_point) & (pick < np_ + ns_l)
    is_dir = (~is_point) & (~is_spot) & (pick < np_ + ns_l + nd)
    is_area = (~is_point) & (~is_spot) & (~is_dir)

    # ---- point -----------------------------------------------------------
    p_vec = v3_sub(r_pos, p)
    p_d2 = jnp.maximum(v3_dot(p_vec, p_vec), 1e-8)
    p_dist = jnp.sqrt(p_d2)
    p_wi = v3_scale(p_vec, 1.0 / p_dist)
    p_rad = v3_scale(r_en, 1.0 / p_d2)

    # ---- spot (shares p_vec/p_d2 with point: same origin column) ---------
    # LINEAR cone falloff clamp((cos-cos_outer)/(cos_inner-cos_outer),0,1)
    # — pinned to the reference (gpu-rt shade.comp:315-318 and wgpu
    # lighting.comp:109-122 both use it linearly; an earlier version
    # squared it)
    cos_to = -v3_dot(p_wi, r_dir)
    ci = row[:, 15]
    co = row[:, 16]
    falloff = jnp.clip((cos_to - co) / jnp.maximum(ci - co, 1e-6), 0.0, 1.0)
    s_rad = v3_scale(r_en, falloff / p_d2)

    # ---- directional -----------------------------------------------------
    d_wi = v3_neg(r_dir)
    d_rad = r_en

    # ---- area ------------------------------------------------------------
    su = jnp.sqrt(jnp.maximum(u1, 0.0))
    b0 = 1.0 - su
    b1 = u2 * su
    b2 = 1.0 - b0 - b1
    a_pt = tuple(
        r_pos[j] * b0 + r_dir[j] * b1 + r_en[j] * b2 for j in range(3))
    a_vec = v3_sub(a_pt, p)
    a_d2 = jnp.maximum(v3_dot(a_vec, a_vec), 1e-8)
    a_dist = jnp.sqrt(a_d2)
    a_wi = v3_scale(a_vec, 1.0 / a_dist)
    # two-sided emitters: |cos| (matches the extraction normal convention)
    n_a = (row[:, 9], row[:, 10], row[:, 11])
    cos_l = jnp.abs(v3_dot(a_wi, n_a))
    a_pdf_sa = a_d2 / jnp.maximum(cos_l * row[:, 17], 1e-8)
    a_rad = v3_scale((row[:, 12], row[:, 13], row[:, 14]),
                     1.0 / jnp.maximum(a_pdf_sa, 1e-8))

    wi = v3_where(is_point, p_wi,
                  v3_where(is_spot, p_wi, v3_where(is_dir, d_wi, a_wi)))
    dist = jnp.where(
        is_point | is_spot, p_dist, jnp.where(is_dir, T_MAX * 0.5, a_dist))
    rad_sel = v3_where(is_point, p_rad,
                       v3_where(is_spot, s_rad,
                                v3_where(is_dir, d_rad, a_rad)))
    none = total == 0
    scale = jnp.where(none, 0.0, 1.0 / pick_p)
    rad_over_pdf = v3_scale(rad_sel, scale)
    is_delta = is_point | is_spot | is_dir
    pdf_sa = jnp.where(is_area, a_pdf_sa * pick_p, 0.0)
    return wi, dist, rad_over_pdf, is_delta, pdf_sa, pick_norm


def _sample_light(
    lights: DeviceLights, p: jax.Array, u: jax.Array,
    ns: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batched (R,3) wrapper over _sample_light_c (tools/tests API)."""
    wi, dist, rop, is_delta, pdf_sa, pick_norm = _sample_light_c(
        lights, v3_split(p), u[:, 0], u[:, 1], u[:, 2],
        None if ns is None else v3_split(ns))
    return v3_stack(wi), dist, v3_stack(rop), is_delta, pdf_sa, pick_norm


# ---------------------------------------------------------------- materials
def tex_kinds_mask(tex_table) -> int:
    """Static RenderConfig.tex_mask for a materials tex table (N,6):
    which map kinds any material actually binds."""
    import numpy as _np

    t = _np.asarray(tex_table)
    if t.size == 0:
        return 0
    return int((1 * (t[:, 0] >= 0).any()) | (2 * (t[:, 1] >= 0).any())
               | (4 * (t[:, 2] >= 0).any()) | (8 * (t[:, 3] >= 0).any()))


def mat_feature_mask(mats) -> int:
    """Static RenderConfig.mat_features for a DeviceMaterials: which BSDF
    lobes any material actually drives (params columns: 1=subsurface,
    6=sheen, 8=clearcoat, 10=transmission — backend.structs order)."""
    import numpy as _np

    pr = _np.asarray(mats.params)
    if pr.size == 0:
        return 0
    return int((disney.FEAT_TRANSMISSION * (pr[:, 10] > 0).any())
               | (disney.FEAT_CLEARCOAT * (pr[:, 8] > 0).any())
               | (disney.FEAT_SUBSURFACE * (pr[:, 1] > 0).any())
               | (disney.FEAT_SHEEN * (pr[:, 6] > 0).any()))


def _fetch_material_c(
    mats, atlas: TextureAtlas, mat_id, uv_c, lod, entering,
    tex_mask: int = 15, trilinear: bool = False,
) -> Tuple[disney.MatParams, Vec3C, Vec3C, Vec3C, Vec3C]:
    """Gather material params + textures for hit prims. Component form:
    uv_c is a (u, v) pair of (R,) arrays; every color output is a Vec3C.

    Returns (params, emission_rgb, normal_map tangent-space, untextured
    emission, absorption_rgb). `mat_id` (R,) i32 comes decoded from the
    tri_shade record (pack.py lane 29) — no tri_mat gather. `entering`
    (R,) bool resolves the relative IOR side for the transmission lobe
    (True = front-face hit)."""
    # the WHOLE material record — float block + tex ids as exact f32 ints —
    # resolves in one fetch (one-hot MXU matmul for mid-size tables);
    # the separate tex-id gather cost another ~14-25ns/row
    cols = [mats.color, mats.params, mats.absorption[:, :3],
            mats.tex.astype(jnp.float32)]
    # texture metadata rides the SAME row (6 more matmul columns per BOUND
    # kind are ~free; kinds outside the static tex_mask are skipped): each
    # kind's (off0, w0, h0, mip_count, srgb) lands per-lane without its own
    # ~12ms/2M-ray metadata gather in sample_bilinear.
    # off0 can exceed f32's 2^24 exact-int range (the pool is row-indexed
    # but unbounded) so it travels as a 12-bit split (hi=off>>12, lo=off
    # &4095 — exact up to atlas.meta's int32 storage bound of 2^31 rows).
    carry_meta = atlas.meta is not None
    meta_base = {}
    if carry_meta:
        am = atlas.meta
        nb = 29
        for k in range(4):
            if not (tex_mask >> k) & 1:
                continue  # masked kind: never sampled, skip its columns
            mk = am[jnp.maximum(mats.tex[:, k], 0)]  # (M,8) tiny gather
            cols.append(jnp.stack([
                (mk[:, 0] >> 12).astype(jnp.float32),
                (mk[:, 0] & 4095).astype(jnp.float32),
                mk[:, 1].astype(jnp.float32),
                mk[:, 2].astype(jnp.float32),
                mk[:, 3].astype(jnp.float32),
                mk[:, 4].astype(jnp.float32),
            ], axis=1))
            meta_base[k] = nb
            nb += 6
    blk = _fetch_rows(jnp.concatenate(cols, axis=1), mat_id)
    # (R, 4+16+3+6 [+6*popcount(tex_mask)])
    color = (blk[:, 0], blk[:, 1], blk[:, 2])
    params = blk[:, 4:20]
    absorption = (blk[:, 20], blk[:, 21], blk[:, 22])
    tex = jnp.round(blk[:, 23:29]).astype(jnp.int32)

    def _meta_row(k):
        if k not in meta_base:
            return None
        b = meta_base[k]
        off0 = (jnp.round(blk[:, b]).astype(jnp.int32) << 12) | jnp.round(
            blk[:, b + 1]).astype(jnp.int32)
        w0 = jnp.round(blk[:, b + 2]).astype(jnp.int32)
        h0 = jnp.round(blk[:, b + 3]).astype(jnp.int32)
        mipc = jnp.round(blk[:, b + 4]).astype(jnp.int32)
        srgb_f = blk[:, b + 5] > 0.5
        return (off0, w0, h0, mipc, srgb_f)

    R = mat_id.shape[0]
    ones = jnp.ones(R, jnp.float32)
    zeros = jnp.zeros(R, jnp.float32)
    if tex_mask & 1:
        diff = sample_bilinear(atlas, tex[:, 0], uv_c, lod, trilinear,
                               meta_row=_meta_row(0))
        base_color = tuple(color[j] * diff[:, j] for j in range(3))
    else:
        base_color = color

    if tex_mask & 4:
        mr = sample_bilinear(atlas, tex[:, 2], uv_c, lod, trilinear,
                             meta_row=_meta_row(2))
        has_mr = tex[:, 2] >= 0
        metallic = jnp.where(has_mr, params[:, 0] * mr[:, 2], params[:, 0])
        roughness = jnp.where(has_mr, params[:, 3] * mr[:, 1], params[:, 3])
    else:
        metallic = params[:, 0]
        roughness = params[:, 3]

    if tex_mask & 2:
        nrm_tex = sample_bilinear(atlas, tex[:, 1], uv_c, lod, trilinear,
                                  meta_row=_meta_row(1))
        has_n = tex[:, 1] >= 0
        n_ts = tuple(
            jnp.where(has_n, nrm_tex[:, j] * 2.0 - 1.0,
                      ones if j == 2 else zeros)
            for j in range(3))
    else:
        n_ts = (zeros, zeros, ones)

    # emission: color channels > 1 mark emissive (reference list.rs:494)
    is_emissive = jnp.maximum(jnp.maximum(color[0], color[1]), color[2]) > 1.0
    # untextured emission — must match what area-light extraction registered
    # (scene/lights.py radiance_per_tri) so the reconstructed pick pdf agrees
    emission_base = tuple(
        jnp.where(is_emissive, color[j], 0.0) for j in range(3))
    if tex_mask & 8:
        emis_tex = sample_bilinear(atlas, tex[:, 3], uv_c, lod, trilinear,
                                   meta_row=_meta_row(3))
        emission = tuple(
            jnp.where(is_emissive, color[j] * emis_tex[:, j], 0.0)
            for j in range(3))
    else:
        emission = emission_base

    # transmission lobe side: relative IOR across the interface (reference
    # disney.glsl eta branch — 1/ior entering the medium, ior leaving)
    eta = jnp.where(params[:, 11] > 1e-3, params[:, 11], 1.5)
    eta_rel = jnp.where(entering, 1.0 / eta, eta)
    p = disney.MatParams(
        base_color=base_color,
        metallic=metallic,
        roughness=jnp.clip(roughness, 0.02, 1.0),
        specular_f=params[:, 2],
        specular_tint=params[:, 4],
        sheen=params[:, 6],
        sheen_tint=params[:, 7],
        clearcoat=params[:, 8],
        clearcoat_gloss=params[:, 9],
        subsurface=params[:, 1],
        anisotropic=params[:, 5],
        transmission=params[:, 10],
        eta_rel=eta_rel,
    )
    return p, emission, n_ts, emission_base, absorption


def _fetch_material(
    mats, atlas: TextureAtlas, mat_id, uv_interp, lod, entering,
    tex_mask: int = 15, trilinear: bool = False,
):
    """Batched (R,3) wrapper over _fetch_material_c (tools/tests API)."""
    uv_c = (uv_interp[:, 0], uv_interp[:, 1]) if not isinstance(
        uv_interp, tuple) else uv_interp
    p, emission, n_ts, emission_base, absorption = _fetch_material_c(
        mats, atlas, mat_id, uv_c, lod, entering, tex_mask, trilinear)
    p = p._replace(base_color=v3_stack(p.base_color))
    return (p, v3_stack(emission), v3_stack(n_ts), v3_stack(emission_base),
            v3_stack(absorption))


# -------------------------------------------------------------- integrator


def _mat3_apply(m: jax.Array, base: int, v: Vec3C) -> Vec3C:
    """Row-major 3x3 from columns [base:base+9] of an (R,K) fetch, applied
    to a component vector — nine full-lane multiply-adds (the einsum form
    kept the (R,3) minor dim on the 128-lane axis)."""
    return (
        m[:, base + 0] * v[0] + m[:, base + 1] * v[1] + m[:, base + 2] * v[2],
        m[:, base + 3] * v[0] + m[:, base + 4] * v[1] + m[:, base + 5] * v[2],
        m[:, base + 6] * v[0] + m[:, base + 7] * v[1] + m[:, base + 8] * v[2],
    )


def _shading_basis_c(scene, hit, ray_d: Vec3C) -> dict:
    """Interpolate shading attributes at hits. Component form: every
    3-vector entry is a Vec3C of (R,) arrays; uv is a (u, v) pair.

    One gather of the baked (T,32) tri_shade record replaces the ~12
    indirected vertex-attribute gathers (measured 215ms/bounce at 0.52M
    rays, co-dominant with traversal); instance matrices resolve via a
    one-hot matmul that rides the MXU."""
    prim = jnp.maximum(hit.prim, 0)
    inst = jnp.maximum(hit.inst, 0)
    w = 1.0 - hit.u - hit.v
    rec = scene.tri_shade[prim]  # (R,32) — the ONE geometry gather
    ns_obj = tuple(
        w * rec[:, j] + hit.u * rec[:, 3 + j] + hit.v * rec[:, 6 + j]
        for j in range(3))
    uv = tuple(
        w * rec[:, 9 + j] + hit.u * rec[:, 11 + j] + hit.v * rec[:, 13 + j]
        for j in range(2))
    tan_obj = (rec[:, 15], rec[:, 16], rec[:, 17])
    handed = rec[:, 18]
    e1_obj = (rec[:, 19], rec[:, 20], rec[:, 21])
    e2_obj = (rec[:, 22], rec[:, 23], rec[:, 24])
    lodf = rec[:, 25]
    centroid_obj = (rec[:, 26], rec[:, 27], rec[:, 28])
    mat_id = rec[:, 29].astype(jnp.int32)  # exact f32 ints (pack.py)
    light_id = rec[:, 30].astype(jnp.int32)

    n_inst = scene.inst_matrix.shape[0]
    m = _fetch_rows(
        jnp.concatenate(
            [scene.inst_normal.reshape(n_inst, 9),
             scene.inst_matrix[:, :3, :3].reshape(n_inst, 9),
             scene.inst_matrix[:, :3, 3]], axis=1),
        inst,
    )  # (R,21)
    ns = v3_normalize(_mat3_apply(m, 0, ns_obj))
    e1w = _mat3_apply(m, 9, e1_obj)
    e2w = _mat3_apply(m, 9, e2_obj)
    ng_raw = v3_cross(e1w, e2w)
    area2 = jnp.sqrt(jnp.maximum(v3_dot(ng_raw, ng_raw), 0.0))
    ng = v3_scale(ng_raw, 1.0 / jnp.maximum(area2, 1e-12))
    flip = v3_dot(ng, ray_d) > 0
    ng = v3_where(flip, v3_neg(ng), ng)
    ns = v3_where(v3_dot(ns, ng) < 0, v3_neg(ns), ns)

    tan = _mat3_apply(m, 9, tan_obj)
    tan = v3_sub(tan, v3_scale(ns, v3_dot(tan, ns)))
    tlen = jnp.sqrt(jnp.maximum(v3_dot(tan, tan), 0.0))
    t_fallback, _ = disney.build_tangent_frame_c(ns)
    tan = v3_where(tlen > 1e-6,
                   v3_scale(tan, 1.0 / jnp.maximum(tlen, 1e-12)), t_fallback)
    bitan = v3_scale(v3_cross(ns, tan), handed)
    centroid_w = v3_add(_mat3_apply(m, 9, centroid_obj),
                        (m[:, 18], m[:, 19], m[:, 20]))
    return dict(ns=ns, ng=ng, uv=uv, tan=tan, bitan=bitan,
                world_area=0.5 * area2, entering=~flip, lodf=lodf,
                centroid_w=centroid_w, mat_id=mat_id, light_id=light_id)


def _shading_basis(scene, hit, ray_d):
    """Batched (R,3) wrapper over _shading_basis_c (tools/tests API)."""
    b = _shading_basis_c(scene, hit, v3_split(ray_d))
    out = dict(b)
    for k in ("ns", "ng", "tan", "bitan", "centroid_w"):
        out[k] = v3_stack(b[k])
    out["uv"] = jnp.stack(b["uv"], axis=-1)
    return out


class _PathState(NamedTuple):
    """Per-lane path state carried between vertices. After the first bounce
    sort, lanes live in SORTED order (live prefix, dead suffix) — `pid`
    maps each lane back to its pixel (used for pixel-keyed Sobol slots and
    the final radiance unsort).

    COMPONENT layout: every 3-vector is a Vec3C tuple of (R,) arrays —
    full 128-lane math everywhere, and the per-bounce multi-operand sort
    consumes/produces the components directly (no split/stack round trip)."""

    radiance: Vec3C
    throughput: Vec3C
    alive: jax.Array
    spec_or_first: jax.Array
    prev_bsdf_pdf: jax.Array
    sort_hint: jax.Array  # previous bounce's hit instance (-1 first bounce):
    #   the strongest locality signal for re-tiling — rays leaving the same
    #   instance walk the same BLAS
    ray_o: Vec3C
    ray_d: Vec3C
    pid: jax.Array  # pixel linear index of this lane
    pick_norm: jax.Array  # previous vertex's light-potential normalization
    #   Z (0 on the power-CDF path) — the emissive-hit MIS reconstruction
    #   rebuilds that vertex's pick probability from it


def _prefix_sizes(R: int, g: int, max_bounces: int = 1) -> list:
    """Static live-prefix lengths for bounce-vertex compaction: multiples
    of the tile width g, ascending, last == R. Fractions bracket the
    measured live-fraction decay on the bench scene (0.50 after primaries,
    0.36 after bounce 1, decaying after). Deep-bounce configs (>= 3) add
    two sub-floor rungs: their tails decay well below the 18.75% floor
    and were paying the smallest prefix every vertex (round-3 verdict).
    Small ray counts (tests) get a single full-length branch — compaction
    needs scale to pay."""
    if R < 4 * g or R < 16384:
        return [R]
    fracs = (0.1875, 0.375, 0.5625, 1.0)
    if max_bounces >= 3 and _os.environ.get("RFW_DEEP_LADDER", "1") == "1":
        # RFW_DEEP_LADDER=0 is the measurement knob for the sub-floor
        # rungs' on-chip A/B (they are shapes, so this must be static)
        fracs = (0.046875, 0.09375) + fracs
    out = []
    for f in fracs:
        p = min(R, -(-int(R * f) // g) * g)
        if p not in out:
            out.append(p)
    return out


@functools.partial(jax.jit, static_argnames=("width", "height", "config"))
def render_sample(
    scene,  # TraceScene (device pytree)
    mats,  # DeviceMaterials (device pytree)
    atlas: TextureAtlas,  # device pytree
    lights: DeviceLights,  # device pytree
    view: jax.Array,  # (24,) camera vector
    key: jax.Array,
    width: int,
    height: int,
    config: RenderConfig = RenderConfig(),
    sky_tex: Optional[jax.Array] = None,  # (1,) i32 atlas texture id; <0/None = constant sky
    sample_index: Optional[jax.Array] = None,  # () uint32 progressive index (sobol)
    row0=0,  # first film row of this call's strip (int or traced scalar):
    #   `height` then counts the STRIP's rows while camera NDC / sobol
    #   pixel keys stay global — lets shard_map split the film across
    #   devices with per-shard render_sample calls (parallel.mesh)
) -> SampleResult:
    """Trace one sample per pixel; returns radiance + first-hit AOVs.

    Vertex structure (each path vertex = closest-hit + NEE + bounce):
      * vertex 0 is PEELED: primaries are coherent by block swizzle, trace
        on the classic kernel, full-front shading, AOV capture;
      * middle vertices (1..max_bounces-1) run in one fori_loop;
      * the FINAL vertex is peeled: NEE only — no BSDF sample, no
        continuation state (the reference evaluates the same structure
        implicitly via its depth check, gpu-rt lib.rs:1709);
      * every bounce vertex first re-sorts the state by (octant, origin
        morton) with dead lanes last, then — when compaction is on —
        dispatches trace+shade on the smallest static live-prefix length
        that covers the live count (lax.switch; only that branch runs).
    """
    R = width * height
    k_cam, k_loop = jax.random.split(key)

    # traversal backend selection: the Pallas per-tile kernel is fastest but
    # needs the whole scene VMEM-resident and ray counts in 1024-lane tiles;
    # jnp packet is the portable fallback; lockstep is the oracle tier.
    scene_bytes = pallas_scene_bytes(scene)
    mode = config.traversal
    if mode == "auto":
        on_tpu = jax.default_backend() != "cpu"
        if on_tpu and R % PALLAS_LANES == 0 and scene_bytes <= VMEM_SCENE_BUDGET:
            mode = "pallas"
        elif (on_tpu and R % PALLAS_LANES == 0
              and pallas_resident_bytes(scene) <= VMEM_RESIDENT_BUDGET):
            # scene too big for resident treelets, but the supernode/
            # instance arrays fit: stream treelet blocks from HBM per leaf
            # visit instead of dropping to the 6-10x slower packet tier
            mode = "pallas_hbm"
        else:
            mode = "packet"
    import logging as _logging

    _logging.getLogger("rfw_tpu.render").info(
        "traversal=%s scene_bytes=%.1fMB R=%d", mode, scene_bytes / 1e6, R
    )
    inv_perm = None
    pixel_ids = None
    tile_lanes = 0
    use_packet_tiles = mode in ("pallas", "pallas_hbm", "packet")
    if mode in ("pallas", "pallas_hbm") and R % PALLAS_LANES == 0:
        tri_hbm = mode == "pallas_hbm"
        tile_lanes = PALLAS_LANES
        sw = _block_swizzle(width, height, PALLAS_LANES)
        if sw is not None:
            px, py, inv_perm = sw
            pixel_ids = (px, py)
        # barrier: the prepared arrays are (rows, lanes) transposes of the
        # scene arenas; without it XLA may rematerialize the transposes
        # inside every traversal chunk step when render_sample is embedded
        # in a larger jit (observed 95x slowdown)
        pps = jax.lax.optimization_barrier(prepare_pallas_scene(scene))

        use_tp = config.two_phase in ("auto", "on")
        if _os.environ.get("RFW_TWO_PHASE") is not None:
            use_tp = _os.environ["RFW_TWO_PHASE"] == "1"

        def trace_coherent(o, d, tl):
            return pallas_closest_hit(pps, o, d, tl, tri_hbm=tri_hbm)

        if use_tp:
            from rfw_tpu.ops.traverse_items import (
                twophase_closest_with_fallback,
                twophase_occluded_with_fallback,
            )

            n_inst_static = scene.inst_matrix.shape[0]

            def trace_bounce(o, d, tl):
                # bounce rays are incoherent — the ray-binned two-phase
                # pipeline wins there (primaries stay on the classic
                # kernel: coherent camera rays trace near the per-step
                # floor while two-phase pays R-scaled glue regardless).
                # On the hbm tier the items kernel streams its treelet
                # blocks the same way the classic kernel does.
                return twophase_closest_with_fallback(
                    pps, o, d, tl, K=config.tp_K,
                    items_per_ray=config.tp_items_per_ray,
                    n_inst_static=n_inst_static, tri_hbm=tri_hbm)

            if _os.environ.get("RFW_TP_SHADOW", "0") == "1":
                # OFF by default since the round-4 e2e decision grid:
                # classic occluded (the strongest kernel tier, 36-41
                # Mrays/s coherent/sorted any-hit at SSUB=8) beats the
                # ray-binned items any-hit stack on bounce shadows —
                # RFW_TP_SHADOW=0 scored 9.10 vs the 8.86 same-session
                # anchor at 1080p (docs/ROUND4.md). The items any-hit
                # path stays available for A/B via RFW_TP_SHADOW=1.
                def trace_occluded_bounce(o, d, tl):
                    return twophase_occluded_with_fallback(
                        pps, o, d, tl, K=config.tp_K,
                        items_per_ray=config.tp_items_per_ray,
                        n_inst_static=n_inst_static, tri_hbm=tri_hbm)
            else:
                trace_occluded_bounce = None
        else:
            trace_bounce = trace_coherent
            trace_occluded_bounce = None

        def trace_occluded(o, d, tl):
            return pallas_occluded(pps, o, d, tl, tri_hbm=tri_hbm)
    elif mode in ("packet", "pallas", "pallas_hbm"):
        lanes = next(
            (l for l in (config.lanes, 512, 256, 128, 64, 32) if R % l == 0), 0
        )
        if lanes == 0:
            mode = "lockstep"
        else:
            tile_lanes = lanes
            sw = _block_swizzle(width, height, lanes)
            if sw is not None:
                px, py, inv_perm = sw
                pixel_ids = (px, py)
            ps = prepare_packet_scene(scene)

            def trace_coherent(o, d, tl):
                return packet_closest_hit(ps, o, d, tl, lanes=lanes)

            trace_bounce = trace_coherent
            trace_occluded_bounce = None

            def trace_occluded(o, d, tl):
                return packet_occluded(ps, o, d, tl, lanes=lanes)
    if mode == "lockstep":
        def trace_coherent(o, d, tl):
            return bvh_closest_hit(scene, o, d, tl)

        trace_bounce = trace_coherent
        trace_occluded_bounce = None

        def trace_occluded(o, d, tl):
            return bvh_occluded(scene, o, d, tl)

    use_sobol = config.sampler == "sobol" and sample_index is not None
    if not (isinstance(row0, int) and row0 == 0):
        # film-strip render (parallel.mesh.render_sharded_2d shards): this
        # call covers rows [row0, row0+height) of the FULL camera frame —
        # offset py so camera NDC, pixel-keyed sobol, and pid are global.
        # row0 may be traced (lax.axis_index inside shard_map).
        if pixel_ids is None:
            px = jnp.arange(R, dtype=jnp.int32) % width
            py = jnp.arange(R, dtype=jnp.int32) // width
        else:
            px, py = pixel_ids
        pixel_ids = (px, py + jnp.asarray(row0, jnp.int32))
    if pixel_ids is not None:
        pid = pixel_ids[1] * width + pixel_ids[0]
    else:
        pid = jnp.arange(R, dtype=jnp.int32)
    pid = pid.astype(jnp.int32)

    def uniforms(slot, nu, key_, pid_s):
        if use_sobol:
            return sample_slot(sample_index, pid_s, slot, nu)
        return jax.random.uniform(key_, (pid_s.shape[0], nu))

    if config.pixel_center:
        ray_o, ray_d = camera_rays_c(
            view, width, height, k_cam, pixel_ids,
            jitter=(jnp.full((R, 2), 0.5, jnp.float32),
                    jnp.zeros((R, 2), jnp.float32)),
        )
    elif use_sobol:
        cam_uv = uniforms(0, 2, None, pid)
        lens_uv = uniforms(1, 2, None, pid)
        ray_o, ray_d = camera_rays_c(view, width, height, k_cam, pixel_ids,
                                     jitter=(cam_uv, lens_uv))
    else:
        ray_o, ray_d = camera_rays_c(view, width, height, k_cam, pixel_ids)

    total_lights = (
        lights.n_point[0] + lights.n_spot[0] + lights.n_dir[0] + lights.n_area[0]
    )

    scene_mn = scene.tlas_min[0]
    scene_mx = scene.tlas_max[0]

    #: static: the light table is small enough for the per-point
    #: potential-weighted pick (the padded row count is a shape)
    use_potential_pick = lights.light_table.shape[0] <= POTENTIAL_MAX
    #: MIS reconstruction needs the carried potential normalization only
    #: when there are area lights AND the potential pick is active
    carry_mis = config.has_area_lights and use_potential_pick

    # ------------------------------------------------------------ shading
    def _sky(dirs: Vec3C) -> Vec3C:
        """Sky radiance per ray: constant, or equirectangular skybox
        (reference set_skybox). Component form."""
        n = dirs[0].shape[0]
        if sky_tex is not None:
            sky_u = jnp.arctan2(dirs[2], dirs[0]) / (2.0 * PI) + 0.5
            sky_v = jnp.arccos(jnp.clip(dirs[1], -1.0, 1.0)) / PI
            sky_rgb = sample_bilinear(
                atlas,
                jnp.broadcast_to(sky_tex, (n,)),
                (sky_u, sky_v),
                jnp.zeros(n),
            )
            return tuple(sky_rgb[:, j] * config.sky_intensity
                         for j in range(3))
        const = jnp.full(n, config.sky_intensity, jnp.float32)
        return (const, const, const)

    def shade_vertex(st: _PathState, hit, depth, kd, first: bool,
                     last: bool, add_sky: bool = True):
        """One path vertex on an n-lane front (n static per call site).
        Returns (new state, aovs dict | None). `depth` may be traced
        (middle vertices) — only Sobol slot arithmetic consumes it.
        add_sky=False when the caller already credited sky to misses
        (the compacted vertex 0 does it on the full front pre-sort).
        Everything runs COMPONENT-WISE ((R,) full-lane arrays)."""
        n = st.pid.shape[0]
        found = (hit.prim >= 0) & st.alive

        if add_sky:
            radiance = v3_where(
                st.alive & ~found,
                v3_add(st.radiance, v3_mul(st.throughput, _sky(st.ray_d))),
                st.radiance,
            )
        else:
            radiance = st.radiance

        # ---- shading point ----------------------------------------------
        basis = _shading_basis_c(scene, hit, st.ray_d)
        pos = v3_add(st.ray_o, v3_scale(st.ray_d, hit.t))
        lod_f = basis["lodf"]  # baked into the tri_shade record
        spread = view[16]
        footprint = hit.t * spread * lod_f * 1024.0
        lod = jnp.log2(jnp.maximum(footprint, 1e-6))
        params, emission, n_ts, emission_base, absorption = _fetch_material_c(
            mats, atlas, basis["mat_id"], basis["uv"], lod,
            basis["entering"], config.tex_mask, config.trilinear,
        )
        # Beer-Lambert: a backface hit on a transmissive material ends a
        # segment travelled INSIDE the medium — attenuate by the stored
        # absorption over the distance (reference DeviceMaterial absorption)
        if config.mat_features & disney.FEAT_TRANSMISSION:
            inside_seg = found & ~basis["entering"] & (params.transmission > 0)
            atten = tuple(jnp.exp(-absorption[j] * hit.t) for j in range(3))
            throughput0 = v3_where(inside_seg,
                                   v3_mul(st.throughput, atten),
                                   st.throughput)
        else:
            throughput0 = st.throughput
        ns = v3_normalize(tuple(
            n_ts[0] * basis["tan"][j] + n_ts[1] * basis["bitan"][j]
            + n_ts[2] * basis["ns"][j]
            for j in range(3)))

        # ---- AOVs (first hit only; statically absent when the consumer
        # only needs color — the reference's gpu-rt outputs color only) ----
        aovs = None
        zero = jnp.zeros(n, jnp.float32)
        if first and not config.aovs:
            aovs = dict(
                albedo=(zero, zero, zero),
                normal=(zero, zero, zero),
                depth=jnp.full(n, T_MAX, jnp.float32),
                position=(zero, zero, zero),
                ao=jnp.ones(n, jnp.float32),
            )
        elif first:
            aov_ao = jnp.ones(n, jnp.float32)
            if config.ao_aov:
                u_ao = uniforms(4, 3, jax.random.fold_in(kd, 7), st.pid)
                wi_ao = disney.to_world_c(
                    basis["tan"], basis["bitan"], basis["ns"],
                    disney._sample_cosine_c(u_ao[:, 0], u_ao[:, 1]),
                )
                occ_ao = trace_occluded(
                    v3_stack(v3_add(pos, v3_scale(basis["ng"],
                                                  config.shadow_eps))),
                    v3_stack(wi_ao),
                    config.ao_radius,
                )
                aov_ao = jnp.where(found & occ_ao, 0.0, aov_ao)
            base_c = params.base_c
            aovs = dict(
                albedo=tuple(jnp.where(found, base_c[j], 0.0)
                             for j in range(3)),
                normal=tuple(jnp.where(found, ns[j], 0.0) for j in range(3)),
                depth=jnp.where(found, hit.t, T_MAX),
                position=tuple(jnp.where(found, pos[j], 0.0)
                               for j in range(3)),
                ao=aov_ao,
            )

        # ---- emissive hits (MIS vs NEE) ---------------------------------
        # The NEE competitor only exists if this triangle is a *registered*
        # area light (tri_light back-write) — otherwise BSDF sampling is the
        # sole strategy and gets full weight. At the first vertex
        # spec_or_first is statically True; without area lights there is no
        # NEE competitor at all — both cases drop the whole reconstruction.
        is_emitter = jnp.maximum(
            jnp.maximum(emission[0], emission[1]), emission[2]) > 0.0
        if first or not config.has_area_lights:
            mis_w = jnp.ones(n, jnp.float32)
        else:
            cos_hit = jnp.abs(v3_dot(basis["ng"], st.ray_d))
            # Reconstruct the hit emitter's pick probability at the
            # PREVIOUS vertex. Instance-exact: world_area is the hit
            # instance's transformed triangle area, whereas a
            # tri_light-keyed gather would return instance 0's probability
            # for every instance.
            lum_hit = _luminance_c(*emission_base)
            n_l = jnp.maximum(lights.pick_n[0], 1.0)
            if use_potential_pick:
                # potential-weighted pick: rebuild EXACTLY the score the
                # sampler gave this light at the previous vertex — same
                # centroid anchor (baked in tri_shade, transformed by the
                # hit instance), same emitter cosine, distance from the
                # previous origin — over the carried normalization Z, so
                # the pick probability (hence the MIS weights) match the
                # sampling distribution (modulo the shadow_eps origin
                # offset)
                cvec = v3_sub(basis["centroid_w"], st.ray_o)
                c_d2 = jnp.maximum(v3_dot(cvec, cvec), 1e-8)
                cos_c = jnp.abs(v3_dot(basis["ng"], cvec)) / jnp.sqrt(c_d2)
                q_hit = lum_hit * basis["world_area"] * cos_c / c_d2
                hit_pick_p = jnp.where(
                    st.pick_norm > 0,
                    0.5 * q_hit / jnp.maximum(st.pick_norm, 1e-12)
                    + 0.5 / n_l,
                    1.0 / n_l,
                )
            else:
                # global power pick: the light's world-space power weight
                # (lum(radiance) * area * pi, the formula pack_lights uses)
                w_hit = lum_hit * basis["world_area"] * PI
                hit_pick_p = jnp.where(
                    lights.pick_w_total[0] > 0,
                    0.5 * w_hit / jnp.maximum(lights.pick_w_total[0], 1e-12)
                    + 0.5 / n_l,
                    1.0 / n_l,
                )
            pdf_nee_this = (hit.t * hit.t) / jnp.maximum(
                cos_hit * basis["world_area"], 1e-8
            ) * hit_pick_p
            nee_exists = (basis["light_id"] >= 0) & (lights.n_area[0] > 0)
            mis_w = jnp.where(
                st.spec_or_first | ~nee_exists,
                1.0,
                st.prev_bsdf_pdf
                / jnp.maximum(st.prev_bsdf_pdf + pdf_nee_this, 1e-12),
            )
        emit_mask = found & is_emitter
        radiance = v3_where(
            emit_mask,
            v3_add(radiance, v3_scale(v3_mul(throughput0, emission), mis_w)),
            radiance,
        )

        alive = found & ~is_emitter

        # ---- local frame -------------------------------------------------
        tan, bitan = basis["tan"], basis["bitan"]
        wo = disney.to_local_c(tan, bitan, ns, v3_neg(st.ray_d))

        # ---- NEE ---------------------------------------------------------
        # NOTE: per-lane light picks. A tile-shared pick keeps shadow packets
        # maximally coherent (+1% here) but turns estimator variance into
        # visible tile-shaped banding at low spp — not worth it.
        u_l = uniforms(2 + depth * 3, 3, jax.random.fold_in(kd, 1), st.pid)
        (wi_l, dist_l, rad_over_pdf, is_delta, pdf_nee_sa,
         pick_norm) = _sample_light_c(lights, pos, u_l[:, 0], u_l[:, 1],
                                      u_l[:, 2], ns)
        wi_local = disney.to_local_c(tan, bitan, ns, wi_l)
        f_l = disney.disney_eval_c(params, wo, wi_local, config.mat_features)
        cos_l = jnp.maximum(wi_local[2], 0.0)
        can_light = alive & (total_lights > 0) & (cos_l > 0)
        shadow_o = v3_add(pos, v3_scale(basis["ng"], config.shadow_eps))
        # zero-contribution lanes (light behind the surface, dead lanes)
        # get t_limit 0: their slab tests fail immediately and tiles of
        # them exit the traversal loop at once. Bounce vertices route
        # through the ray-binned two-phase any-hit when available (their
        # shadow rays leave sorted-but-incoherent hit points; vertex 0's
        # inherit the primaries' image coherence and stay classic).
        occ_fn = (trace_occluded if first or trace_occluded_bounce is None
                  else trace_occluded_bounce)
        occ = occ_fn(
            v3_stack(shadow_o), v3_stack(wi_l),
            jnp.where(can_light, dist_l - 2.0 * config.shadow_eps, 0.0))
        if config.has_area_lights:
            pdf_b_l = disney.disney_pdf_c(params, wo, wi_local,
                                          config.mat_features)
            mis_nee = jnp.where(
                is_delta, 1.0,
                pdf_nee_sa / jnp.maximum(pdf_nee_sa + pdf_b_l, 1e-12)
            )
        else:
            # delta-only lights: BSDF sampling can never hit them — NEE is
            # the sole strategy and gets full weight (no disney_pdf at all)
            mis_nee = 1.0
        w_nee = cos_l * mis_nee
        contrib = tuple(
            jnp.clip(throughput0[j] * f_l[j] * w_nee * rad_over_pdf[j],
                     0.0, config.clamp)
            for j in range(3))
        radiance = v3_where(can_light & ~occ,
                            v3_add(radiance, contrib), radiance)

        # ---- BSDF bounce (statically absent at the final vertex) ---------
        if last:
            return st._replace(
                radiance=radiance,
                throughput=throughput0,
                alive=jnp.zeros_like(alive),
            ), aovs

        u_b = uniforms(3 + depth * 3, 3, jax.random.fold_in(kd, 2), st.pid)
        wi_b, f_b, pdf_b, delta_b = disney.disney_sample_c(
            params, wo, u_b[:, 0], u_b[:, 1], u_b[:, 2], config.mat_features)
        # transmission samples leave through the lower hemisphere: |cos|
        ok = alive & (pdf_b > 1e-9) & (jnp.abs(wi_b[2]) > 1e-6)
        wi_world = disney.to_world_c(tan, bitan, ns, wi_b)
        bsdf_w = jnp.abs(wi_b[2]) / jnp.maximum(pdf_b, 1e-9)
        throughput = v3_where(
            ok, v3_mul(throughput0, v3_scale(f_b, bsdf_w)), throughput0)
        # offset the continuation off the surface on the side it leaves
        side = jnp.where(wi_b[2] >= 0, 1.0, -1.0)
        new_o = v3_where(
            ok,
            v3_add(pos, v3_scale(basis["ng"], config.shadow_eps * side)),
            st.ray_o)
        new_d = v3_where(ok, wi_world, st.ray_d)

        return st._replace(
            radiance=radiance,
            throughput=throughput,
            alive=ok,
            spec_or_first=(params.roughness < 0.05) | delta_b,
            prev_bsdf_pdf=pdf_b,
            sort_hint=jnp.where(found, hit.inst, -1),
            ray_o=new_o,
            ray_d=new_d,
            pick_norm=pick_norm,
        ), aovs

    # ------------------------------------------------- bounce-vertex step
    do_sort = (config.sort_secondary and use_packet_tiles
               and config.max_bounces >= 1)
    compact_on = (do_sort and config.compaction == "auto"
                  and _os.environ.get("RFW_COMPACTION", "1") == "1")
    sizes = (_prefix_sizes(R, max(tile_lanes, 1), config.max_bounces)
             if compact_on else [R])
    # vertex 0 keeps the shallow ladder (live ~50% after primaries): the
    # sub-floor rungs would compile two more never-chosen branches there
    sizes0 = _prefix_sizes(R, max(tile_lanes, 1)) if compact_on else [R]

    def _sort_state(st: _PathState) -> _PathState:
        """Re-tile by (direction octant, origin morton), dead lanes last:
        secondary rays regain the spatial/directional coherence packet
        tiles need, and the live front becomes a contiguous prefix. Ray
        fields ride lax.sort as operands instead of argsort+gather: XLA
        TPU gathers cost ~670ms per (2M,3) array while a multi-operand
        sort is ~3ms/operand (measured) — 4x on the whole sort path.
        Component state feeds the sort directly (no split/stack)."""
        octant = (
            (st.ray_d[0] >= 0).astype(jnp.int32)
            + 2 * (st.ray_d[1] >= 0).astype(jnp.int32)
            + 4 * (st.ray_d[2] >= 0).astype(jnp.int32)
        )
        cell = morton_codes_c(st.ray_o, scene_mn, scene_mx).astype(jnp.int32)
        if SORT_KEY == "instance":
            # instance-major key: rays leaving the same instance share
            # origin locality AND walk the same BLAS next
            hint = jnp.clip(st.sort_hint, -1, 254) + 1  # 0..255
            skey = hint * (1 << 22) + octant * (1 << 19) + (cell >> 11)
        elif SORT_KEY == "morton":
            # origin-major only: the walk-union simulator (tools/
            # sim_visits.py) measured ~7% fewer program-iterations than
            # the octant-major key on bounce rays — spatial locality
            # shrinks the shared-stack visit union more than direction
            # grouping does on interior scenes
            skey = cell
        elif SORT_KEY == "mortonoct":
            # spatial-major, direction tiebreak inside a morton cell
            # (31 bits total: 22 cell-major + 3 octant + 6 cell-minor)
            skey = ((cell >> 8) << 9) | (octant << 6) | ((cell >> 2) & 63)
        else:  # "octmorton" default
            skey = octant * (1 << 27) + (cell >> 5)
        skey = jnp.where(st.alive, skey, jnp.int32(1 << 30))
        ops = [
            *st.radiance, *st.throughput,
            st.alive, st.spec_or_first, st.prev_bsdf_pdf, st.sort_hint,
            *st.ray_o, *st.ray_d, st.pid,
        ]
        if carry_mis:  # +1 operand only when the reconstruction reads it
            ops += [st.pick_norm]
        out = jax.lax.sort((skey, *ops), num_keys=1)
        (rr, rg, rb, tr, tg, tb, al, sp, pb, sh,
         ox, oy, oz, dx, dy, dz, pp) = out[1:18]
        return _PathState(
            radiance=(rr, rg, rb),
            throughput=(tr, tg, tb),
            alive=al, spec_or_first=sp, prev_bsdf_pdf=pb, sort_hint=sh,
            ray_o=(ox, oy, oz),
            ray_d=(dx, dy, dz),
            pid=pp,
            pick_norm=out[18] if carry_mis else st.pick_norm,
        )

    def _trace_and_shade(st: _PathState, depth, kd, last: bool,
                         n: int) -> _PathState:
        """Run trace + occlusion + shading on the first n lanes (static);
        the suffix passes through untouched (it is all-dead by the prefix
        selection invariant)."""
        if n == R:
            pre, suf = st, None
        else:
            pre = jax.tree.map(lambda a: a[:n], st)
            suf = jax.tree.map(lambda a: a[n:], st)
        hit = trace_bounce(v3_stack(pre.ray_o), v3_stack(pre.ray_d),
                           jnp.where(pre.alive, T_MAX, 0.0))
        new_pre, _ = shade_vertex(pre, hit, depth, kd, first=False, last=last)
        if suf is None:
            return new_pre
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a, b]), new_pre, suf)

    def bounce_vertex(st: _PathState, depth, kd, last: bool) -> _PathState:
        if do_sort:
            st = _sort_state(st)
        if len(sizes) == 1:
            return _trace_and_shade(st, depth, kd, last, sizes[0])
        live = jnp.sum(st.alive.astype(jnp.int32))
        idx = jnp.int32(0)
        for p in sizes[:-1]:
            idx = idx + (live > p).astype(jnp.int32)
        branches = [
            functools.partial(_trace_and_shade, last=last, n=p)
            for p in sizes
        ]
        return jax.lax.switch(idx, branches, st, depth, kd)

    # ------------------------------------------------------- vertex 0
    # The primary trace must cover every pixel (AOVs + sky), but only HIT
    # lanes need shading (49.6% on the bench scene): credit sky to misses
    # on the full front (cheap), then sort lanes by (hit?, prim block) and
    # shade the hit prefix at a static length. The prim-block key also
    # groups lanes by mesh region — material rows and texture pages
    # coalesce, which the miss-last octant/morton key would not give.
    hit0 = trace_coherent(v3_stack(ray_o), v3_stack(ray_d), T_MAX)
    found0 = hit0.prim >= 0
    sky0 = _sky(ray_d)
    rad0 = tuple(jnp.where(found0, 0.0, sky0[j]) for j in range(3))
    kd0 = jax.random.fold_in(k_loop, 0)
    v0_last = config.max_bounces == 0

    def _mk_state(rad, alive, o, d, pp, n):
        one = jnp.ones(n, jnp.float32)
        return _PathState(
            radiance=rad,
            throughput=(one, one, one),
            alive=alive,
            spec_or_first=jnp.ones(n, bool),
            prev_bsdf_pdf=jnp.zeros(n, jnp.float32),
            sort_hint=jnp.full(n, -1, jnp.int32),
            ray_o=o, ray_d=d, pid=pp,
            pick_norm=jnp.zeros(n, jnp.float32),
        )

    _z = jnp.zeros(R, jnp.float32)
    aov_defaults = dict(
        albedo=(_z, _z, _z),
        normal=(_z, _z, _z),
        depth=jnp.full(R, T_MAX, jnp.float32),
        position=(_z, _z, _z),
        ao=jnp.ones(R, jnp.float32),
    )

    v0_compact = compact_on and len(sizes0) > 1
    if v0_compact:
        key0 = jnp.where(found0, hit0.prim >> 4, jnp.int32(1 << 30))
        (_, t0, p0, i0, u0, v0, rr, rg, rb,
         ox, oy, oz, dx, dy, dz, pp) = jax.lax.sort(
            (key0, hit0.t, hit0.prim, hit0.inst, hit0.u, hit0.v,
             *rad0, *ray_o, *ray_d, pid),
            num_keys=1,
        )
        hit0 = Hit(t0, p0, i0, u0, v0)
        st = _mk_state((rr, rg, rb), p0 >= 0,
                       (ox, oy, oz), (dx, dy, dz), pp, R)

        def _shade0(st, hit, n: int):
            if n == R:
                new, aovs = shade_vertex(st, hit, 0, kd0, first=True,
                                         last=v0_last, add_sky=False)
                return new, aovs
            pre = jax.tree.map(lambda a: a[:n], st)
            suf = jax.tree.map(lambda a: a[n:], st)
            pre_hit = jax.tree.map(lambda a: a[:n], hit)
            new_pre, aovs = shade_vertex(pre, pre_hit, 0, kd0, first=True,
                                         last=v0_last, add_sky=False)
            new = jax.tree.map(lambda a, b: jnp.concatenate([a, b]),
                               new_pre, suf)
            aovs = jax.tree.map(
                lambda a, dflt: jnp.concatenate([a, dflt[n:]]),
                aovs, aov_defaults)
            return new, aovs

        live0 = jnp.sum(found0.astype(jnp.int32))
        idx0 = jnp.int32(0)
        for p in sizes0[:-1]:
            idx0 = idx0 + (live0 > p).astype(jnp.int32)
        st, aovs = jax.lax.switch(
            idx0, [functools.partial(_shade0, n=p) for p in sizes0],
            st, hit0)
    else:
        st = _mk_state(rad0, found0, ray_o, ray_d, pid, R)
        st, aovs = shade_vertex(st, hit0, 0, kd0, first=True, last=v0_last,
                                add_sky=False)
    pid0 = st.pid  # lane->pixel map as of the v0 order (AOV restore)

    # ---------------------------------------------- middle + final vertices
    if config.max_bounces >= 2:
        def loop_body(depth, st):
            return bounce_vertex(
                st, depth, jax.random.fold_in(k_loop, depth), last=False)

        st = jax.lax.fori_loop(1, config.max_bounces, loop_body, st)
    if config.max_bounces >= 1:
        st = bounce_vertex(
            st, config.max_bounces,
            jax.random.fold_in(k_loop, config.max_bounces), last=True)

    # ------------------------------------------------------------- output
    def unswizzle(a):
        return a[inv_perm] if inv_perm is not None else a

    if do_sort or v0_compact:
        # lanes are in sorted order: restore PIXEL order directly by
        # sorting on the carried pid (replaces per-bounce unsorts AND the
        # swizzle-inverse gather for radiance in one 4-operand sort)
        (_, rr, rg, rb) = jax.lax.sort(
            (st.pid, *st.radiance),
            num_keys=1,
        )
        radiance_px = jnp.stack([rr, rg, rb], axis=1)
    else:
        radiance_px = v3_stack(tuple(unswizzle(c) for c in st.radiance))

    if not config.aovs:
        # AOV outputs are constants — return them without any unsort
        return SampleResult(
            radiance=jnp.clip(radiance_px, 0.0, None),
            albedo=v3_stack(aovs["albedo"]),
            normal=v3_stack(aovs["normal"]),
            depth=aovs["depth"],
            position=v3_stack(aovs["position"]),
            ao=aovs["ao"],
        )

    if v0_compact:
        # AOVs were produced in the v0 sort order: one 12-operand pid sort
        # restores pixel order for all five channels at once
        (_, aa0, aa1, aa2, an0, an1, an2, ad, ap0, ap1, ap2, ao_) = (
            jax.lax.sort(
                (pid0,
                 *aovs["albedo"],
                 *aovs["normal"],
                 aovs["depth"],
                 *aovs["position"],
                 aovs["ao"]),
                num_keys=1,
            ))
        return SampleResult(
            radiance=jnp.clip(radiance_px, 0.0, None),
            albedo=jnp.stack([aa0, aa1, aa2], axis=1),
            normal=jnp.stack([an0, an1, an2], axis=1),
            depth=ad,
            position=jnp.stack([ap0, ap1, ap2], axis=1),
            ao=ao_,
        )

    return SampleResult(
        radiance=jnp.clip(radiance_px, 0.0, None),
        albedo=v3_stack(tuple(unswizzle(c) for c in aovs["albedo"])),
        normal=v3_stack(tuple(unswizzle(c) for c in aovs["normal"])),
        depth=unswizzle(aovs["depth"]),
        position=v3_stack(tuple(unswizzle(c) for c in aovs["position"])),
        ao=unswizzle(aovs["ao"]),
    )
