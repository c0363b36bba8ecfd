"""Disney principled BSDF — batched jnp eval/sample/pdf.

Re-derivation of the BSDF the reference evaluates per-path in
backends/gpu-rt/shaders/disney.glsl:1-285 (sample/eval with diffuse,
GTR2 specular w/ Smith G, GTR1 clearcoat, sheen, subsurface mix) and the
deferred rasterizer's analytic version (backends/wgpu/shaders/
disney_bsdf.glsl:1-89). Written fresh from the Burley 2012/2015 course
notes; matches the reference's parameterization (metallic, roughness,
specular_f, specular_tint, sheen, sheen_tint, clearcoat, clearcoat_gloss,
subsurface, anisotropic — MATERIAL_PARAM_NAMES order in backend.structs).

All functions shade in *local space* (normal = +z): callers build the
tangent frame and transform wi/wo. Energy conventions: eval() returns
BSDF value * |cos θ_i| EXCLUDED — the integrator multiplies the cosine.

LAYOUT: the core (`*_c` functions) is COMPONENT-WISE — 3-vectors and
colors are (x, y, z) tuples of (R,) arrays, so every elementwise op runs
on full 128-lane vectors. A (R,3) array tiles its minormost dim onto the
lane axis (3 useful lanes of 128) unless XLA's fusion flattens it; the
integrator's hot path calls the `_c` API directly. The (R,3) wrappers
(disney_eval/disney_pdf/disney_sample/to_local/to_world) preserve the
original batched API — tests pin behavior through them.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

PI = 3.14159265358979

#: static feature bits for eval/pdf/sample `features` masks: lobes whose
#: driving parameter is zero across the WHOLE material set can be dropped
#: from the compiled program (each is elementwise VPU work over every
#: lane). wavefront.mat_feature_mask() computes the mask from a
#: DeviceMaterials table; default FEAT_ALL preserves full behavior.
FEAT_TRANSMISSION = 1
FEAT_CLEARCOAT = 2
FEAT_SUBSURFACE = 4
FEAT_SHEEN = 8
FEAT_ALL = 15

#: a component 3-vector: (x, y, z) tuple of (R,) arrays
Vec3C = Tuple[jax.Array, jax.Array, jax.Array]


class MatParams(NamedTuple):
    """Per-point material parameters, each (R,) or (R,3)."""

    base_color: jax.Array  # (R,3) linear albedo — or a Vec3C tuple of (R,)
    #   components (the integrator's component-form hot path)
    metallic: jax.Array
    roughness: jax.Array
    specular_f: jax.Array  # "specular" 0..1 -> F0 = 0.08 * specular_f
    specular_tint: jax.Array
    sheen: jax.Array
    sheen_tint: jax.Array
    clearcoat: jax.Array
    clearcoat_gloss: jax.Array
    subsurface: jax.Array
    anisotropic: jax.Array
    transmission: jax.Array  # (R,) 0..1 specular-transmission weight
    eta_rel: jax.Array  # (R,) RELATIVE ior across the interface for the
    #   incident side: 1/ior entering the medium, ior exiting (the caller
    #   resolves the side from the pre-flip geometric normal)

    @property
    def base_c(self) -> Vec3C:
        if isinstance(self.base_color, tuple):
            return self.base_color
        return (self.base_color[..., 0], self.base_color[..., 1],
                self.base_color[..., 2])


# --------------------------------------------------------- component vec3
def v3_split(v: jax.Array) -> Vec3C:
    return (v[..., 0], v[..., 1], v[..., 2])


def v3_stack(v: Vec3C) -> jax.Array:
    return jnp.stack(v, axis=-1)


def v3_dot(a: Vec3C, b: Vec3C) -> jax.Array:
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def v3_cross(a: Vec3C, b: Vec3C) -> Vec3C:
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def v3_add(a: Vec3C, b: Vec3C) -> Vec3C:
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def v3_sub(a: Vec3C, b: Vec3C) -> Vec3C:
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def v3_scale(a: Vec3C, s: jax.Array) -> Vec3C:
    return (a[0] * s, a[1] * s, a[2] * s)


def v3_mul(a: Vec3C, b: Vec3C) -> Vec3C:
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def v3_neg(a: Vec3C) -> Vec3C:
    return (-a[0], -a[1], -a[2])


def v3_where(m: jax.Array, a: Vec3C, b: Vec3C) -> Vec3C:
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]),
            jnp.where(m, a[2], b[2]))


def v3_normalize(a: Vec3C, eps: float = 1e-12) -> Vec3C:
    inv = 1.0 / jnp.maximum(jnp.sqrt(v3_dot(a, a)), eps)
    return v3_scale(a, inv)


def _sqr(x):
    return x * x


def _luminance_c(r, g, b):
    return 0.2126 * r + 0.7152 * g + 0.0722 * b


def _schlick(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    return _sqr(_sqr(m)) * m


def _gtr1(ndh, a):
    a2 = _sqr(a)
    t = 1.0 + (a2 - 1.0) * _sqr(ndh)
    return jnp.where(a >= 1.0, 1.0 / PI, (a2 - 1.0) / (PI * jnp.log(a2) * t))


def _gtr2(ndh, a):
    a2 = _sqr(a)
    t = 1.0 + (a2 - 1.0) * _sqr(ndh)
    return a2 / (PI * _sqr(t) + 1e-12)


def _smith_ggx(ndv, a):
    a2 = _sqr(a)
    b = _sqr(ndv)
    return 1.0 / (ndv + jnp.sqrt(a2 + b - a2 * b) + 1e-12)


def _tint_c(base: Vec3C) -> Vec3C:
    lum = _luminance_c(*base)
    has = lum > 0
    inv = 1.0 / jnp.maximum(lum, 1e-7)
    one = jnp.ones_like(lum)
    return (jnp.where(has, base[0] * inv, one),
            jnp.where(has, base[1] * inv, one),
            jnp.where(has, base[2] * inv, one))


# ------------------------------------------------------------- component core
def disney_eval_c(p: MatParams, wo: Vec3C, wi: Vec3C,
                  features: int = FEAT_ALL) -> Vec3C:
    """BRDF value f(wo, wi) in local space (+z = normal), per channel.

    Reflection-only (transmission handled by the integrator's dedicated
    refraction path, mirroring the reference's BSDF 'eta/transmission'
    branch in disney.glsl). `features` statically drops lobes absent from
    the material set (see FEAT_*)."""
    ndv = wo[2]
    ndl = wi[2]
    up = (ndv > 1e-6) & (ndl > 1e-6)

    h = v3_normalize(v3_add(wi, wo))
    ndh = h[2]
    ldh = v3_dot(wi, h)

    base = p.base_c
    ctint = _tint_c(base)
    f0_base = 0.08 * p.specular_f
    spec_lerp = tuple(
        (1.0 - p.specular_tint) + p.specular_tint * ctint[j] for j in range(3))
    one_m_metal = 1.0 - p.metallic
    cspec0 = tuple(
        f0_base * spec_lerp[j] * one_m_metal + base[j] * p.metallic
        for j in range(3))
    csheen = tuple(
        (1.0 - p.sheen_tint) + p.sheen_tint * ctint[j] for j in range(3))

    # --- diffuse (Burley retro-reflection + subsurface approx) -------------
    fl = _schlick(ndl)
    fv = _schlick(ndv)
    fd90 = 0.5 + 2.0 * _sqr(ldh) * p.roughness
    fd = (1.0 + (fd90 - 1.0) * fl) * (1.0 + (fd90 - 1.0) * fv)

    if features & FEAT_SUBSURFACE:
        fss90 = _sqr(ldh) * p.roughness
        fss = (1.0 + (fss90 - 1.0) * fl) * (1.0 + (fss90 - 1.0) * fv)
        ss = 1.25 * (fss * (1.0 / jnp.maximum(ndl + ndv, 1e-6) - 0.5) + 0.5)
        diffuse_w = jnp.where(
            p.subsurface > 0,
            (1.0 - p.subsurface) * fd + p.subsurface * ss, fd)
    else:
        diffuse_w = fd
    diff_s = diffuse_w / PI

    # --- sheen + specular GTR2 + clearcoat GTR1 ----------------------------
    fh = _schlick(ldh)
    alpha = jnp.maximum(1e-3, _sqr(p.roughness))
    ds = _gtr2(ndh, alpha)
    gs = _smith_ggx(ndl, alpha) * _smith_ggx(ndv, alpha)
    dsgs = ds * gs

    if features & FEAT_CLEARCOAT:
        a_cc = 0.1 * (1.0 - p.clearcoat_gloss) + 0.001 * p.clearcoat_gloss
        # Disney: mix(0.1, 0.001, gloss)
        dr = _gtr1(ndh, a_cc)
        fr = 0.04 + 0.96 * fh
        gr = _smith_ggx(ndl, 0.25) * _smith_ggx(ndv, 0.25)
        f_cc = 0.25 * p.clearcoat * dr * fr * gr
    else:
        f_cc = 0.0

    if features & FEAT_TRANSMISSION:
        # Disney 2015 specTrans blend: the glass lobe (disney_sample's delta
        # transmission, Fresnel reflection included) replaces the reflective
        # BSDF in proportion to the transmission share — without this, NEE
        # would add a full diffuse layer on top of glass (milky) and the
        # microfacet specular would double-count the Fresnel reflection.
        trans_scale = 1.0 - jnp.clip(p.transmission, 0.0, 1.0) * one_m_metal
    else:
        trans_scale = None

    out = []
    zero = jnp.zeros_like(ndv)
    for j in range(3):
        f_diffuse = base[j] * diff_s
        if features & FEAT_SHEEN:
            f_diffuse = f_diffuse + fh * p.sheen * csheen[j]
        fs = cspec0[j] + (1.0 - cspec0[j]) * fh
        f = f_diffuse * one_m_metal + dsgs * fs + f_cc
        if trans_scale is not None:
            f = f * trans_scale
        out.append(jnp.where(up, f, zero))
    return tuple(out)


def disney_pdf_c(p: MatParams, wo: Vec3C, wi: Vec3C,
                 features: int = FEAT_ALL) -> jax.Array:
    """Solid-angle pdf of disney_sample for the given pair. (R,)."""
    ndl = wi[2]
    ndv = wo[2]
    up = (ndl > 1e-6) & (ndv > 1e-6)
    h = v3_normalize(v3_add(wi, wo))
    ndh = jnp.maximum(h[2], 1e-6)
    ldh = jnp.maximum(v3_dot(wi, h), 1e-6)

    spec_w, cc_w, diff_w = _lobe_weights(p, features)

    alpha = jnp.maximum(1e-3, _sqr(p.roughness))
    pdf_spec = _gtr2(ndh, alpha) * ndh / (4.0 * ldh)
    pdf_diff = ndl / PI

    pdf = diff_w * pdf_diff + spec_w * pdf_spec
    if features & FEAT_CLEARCOAT:
        a_cc = 0.1 * (1.0 - p.clearcoat_gloss) + 0.001 * p.clearcoat_gloss
        pdf = pdf + cc_w * _gtr1(ndh, a_cc) * ndh / (4.0 * ldh)
    if features & FEAT_TRANSMISSION:
        # the reflective mixture only gets (1 - transmission-share) of the
        # sample picks (disney_sample) — the MIS competitor pdf must match
        trans_w = jnp.clip(p.transmission, 0.0, 1.0) * (1.0 - p.metallic)
        pdf = pdf * (1.0 - trans_w)
    return jnp.where(up, pdf, 0.0)


def _lobe_weights(p: MatParams, features: int = FEAT_ALL
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sampling mixture weights (specular, clearcoat, diffuse) for the
    *reflective* lobes, summing to 1. The transmission lobe is layered on
    top by disney_sample (it takes a `transmission`-proportional share and
    the reflective lobes split the remainder)."""
    if not features & FEAT_CLEARCOAT:
        spec_w = 0.5 + 0.5 * p.metallic
        diff_w = (1.0 - p.metallic) * 0.5
        total = spec_w + diff_w + 1e-8
        return spec_w / total, jnp.zeros_like(spec_w), diff_w / total
    spec_w = 1.0 / (1.0 + p.clearcoat * 0.5) * (0.5 + 0.5 * p.metallic)
    cc_w = (p.clearcoat * 0.25) / (1.0 + p.clearcoat * 0.25)
    diff_w = (1.0 - p.metallic) * 0.5
    total = spec_w + cc_w + diff_w + 1e-8
    return spec_w / total, cc_w / total, diff_w / total


def fresnel_dielectric(cos_i: jax.Array, eta_rel: jax.Array) -> jax.Array:
    """Exact unpolarized dielectric Fresnel reflectance. cos_i >= 0 is the
    incident angle against the interface normal on the incident side;
    eta_rel = ior_incident / ior_transmitted (e.g. 1/1.5 entering glass).
    Returns 1.0 under total internal reflection."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = _sqr(eta_rel) * (1.0 - _sqr(cos_i))
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_par = (eta_rel * cos_i - cos_t) / jnp.maximum(eta_rel * cos_i + cos_t, 1e-12)
    r_perp = (cos_i - eta_rel * cos_t) / jnp.maximum(cos_i + eta_rel * cos_t, 1e-12)
    f = 0.5 * (_sqr(r_par) + _sqr(r_perp))
    return jnp.where(tir, 1.0, jnp.clip(f, 0.0, 1.0))


def _refract_c(wo: Vec3C, h: Vec3C, eta_rel):
    """Refract -wo through microfacet normal h (both local, wo on the +h
    side). Returns (wi, tir): wi transmitted (below the surface when h=+z),
    tir flags total internal reflection (wi invalid there)."""
    cos_i = v3_dot(wo, h)
    sin2_t = _sqr(eta_rel) * (1.0 - _sqr(cos_i))
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    k = eta_rel * cos_i - cos_t
    wi = v3_add(v3_scale(v3_neg(wo), eta_rel), v3_scale(h, k))
    return v3_normalize(wi), tir


def _sample_cosine_c(u1, u2) -> Vec3C:
    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    return (r * jnp.cos(phi), r * jnp.sin(phi),
            jnp.sqrt(jnp.maximum(0.0, 1.0 - u1)))


def _sample_gtr2_h_c(u1, u2, alpha) -> Vec3C:
    phi = 2.0 * PI * u1
    cos_t = jnp.sqrt(jnp.clip(
        (1.0 - u2) / (1.0 + (_sqr(alpha) - 1.0) * u2), 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - _sqr(cos_t)))
    return (sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t)


def _sample_gtr1_h_c(u1, u2, a) -> Vec3C:
    a2 = _sqr(a)
    phi = 2.0 * PI * u1
    cos2 = (1.0 - jnp.power(a2, 1.0 - u2)) / jnp.maximum(1.0 - a2, 1e-6)
    cos_t = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos2))
    return (sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t)


def _reflect_c(wo: Vec3C, h: Vec3C) -> Vec3C:
    k = 2.0 * v3_dot(wo, h)
    return v3_sub(v3_scale(h, k), wo)


def disney_sample_c(
    p: MatParams, wo: Vec3C, u0, u1, u2, features: int = FEAT_ALL
) -> Tuple[Vec3C, Vec3C, jax.Array, jax.Array]:
    """Sample wi ~ pdf; (u0,u1,u2): (R,) uniforms (lobe pick, 2x direction).

    Returns (wi, f, pdf, is_delta) — f excludes the ndl cosine.

    Transmission (reference disney.glsl eta/transmission branch) is a
    *delta-style* lobe: a GTR2 microfacet is sampled, exact dielectric
    Fresnel splits the energy between reflection and refraction (TIR
    included), and the result is returned with pdf == 1 and
    f == weight / |wi.z| so the integrator's f*|cos|/pdf update applies
    exactly `weight`. is_delta marks those lanes: eval/pdf cannot score
    them (NEE through the interface is blocked by the glass itself, so
    BSDF sampling is the sole strategy there and MIS weight 1 is exact)."""
    spec_w, cc_w, _ = _lobe_weights(p, features)
    pick = u0
    if features & FEAT_TRANSMISSION:
        trans_w = jnp.clip(p.transmission, 0.0, 1.0) * (1.0 - p.metallic)
        use_trans = pick < trans_w
        # remap the survivor pick into [0,1) for the reflective lobes
        pick_r = jnp.clip(
            (pick - trans_w) / jnp.maximum(1.0 - trans_w, 1e-8), 0.0, 1.0)
    else:
        use_trans = jnp.zeros(pick.shape, bool)
        pick_r = pick
    use_spec = (~use_trans) & (pick_r < spec_w)
    use_cc = (~use_trans) & (~use_spec) & (pick_r < spec_w + cc_w)

    alpha = jnp.maximum(1e-3, _sqr(p.roughness))

    h_spec = _sample_gtr2_h_c(u1, u2, alpha)
    wi_spec = _reflect_c(wo, h_spec)
    wi_diff = _sample_cosine_c(u1, u2)

    if features & FEAT_CLEARCOAT:
        a_cc = 0.1 * (1.0 - p.clearcoat_gloss) + 0.001 * p.clearcoat_gloss
        h_cc = _sample_gtr1_h_c(u1, u2, a_cc)
        wi_cc = _reflect_c(wo, h_cc)
        wi = v3_where(use_spec, wi_spec, v3_where(use_cc, wi_cc, wi_diff))
    else:
        wi = v3_where(use_spec, wi_spec, wi_diff)
    wi = v3_normalize(wi)
    f = disney_eval_c(p, wo, wi, features)
    # disney_pdf already folds in the (1 - trans_w) share the reflective
    # mixture gets of the sample picks — scaling again here double-counted
    # it (pdf ~ (1-t)^2) and overbrightened partially-transmissive
    # materials (caught by review; pinned by test_partial_transmission)
    pdf = disney_pdf_c(p, wo, wi, features)

    if not features & FEAT_TRANSMISSION:
        return wi, f, pdf, use_trans

    # ---- transmission lobe (delta-style) -----------------------------------
    h_t = h_spec  # same GTR2 microfacet roughens the glass
    cos_ih = v3_dot(wo, h_t)
    fr = fresnel_dielectric(cos_ih, p.eta_rel)
    wi_refr, tir = _refract_c(wo, h_t, p.eta_rel)
    # Fresnel decision reuses the remapped pick inside the trans share
    pick_t = jnp.clip(pick / jnp.maximum(trans_w, 1e-8), 0.0, 1.0)
    do_reflect = tir | (pick_t < fr)
    wi_trefl = _reflect_c(wo, h_t)
    wi_trans = v3_where(do_reflect, wi_trefl, wi_refr)
    # energy: the F-split makes each branch weight-1; refraction tints by
    # base_color (interface color, matching the reference's transmission
    # tint). Radiance eta^2 scaling is omitted (cancels on exit).
    base = p.base_c
    ones = jnp.ones_like(base[0])
    w_trans = v3_where(do_reflect, (ones, ones, ones), base)
    # delta encoding: f*|cos|/pdf == weight; weight split already in pick
    abs_cos = jnp.maximum(jnp.abs(wi_trans[2]), 1e-6)
    inv_share = jnp.maximum(trans_w, 1e-8) / abs_cos
    f_trans = v3_scale(w_trans, inv_share)
    pdf_trans = trans_w  # so f*cos/pdf = w_trans exactly

    wi = v3_where(use_trans, wi_trans, wi)
    f = v3_where(use_trans, f_trans, f)
    pdf = jnp.where(use_trans, pdf_trans, pdf)
    return wi, f, pdf, use_trans


# ------------------------------------------------------------------ frames
def build_tangent_frame_c(n: Vec3C) -> Tuple[Vec3C, Vec3C]:
    """Branchless orthonormal basis (Duff et al. 2017), component form."""
    s = jnp.where(n[2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[2])
    b = n[0] * n[1] * a
    t = (1.0 + s * n[0] * n[0] * a, s * b, -s * n[0])
    bt = (b, s + n[1] * n[1] * a, -n[1])
    return t, bt


def to_local_c(t: Vec3C, bt: Vec3C, n: Vec3C, v: Vec3C) -> Vec3C:
    return (v3_dot(v, t), v3_dot(v, bt), v3_dot(v, n))


def to_world_c(t: Vec3C, bt: Vec3C, n: Vec3C, v: Vec3C) -> Vec3C:
    return (v[0] * t[0] + v[1] * bt[0] + v[2] * n[0],
            v[0] * t[1] + v[1] * bt[1] + v[2] * n[1],
            v[0] * t[2] + v[1] * bt[2] + v[2] * n[2])


# -------------------------------------------------- batched (R,3) wrappers
# The original API: tests pin BSDF behavior through these; the integrator's
# hot path uses the component core directly.
def disney_eval(p: MatParams, wo: jax.Array, wi: jax.Array,
                features: int = FEAT_ALL) -> jax.Array:
    """BRDF value f(wo, wi) in local space (+z = normal). (R,3)."""
    return v3_stack(disney_eval_c(p, v3_split(wo), v3_split(wi), features))


def disney_pdf(p: MatParams, wo: jax.Array, wi: jax.Array,
               features: int = FEAT_ALL) -> jax.Array:
    """Solid-angle pdf of disney_sample for the given pair. (R,)."""
    return disney_pdf_c(p, v3_split(wo), v3_split(wi), features)


def disney_sample(
    p: MatParams, wo: jax.Array, u: jax.Array, features: int = FEAT_ALL
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sample wi ~ pdf; u: (R,3) uniforms. See disney_sample_c."""
    wi, f, pdf, is_delta = disney_sample_c(
        p, v3_split(wo), u[..., 0], u[..., 1], u[..., 2], features)
    return v3_stack(wi), v3_stack(f), pdf, is_delta


def build_tangent_frame(n: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Branchless orthonormal basis (Duff et al. 2017). n: (R,3)."""
    t, bt = build_tangent_frame_c(v3_split(n))
    return v3_stack(t), v3_stack(bt)


def to_local(t, bt, n, v):
    return v3_stack(to_local_c(v3_split(t), v3_split(bt), v3_split(n),
                               v3_split(v)))


def to_world(t, bt, n, v):
    return v3_stack(to_world_c(v3_split(t), v3_split(bt), v3_split(n),
                               v3_split(v)))


def _sample_cosine(u1, u2):
    return v3_stack(_sample_cosine_c(u1, u2))


def _refract(wo, h, eta_rel):
    """Batched (R,3) wrapper over _refract_c (tests pin Snell/TIR here)."""
    wi, tir = _refract_c(v3_split(wo), v3_split(h), eta_rel)
    return v3_stack(wi), tir
