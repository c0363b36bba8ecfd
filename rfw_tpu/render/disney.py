"""Disney principled BSDF — batched jnp eval/sample/pdf.

Re-derivation of the BSDF the reference evaluates per-path in
backends/gpu-rt/shaders/disney.glsl:1-285 (sample/eval with diffuse,
GTR2 specular w/ Smith G, GTR1 clearcoat, sheen, subsurface mix) and the
deferred rasterizer's analytic version (backends/wgpu/shaders/
disney_bsdf.glsl:1-89). Written fresh from the Burley 2012/2015 course
notes; matches the reference's parameterization (metallic, roughness,
specular_f, specular_tint, sheen, sheen_tint, clearcoat, clearcoat_gloss,
subsurface, anisotropic — MATERIAL_PARAM_NAMES order in backend.structs).

All functions are batch-first over R shading points and shade in *local
space* (normal = +z): callers build the tangent frame and transform wi/wo.
Energy conventions: eval() returns BSDF value * |cos θ_i| EXCLUDED —
the integrator multiplies the cosine itself.
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


class MatParams(NamedTuple):
    """Per-point material parameters, each (R,) or (R,3)."""

    base_color: jax.Array  # (R,3) linear albedo
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


def _sqr(x):
    return x * x


def _luminance(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


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


def _tint(base_color):
    lum = _luminance(base_color)[..., None]
    return jnp.where(lum > 0, base_color / jnp.maximum(lum, 1e-7), jnp.ones_like(base_color))


def disney_eval(p: MatParams, wo: jax.Array, wi: jax.Array,
                features: int = FEAT_ALL) -> jax.Array:
    """BRDF value f(wo, wi) in local space (+z = normal). (R,3).

    Reflection-only (transmission handled by the integrator's dedicated
    refraction path, mirroring the reference's BSDF 'eta/transmission'
    branch in disney.glsl). `features` statically drops lobes absent from
    the material set (see FEAT_*)."""
    ndv = wo[..., 2]
    ndl = wi[..., 2]
    up = (ndv > 1e-6) & (ndl > 1e-6)

    h = wi + wo
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    ndh = h[..., 2]
    ldh = jnp.sum(wi * h, axis=-1)

    cdlin = p.base_color
    ctint = _tint(cdlin)
    f0_base = 0.08 * p.specular_f
    cspec0 = (
        f0_base[..., None]
        * ((1.0 - p.specular_tint[..., None]) + p.specular_tint[..., None] * ctint)
        * (1.0 - p.metallic[..., None])
        + cdlin * p.metallic[..., None]
    )
    csheen = (1.0 - p.sheen_tint[..., None]) + p.sheen_tint[..., None] * ctint

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
    f_diffuse = (cdlin / PI) * diffuse_w[..., None]

    # --- sheen --------------------------------------------------------------
    fh = _schlick(ldh)
    if features & FEAT_SHEEN:
        f_sheen = fh[..., None] * p.sheen[..., None] * csheen
    else:
        f_sheen = 0.0

    # --- specular GTR2 ------------------------------------------------------
    alpha = jnp.maximum(1e-3, _sqr(p.roughness))
    ds = _gtr2(ndh, alpha)
    fs = cspec0 + (1.0 - cspec0) * fh[..., None]
    gs = _smith_ggx(ndl, alpha) * _smith_ggx(ndv, alpha)
    f_spec = ds[..., None] * fs * gs[..., None]

    # --- clearcoat GTR1 -----------------------------------------------------
    if features & FEAT_CLEARCOAT:
        a_cc = 0.1 * (1.0 - p.clearcoat_gloss) + 0.001 * p.clearcoat_gloss
        # Disney: mix(0.1, 0.001, gloss)
        dr = _gtr1(ndh, a_cc)
        fr = 0.04 + 0.96 * fh
        gr = _smith_ggx(ndl, 0.25) * _smith_ggx(ndv, 0.25)
        f_cc = (0.25 * p.clearcoat * dr * fr * gr)[..., None]
    else:
        f_cc = 0.0

    f = (f_diffuse + f_sheen) * (1.0 - p.metallic[..., None]) + f_spec + f_cc
    if features & FEAT_TRANSMISSION:
        # Disney 2015 specTrans blend: the glass lobe (disney_sample's delta
        # transmission, Fresnel reflection included) replaces the reflective
        # BSDF in proportion to the transmission share — without this, NEE
        # would add a full diffuse layer on top of glass (milky) and the
        # microfacet specular would double-count the Fresnel reflection.
        trans_w = jnp.clip(p.transmission, 0.0, 1.0) * (1.0 - p.metallic)
        f = f * (1.0 - trans_w[..., None])
    return jnp.where(up[..., None], f, 0.0)


def disney_pdf(p: MatParams, wo: jax.Array, wi: jax.Array,
               features: int = FEAT_ALL) -> jax.Array:
    """Solid-angle pdf of disney_sample for the given pair. (R,)."""
    ndl = wi[..., 2]
    ndv = wo[..., 2]
    up = (ndl > 1e-6) & (ndv > 1e-6)
    h = wi + wo
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    ndh = jnp.maximum(h[..., 2], 1e-6)
    ldh = jnp.maximum(jnp.sum(wi * h, axis=-1), 1e-6)

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


def _refract(wo, h, eta_rel):
    """Refract -wo through microfacet normal h (both local, wo on the +h
    side). Returns (wi, tir): wi transmitted (below the surface when h=+z),
    tir flags total internal reflection (wi invalid there)."""
    cos_i = jnp.sum(wo * h, axis=-1)
    sin2_t = _sqr(eta_rel) * (1.0 - _sqr(cos_i))
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wi = (-wo) * eta_rel[..., None] + (eta_rel * cos_i - cos_t)[..., None] * h
    wi = wi / jnp.maximum(jnp.linalg.norm(wi, axis=-1, keepdims=True), 1e-12)
    return wi, tir


def _sample_cosine(u1, u2):
    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    return jnp.stack([x, y, z], axis=-1)


def _sample_gtr2_h(u1, u2, alpha):
    phi = 2.0 * PI * u1
    cos_t = jnp.sqrt(jnp.clip((1.0 - u2) / (1.0 + (_sqr(alpha) - 1.0) * u2), 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - _sqr(cos_t)))
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def _sample_gtr1_h(u1, u2, a):
    a2 = _sqr(a)
    phi = 2.0 * PI * u1
    cos2 = (1.0 - jnp.power(a2, 1.0 - u2)) / jnp.maximum(1.0 - a2, 1e-6)
    cos_t = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos2))
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def _reflect(wo, h):
    return 2.0 * jnp.sum(wo * h, axis=-1, keepdims=True) * h - wo


def disney_sample(
    p: MatParams, wo: jax.Array, u: jax.Array, features: int = FEAT_ALL
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sample wi ~ pdf; u: (R,3) uniforms (lobe pick, 2x direction).

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
    pick = u[..., 0]
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

    h_spec = _sample_gtr2_h(u[..., 1], u[..., 2], alpha)
    wi_spec = _reflect(wo, h_spec)
    wi_diff = _sample_cosine(u[..., 1], u[..., 2])

    if features & FEAT_CLEARCOAT:
        a_cc = 0.1 * (1.0 - p.clearcoat_gloss) + 0.001 * p.clearcoat_gloss
        h_cc = _sample_gtr1_h(u[..., 1], u[..., 2], a_cc)
        wi_cc = _reflect(wo, h_cc)
        wi = jnp.where(
            use_spec[..., None], wi_spec,
            jnp.where(use_cc[..., None], wi_cc, wi_diff)
        )
    else:
        wi = jnp.where(use_spec[..., None], wi_spec, wi_diff)
    wi = wi / jnp.maximum(jnp.linalg.norm(wi, axis=-1, keepdims=True), 1e-12)
    f = disney_eval(p, wo, wi, features)
    # disney_pdf already folds in the (1 - trans_w) share the reflective
    # mixture gets of the sample picks — scaling again here double-counted
    # it (pdf ~ (1-t)^2) and overbrightened partially-transmissive
    # materials (caught by review; pinned by test_partial_transmission)
    pdf = disney_pdf(p, wo, wi, features)

    if not features & FEAT_TRANSMISSION:
        return wi, f, pdf, use_trans

    # ---- transmission lobe (delta-style) -----------------------------------
    h_t = h_spec  # same GTR2 microfacet roughens the glass
    cos_ih = jnp.sum(wo * h_t, axis=-1)
    fr = fresnel_dielectric(cos_ih, p.eta_rel)
    wi_refr, tir = _refract(wo, h_t, p.eta_rel)
    # Fresnel decision reuses the remapped pick inside the trans share
    pick_t = jnp.clip(pick / jnp.maximum(trans_w, 1e-8), 0.0, 1.0)
    do_reflect = tir | (pick_t < fr)
    wi_trefl = _reflect(wo, h_t)
    wi_trans = jnp.where(do_reflect[..., None], wi_trefl, wi_refr)
    # energy: the F-split makes each branch weight-1; refraction tints by
    # base_color (interface color, matching the reference's transmission
    # tint). Radiance eta^2 scaling is omitted (cancels on exit).
    w_trans = jnp.where(do_reflect[..., None],
                        jnp.ones_like(p.base_color), p.base_color)
    # delta encoding: f*|cos|/pdf == weight; weight split already in pick
    abs_cos = jnp.maximum(jnp.abs(wi_trans[..., 2]), 1e-6)
    f_trans = w_trans / (abs_cos / jnp.maximum(trans_w, 1e-8))[..., None]
    pdf_trans = trans_w  # so f*cos/pdf = w_trans exactly

    wi = jnp.where(use_trans[..., None], wi_trans, wi)
    f = jnp.where(use_trans[..., None], f_trans, f)
    pdf = jnp.where(use_trans, pdf_trans, pdf)
    return wi, f, pdf, use_trans


# ------------------------------------------------------------------ frames
def build_tangent_frame(n: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Branchless orthonormal basis (Duff et al. 2017). n: (R,3)."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def to_local(t, bt, n, v):
    return jnp.stack(
        [jnp.sum(v * t, -1), jnp.sum(v * bt, -1), jnp.sum(v * n, -1)], axis=-1
    )


def to_world(t, bt, n, v):
    return (
        v[..., 0:1] * t + v[..., 1:2] * bt + v[..., 2:3] * n
    )
