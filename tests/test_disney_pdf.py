"""Monte-Carlo consistency of the Disney BSDF triplet: for reflective
materials, disney_pdf must be a true density of disney_sample's direction
distribution, and the two reflectance estimators must agree:

  * integral of pdf over the hemisphere == 1 (uniform-direction MC)
  * E_sample[f * |cos| / pdf] == E_uniform[f * cos] * 2pi  (both estimate
    the directional-hemispherical reflectance of wo)

Any drift between sample() and pdf() (lobe weights, remapping, alpha
clamps) breaks MIS silently; this pins them together."""

import numpy as np
import jax
import jax.numpy as jnp

from rfw_tpu.render import disney
from rfw_tpu.render.disney import MatParams


def _mat(n, metallic, roughness, cc=0.0):
    z = jnp.zeros(n)
    return MatParams(
        base_color=jnp.broadcast_to(jnp.array([0.7, 0.5, 0.4]), (n, 3)),
        metallic=z + metallic,
        roughness=z + roughness,
        specular_f=z + 0.5,
        specular_tint=z,
        sheen=z,
        sheen_tint=z,
        clearcoat=z + cc,
        clearcoat_gloss=z + 0.8,
        subsurface=z,
        anisotropic=z,
        transmission=z,
        eta_rel=z + 1.0 / 1.5,
    )


def _uniform_hemi(key, n):
    u = jax.random.uniform(key, (n, 2))
    z = u[:, 0]
    phi = 2.0 * jnp.pi * u[:, 1]
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)


def test_pdf_integrates_to_one_and_estimators_agree():
    n = 16384
    key = jax.random.PRNGKey(11)
    wo = jnp.broadcast_to(
        jnp.array([0.45, 0.1, 0.886]) / jnp.linalg.norm(
            jnp.array([0.45, 0.1, 0.886])), (n, 3))
    for metallic, rough, cc in ((0.0, 0.6, 0.0), (0.9, 0.25, 0.0),
                                (0.2, 0.4, 0.7)):
        p = _mat(n, metallic, rough, cc)
        wi_u = _uniform_hemi(jax.random.fold_in(key, 1), n)

        pdf_u = np.asarray(disney.disney_pdf(p, wo, wi_u))
        integral = float(pdf_u.mean() * 2.0 * np.pi)
        assert abs(integral - 1.0) < 0.08, \
            f"pdf integral {integral:.3f} (m={metallic} r={rough} cc={cc})"

        # reflectance via BSDF sampling vs via uniform integration
        u3 = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))
        wi_s, f_s, pdf_s, delta = disney.disney_sample(p, wo, u3)
        f_s = np.asarray(f_s)
        pdf_s = np.asarray(pdf_s)
        cos_s = np.abs(np.asarray(wi_s)[:, 2])
        ok = pdf_s > 1e-8
        est_sample = (np.asarray(
            0.2126 * f_s[:, 0] + 0.7152 * f_s[:, 1] + 0.0722 * f_s[:, 2])
            * cos_s / np.maximum(pdf_s, 1e-8))[ok].mean()

        f_u = np.asarray(disney.disney_eval(p, wo, wi_u))
        lum_u = 0.2126 * f_u[:, 0] + 0.7152 * f_u[:, 1] + 0.0722 * f_u[:, 2]
        est_uniform = float((lum_u * np.asarray(wi_u)[:, 2]).mean()
                            * 2.0 * np.pi)
        rel = abs(est_sample - est_uniform) / max(est_uniform, 1e-6)
        assert rel < 0.08, (f"reflectance {est_sample:.4f} vs "
                            f"{est_uniform:.4f} (m={metallic} r={rough})")
