"""Static BSDF feature masks must be exact no-ops when the masked lobes'
parameters are zero: disney_eval/pdf/sample with a reduced `features`
bitmask must reproduce the full-featured result bit-for-bit on such
materials (the mask only removes terms that multiply to zero)."""

import numpy as np
import jax
import jax.numpy as jnp

from rfw_tpu.render import disney
from rfw_tpu.render.disney import MatParams


def _params(n, key, trans=0.0, cc=0.0, ss=0.0, sheen=0.0):
    ks = jax.random.split(key, 4)
    z = jnp.zeros(n)
    return MatParams(
        base_color=jax.random.uniform(ks[0], (n, 3), minval=0.05, maxval=1.0),
        metallic=jax.random.uniform(ks[1], (n,)),
        roughness=jax.random.uniform(ks[2], (n,), minval=0.05, maxval=1.0),
        specular_f=jax.random.uniform(ks[3], (n,)),
        specular_tint=z + 0.3,
        sheen=z + sheen,
        sheen_tint=z + 0.5,
        clearcoat=z + cc,
        clearcoat_gloss=z + 0.7,
        subsurface=z + ss,
        anisotropic=z,
        transmission=z + trans,
        eta_rel=z + 1.0 / 1.5,
    )


def _dirs(n, key):
    k1, k2 = jax.random.split(key)
    wo = jax.random.normal(k1, (n, 3))
    wo = wo.at[:, 2].set(jnp.abs(wo[:, 2]) + 0.05)
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    wi = jax.random.normal(k2, (n, 3))
    wi = wi.at[:, 2].set(jnp.abs(wi[:, 2]) + 0.05)
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    return wo, wi


def test_masked_lobes_exact_when_absent():
    n = 512
    key = jax.random.PRNGKey(0)
    p = _params(n, key)
    wo, wi = _dirs(n, jax.random.fold_in(key, 1))
    u = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))

    full_f = disney.disney_eval(p, wo, wi, disney.FEAT_ALL)
    full_pdf = disney.disney_pdf(p, wo, wi, disney.FEAT_ALL)
    full_s = disney.disney_sample(p, wo, u, disney.FEAT_ALL)

    none_f = disney.disney_eval(p, wo, wi, 0)
    none_pdf = disney.disney_pdf(p, wo, wi, 0)
    none_s = disney.disney_sample(p, wo, u, 0)

    np.testing.assert_allclose(np.asarray(full_f), np.asarray(none_f),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(full_pdf), np.asarray(none_pdf),
                               rtol=0, atol=1e-7)
    for a, b, nm in zip(full_s, none_s, ("wi", "f", "pdf", "delta")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6, err_msg=nm)


def test_masked_lobes_differ_when_present():
    """Sanity inverse: with a live clearcoat the mask is NOT a no-op."""
    n = 256
    key = jax.random.PRNGKey(3)
    p = _params(n, key, cc=0.8)
    wo, wi = _dirs(n, jax.random.fold_in(key, 1))
    a = np.asarray(disney.disney_eval(p, wo, wi, disney.FEAT_ALL))
    b = np.asarray(disney.disney_eval(p, wo, wi, 0))
    assert np.abs(a - b).max() > 1e-5
