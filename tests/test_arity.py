"""Wide-arity supernode traversal (RFW_WIDE_ARITY) parity vs oracle.

Supernode width is a pack-time knob (render.pack.wide_depth): the Pallas
kernels derive the arity from the scene_t row count, so 16/32-wide packs
flow through the same code paths. Traversal is EXACT at any width (same
TREELET leaves, same Woop tests — only the internal fan-out changes), so
closest-hit t and the hit mask must match the 8-wide pack and the brute
oracle bit-for-bit up to visit-order tie-breaks on equal t.

Perf context (why the knob exists): the kernel's supernode fetch is
latency-bound and flat in width, so a 16-ary node (96 box + 16 code +
16 cnt i32 rows = one full 128-row column) halves the dependent-fetch
chain for the same per-fetch cost. On-chip A/B decides the default.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from rfw_tpu.mathx import compose_trs, quat_identity
from rfw_tpu.models import cube, sphere
from rfw_tpu.ops import (
    pallas_closest_hit, pallas_occluded, prepare_pallas_scene,
)
from rfw_tpu.render import brute_force_closest, pack_trace_scene
from rfw_tpu.render.pack import TraceScene


def _pack(arity: int) -> TraceScene:
    mesh = sphere(quality=1)
    box = cube()
    mats_a = [
        compose_trs(np.array([k * 2.5 - 2.5, 0, 0], np.float32),
                    quat_identity(), np.full(3, 0.5 + 0.3 * k, np.float32))
        for k in range(3)
    ]
    mats_b = [compose_trs(np.array([0, 2.5, 0], np.float32), quat_identity(),
                          np.ones(3, np.float32))]
    os.environ["RFW_WIDE_ARITY"] = str(arity)
    try:
        return pack_trace_scene(
            [(0, mesh, None), (1, box, None)],
            [(0, np.stack(mats_a)), (1, np.stack(mats_b))],
        )
    finally:
        os.environ.pop("RFW_WIDE_ARITY", None)


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(5)
    R = 1024
    o = rng.uniform(-5, 5, (R, 3)).astype(np.float32)
    o[:, 2] += 4
    tg = rng.uniform(-3, 3, (R, 3)).astype(np.float32)
    d = tg - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def _world_tris(scene):
    v0s, e1s, e2s = [], [], []
    for i in range(scene.num_instances):
        m = scene.inst_matrix[i]
        sel = scene.tri_mesh == scene.inst_mesh[i]
        v0s.append(scene.tri_v0[sel] @ m[:3, :3].T + m[:3, 3])
        e1s.append(scene.tri_e1[sel] @ m[:3, :3].T)
        e2s.append(scene.tri_e2[sel] @ m[:3, :3].T)
    return np.concatenate(v0s), np.concatenate(e1s), np.concatenate(e2s)


@pytest.mark.parametrize("arity", [16, 32])
def test_wide_arity_closest_matches_oracle_and_wide8(rays, arity):
    o, d = rays
    s8 = _pack(8)
    sw = _pack(arity)
    assert sw.blas8_code.shape[1] == arity
    assert sw.tlas8_code.shape[1] == arity
    # fewer wide nodes at the deeper collapse (same tree, bigger fan-out)
    assert sw.blas8_box.shape[0] <= s8.blas8_box.shape[0]

    t_ref, p_ref, _, _ = brute_force_closest(o, d, *_world_tris(s8))

    hits = {}
    for tag, sc in (("w8", s8), ("wide", sw)):
        ps = prepare_pallas_scene(TraceScene(*[jnp.asarray(x) for x in sc]))
        assert ps.scene_t.shape[0] == 8 * sc.blas8_code.shape[1]
        hits[tag] = pallas_closest_hit(
            ps, jnp.asarray(o), jnp.asarray(d), interpret=True)

    for tag in ("w8", "wide"):
        hm = np.asarray(hits[tag].prim) >= 0
        assert (hm == (p_ref >= 0)).all(), tag
        both = hm & (p_ref >= 0)
        np.testing.assert_allclose(np.asarray(hits[tag].t)[both],
                                   t_ref[both], rtol=1e-4, atol=1e-5)

    # visit order may break exact-t ties differently; t itself must agree
    np.testing.assert_allclose(np.asarray(hits["wide"].t),
                               np.asarray(hits["w8"].t),
                               rtol=1e-6, atol=1e-6)


def test_wide16_occluded_matches_wide8(rays):
    o, d = rays
    s8 = _pack(8)
    s16 = _pack(16)
    occ = {}
    for tag, sc in (("w8", s8), ("w16", s16)):
        ps = prepare_pallas_scene(TraceScene(*[jnp.asarray(x) for x in sc]))
        occ[tag] = np.asarray(pallas_occluded(
            ps, jnp.asarray(o), jnp.asarray(d), 1e30, interpret=True))
    assert (occ["w8"] == occ["w16"]).all()


def test_wide16_twophase_matches_classic(rays):
    from rfw_tpu.ops.traverse_items import twophase_closest_with_fallback

    o, d = rays
    s16 = _pack(16)
    ps = prepare_pallas_scene(TraceScene(*[jnp.asarray(x) for x in s16]))
    classic = pallas_closest_hit(ps, jnp.asarray(o), jnp.asarray(d),
                                 interpret=True)
    two = twophase_closest_with_fallback(ps, jnp.asarray(o), jnp.asarray(d),
                                         interpret=True)
    assert (np.asarray(two.prim) >= 0).tolist() == (
        np.asarray(classic.prim) >= 0).tolist()
    np.testing.assert_allclose(np.asarray(two.t), np.asarray(classic.t),
                               rtol=1e-5, atol=1e-5)
