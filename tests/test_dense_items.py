"""Dense items tier (ops.traverse_items._dense_kernel_factory): runs whose
instance's mesh is small (<= RFW_DENSE_MAX_TRIS) skip the BLAS walk and
test every treelet of the mesh densely. Parity contract: routing any run
through the dense kernel must be invisible — identical hits to the
walk-only pipeline, which itself matches the classic two-level walker.

Reference anchor: the reference has no counterpart (its GPU traversal is
latency-hidden by warp scheduling, backends/gpu-rt/shaders/
intersection.glsl:106-167); on a TPU the dependent-fetch walk IS the
cost, so small BLASes are cheaper to test exhaustively than to descend.
"""

import numpy as np
import jax.numpy as jnp

from rfw_tpu.models import cube, sphere
from rfw_tpu.ops import prepare_pallas_scene
from rfw_tpu.render import pack_trace_scene

from tests.test_traversal import make_rays, scene_dev
from tests.test_tlas_device import _random_instances


def _terrain(n):
    # > DENSE_MAX_TRIS triangles -> walk-class instance
    from rfw_tpu.models.mesh3d import build_mesh3d

    xs = np.arange(n + 1, dtype=np.float32)
    X, Z = np.meshgrid(xs, xs, indexing="ij")
    Y = (np.sin(X * 0.7) * np.cos(Z * 0.5)).astype(np.float32)
    P = np.stack([X - n / 2, Y, Z - n / 2], axis=-1).reshape(-1, 3) * (8.0 / n)
    idx = np.arange((n + 1) * (n + 1)).reshape(n + 1, n + 1)
    a = idx[:-1, :-1].reshape(-1)
    b = idx[1:, :-1].reshape(-1)
    c = idx[1:, 1:].reshape(-1)
    d = idx[:-1, 1:].reshape(-1)
    tris = np.concatenate(
        [np.stack([a, b, c], 1), np.stack([a, c, d], 1)]).astype(np.int32)
    return build_mesh3d(positions=P, indices=tris, name="terrain")


def _mixed_scene(rng):
    """One walk-class mesh (5408 tris > gate) + two dense-class meshes."""
    from rfw_tpu.ops.traverse_items import DENSE_MAX_TRIS

    terr = _terrain(52)
    assert terr.indices.shape[0] > DENSE_MAX_TRIS
    scene = pack_trace_scene(
        [(0, terr, None), (1, sphere(quality=1), None), (2, cube(), None)],
        [(0, np.eye(4, dtype=np.float32)[None]),
         (1, _random_instances(rng, 5)), (2, _random_instances(rng, 4))],
    )
    sd = scene_dev(scene)
    return sd, prepare_pallas_scene(sd)


def test_mesh_tri_ranges_treelet_aligned(rng):
    from rfw_tpu.accel.bvh_cpu import TREELET

    sd, _ = _mixed_scene(rng)
    rng_t = np.asarray(sd.mesh_tri_range)
    assert rng_t.shape == (3, 2)
    assert (rng_t % TREELET == 0).all()
    assert (rng_t[:, 1] > rng_t[:, 0]).all()
    # ranges tile the arena without overlap and own their tri_mesh rows
    tri_mesh = np.asarray(sd.tri_mesh)
    for m in range(3):
        lo, hi = rng_t[m]
        assert (tri_mesh[lo:hi] == m).all()


def test_dense_matches_walk_exactly(rng):
    """Routing small-mesh runs through the dense kernel is bit-invisible:
    same t/prim/inst/u/v and the same truncation flags as walk-only."""
    from rfw_tpu.ops.traverse_items import twophase_closest_fused

    sd, ps = _mixed_scene(rng)
    o, d = make_rays(256, rng, origin_box=8.0, target_box=6.0)
    kw = dict(K=4, items_per_ray=4.0,
              n_inst_static=sd.inst_matrix.shape[0], interpret=True)
    got_d, tr_d = twophase_closest_fused(
        ps, jnp.asarray(o), jnp.asarray(d), dense=True, **kw)
    got_w, tr_w = twophase_closest_fused(
        ps, jnp.asarray(o), jnp.asarray(d), dense=False, **kw)
    assert (np.asarray(tr_d) == np.asarray(tr_w)).all()
    for f in ("t", "prim", "inst", "u", "v"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got_d, f)), np.asarray(getattr(got_w, f)), f)
    # the dense class is actually exercised: some hits land on meshes 1/2
    hit_inst = np.asarray(got_d.inst)
    hit_mesh = np.asarray(sd.inst_mesh)[np.maximum(hit_inst, 0)]
    assert ((hit_inst >= 0) & (hit_mesh >= 1)).any()
    # ... and the walk class too (terrain hits)
    assert ((hit_inst >= 0) & (hit_mesh == 0)).any()


def test_dense_fallback_matches_oracle(rng):
    """with_fallback + dense: every ray exact vs the classic walker."""
    from rfw_tpu.render import bvh_closest_hit
    from rfw_tpu.ops.traverse_items import twophase_closest_with_fallback

    sd, ps = _mixed_scene(rng)
    o, d = make_rays(256, rng, origin_box=8.0, target_box=6.0)
    got = twophase_closest_with_fallback(
        ps, jnp.asarray(o), jnp.asarray(d), K=4, items_per_ray=4.0,
        n_inst_static=sd.inst_matrix.shape[0], interpret=True, dense=True)
    ref = bvh_closest_hit(sd, jnp.asarray(o), jnp.asarray(d))
    m_ref = np.asarray(ref.prim) >= 0
    m_got = np.asarray(got.prim) >= 0
    assert (m_ref == m_got).all()
    np.testing.assert_allclose(np.asarray(got.t)[m_ref],
                               np.asarray(ref.t)[m_ref],
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(got.prim)[m_ref] == np.asarray(ref.prim)[m_ref]).all()


def test_dense_occluded_matches_walk(rng):
    """Any-hit dense tier: occluded/undecided flags identical to the
    walk-only pipeline, incl. dead (zero-limit) lanes."""
    from rfw_tpu.ops.traverse_items import twophase_occluded_fused

    sd, ps = _mixed_scene(rng)
    o, d = make_rays(256, rng, origin_box=8.0, target_box=6.0)
    tl = np.full(256, 10.0, np.float32)
    tl[::5] = 0.0  # NEE dead-lane contract
    kw = dict(K=4, items_per_ray=4.0,
              n_inst_static=sd.inst_matrix.shape[0], interpret=True)
    occ_d, und_d = twophase_occluded_fused(
        ps, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tl),
        dense=True, **kw)
    occ_w, und_w = twophase_occluded_fused(
        ps, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tl),
        dense=False, **kw)
    np.testing.assert_array_equal(np.asarray(occ_d), np.asarray(occ_w))
    np.testing.assert_array_equal(np.asarray(und_d), np.asarray(und_w))
    assert np.asarray(occ_d).any()
    assert not np.asarray(occ_d)[::5].any()


def test_all_dense_scene(rng):
    """Every instance dense-class: the walk kernel idles, results still
    match the classic walker outside truncation."""
    from rfw_tpu.render import bvh_closest_hit
    from rfw_tpu.ops.traverse_items import twophase_closest_with_fallback

    scene = pack_trace_scene(
        [(0, sphere(quality=1), None), (1, cube(), None)],
        [(0, _random_instances(rng, 7)), (1, _random_instances(rng, 4))],
    )
    sd = scene_dev(scene)
    ps = prepare_pallas_scene(sd)
    o, d = make_rays(256, rng, origin_box=8.0, target_box=6.0)
    got = twophase_closest_with_fallback(
        ps, jnp.asarray(o), jnp.asarray(d), K=8, items_per_ray=4.0,
        n_inst_static=sd.inst_matrix.shape[0], interpret=True, dense=True)
    ref = bvh_closest_hit(sd, jnp.asarray(o), jnp.asarray(d))
    m_ref = np.asarray(ref.prim) >= 0
    assert (m_ref == (np.asarray(got.prim) >= 0)).all()
    np.testing.assert_allclose(np.asarray(got.t)[m_ref],
                               np.asarray(ref.t)[m_ref], rtol=1e-4, atol=1e-4)
