"""Two-phase traversal, phase A: per-ray TLAS entry enumeration vs a
numpy all-instances oracle (round-3 building block; docs/ROUND2.md)."""

import numpy as np
import jax.numpy as jnp

from rfw_tpu.mathx import Aabb, aabb_transform, compose_trs, quat_identity
from rfw_tpu.models import cube, sphere
from rfw_tpu.render import pack_trace_scene
from rfw_tpu.render.twophase import tlas_entries

from tests.test_traversal import make_rays
from tests.test_tlas_device import _random_instances


def _oracle_entries(o, d, wmin, wmax, K):
    """All-instance slab entries, K nearest per ray."""
    inv = 1.0 / np.where(np.abs(d) < 1e-20, np.where(d < 0, -1e-20, 1e-20), d)
    t0 = (wmin[None] - o[:, None]) * inv[:, None]
    t1 = (wmax[None] - o[:, None]) * inv[:, None]
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    hit = (tn <= tf) & (tf > 1e-5)
    te = np.where(hit, np.maximum(tn, 0.0), np.inf)
    order = np.argsort(te, axis=1)[:, :K]
    ts = np.take_along_axis(te, order, axis=1)
    ins = np.where(np.isfinite(ts), order, -1)
    return ts, ins


def test_entries_match_oracle(rng):
    n_a, n_b = 11, 6
    mesh = sphere(quality=1)
    box = cube()
    mats_a = _random_instances(rng, n_a)
    mats_b = _random_instances(rng, n_b)
    scene = pack_trace_scene(
        [(0, mesh, None), (1, box, None)],
        [(0, mats_a), (1, mats_b)],
    )
    # instance world boxes exactly as pack computes them
    lmin = np.stack([(mesh if s == 0 else box).aabb_min
                     for s in scene.inst_mesh[:n_a + n_b]])
    lmax = np.stack([(mesh if s == 0 else box).aabb_max
                     for s in scene.inst_mesh[:n_a + n_b]])
    wb = aabb_transform(Aabb(lmin, lmax), scene.inst_matrix[:n_a + n_b])

    K = 8
    o, d = make_rays(512, rng, origin_box=8.0, target_box=6.0)
    got = tlas_entries(jnp.asarray(scene.tlas_wide_f),
                       jnp.asarray(scene.tlas_wide_i),
                       jnp.asarray(o), jnp.asarray(d), K=K)
    g_ts = np.asarray(got.t_entry)
    g_in = np.asarray(got.inst)
    e_ts, e_in = _oracle_entries(o, d, wb.min, wb.max, K)

    # entry COUNTS and the sorted t values agree; instance SETS agree
    # (ties can permute ids at equal t)
    np.testing.assert_allclose(
        np.where(np.isfinite(g_ts), g_ts, 1e30),
        np.where(np.isfinite(e_ts), e_ts, 1e30), rtol=1e-4, atol=1e-4)
    for r in range(0, 512, 7):
        got_set = set(int(i) for i in g_in[r] if i >= 0)
        exp_set = set(int(i) for i in e_in[r] if i >= 0)
        assert got_set == exp_set, (r, got_set, exp_set)


def test_single_instance_and_misses(rng):
    mesh = cube()
    scene = pack_trace_scene(
        [(0, mesh, None)], [(0, np.eye(4, dtype=np.float32)[None])])
    o = np.array([[0, 0, 4], [9, 9, 9]], np.float32)
    d = np.array([[0, 0, -1], [1, 0, 0]], np.float32)
    got = tlas_entries(jnp.asarray(scene.tlas_wide_f),
                       jnp.asarray(scene.tlas_wide_i),
                       jnp.asarray(o), jnp.asarray(d), K=4)
    ins = np.asarray(got.inst)
    ts = np.asarray(got.t_entry)
    assert ins[0, 0] == 0 and np.isfinite(ts[0, 0])
    assert (ins[0, 1:] == -1).all()
    assert (ins[1] == -1).all() and not np.isfinite(ts[1]).any()


def test_truncation_keeps_nearest(rng):
    """More overlapping instances than K: the kept K are the nearest."""
    n = 12
    mats = []
    for i in range(n):  # boxes stacked along the ray
        t = np.array([0, 0, -float(i)], np.float32)
        mats.append(compose_trs(t, quat_identity(), np.ones(3, np.float32)))
    mesh = cube()
    scene = pack_trace_scene([(0, mesh, None)], [(0, np.stack(mats))])
    o = np.array([[0, 0, 6.0]], np.float32)
    d = np.array([[0, 0, -1.0]], np.float32)
    K = 4
    got = tlas_entries(jnp.asarray(scene.tlas_wide_f),
                       jnp.asarray(scene.tlas_wide_i),
                       jnp.asarray(o), jnp.asarray(d), K=K)
    ins = np.asarray(got.inst)[0]
    ts = np.asarray(got.t_entry)[0]
    assert np.isfinite(ts).all()
    assert (np.diff(ts) >= -1e-6).all()  # ascending
    assert set(ins.tolist()) == {0, 1, 2, 3}  # the 4 nearest boxes


def test_twophase_matches_classic(rng):
    """Phase A+B end-to-end: the two-phase closest hit equals the classic
    two-level walker on multi-instance scenes (K large enough)."""
    from rfw_tpu.render import bvh_closest_hit
    from rfw_tpu.render.twophase import twophase_closest_hit
    from tests.test_traversal import scene_dev

    mesh = sphere(quality=1)
    box = cube()
    scene = pack_trace_scene(
        [(0, mesh, None), (1, box, None)],
        [(0, _random_instances(rng, 7)), (1, _random_instances(rng, 4))],
    )
    sd = scene_dev(scene)
    o, d = make_rays(512, rng, origin_box=8.0, target_box=6.0)
    ref = bvh_closest_hit(sd, jnp.asarray(o), jnp.asarray(d))
    got, trunc = twophase_closest_hit(sd, jnp.asarray(o), jnp.asarray(d), K=8)

    m_ref = np.asarray(ref.prim) >= 0
    m_got = np.asarray(got.prim) >= 0
    tr = np.asarray(trunc)
    # non-truncated rays agree exactly
    ok = ~tr
    assert (m_ref[ok] == m_got[ok]).all()
    both = ok & m_ref & m_got
    np.testing.assert_allclose(np.asarray(got.t)[both],
                               np.asarray(ref.t)[both],
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(got.prim)[both] == np.asarray(ref.prim)[both]).all()
    assert tr.mean() < 0.2  # truncation is the exception at K=8


def test_twophase_truncation_flag(rng):
    """With K smaller than the overlap depth, truncated rays are flagged
    (and the fallback contract is: retrace those with the classic kernel)."""
    from rfw_tpu.render import bvh_closest_hit
    from rfw_tpu.render.twophase import twophase_closest_hit
    from tests.test_traversal import scene_dev

    # 12 boxes stacked along -z; a ray entering all of them with K=2 can
    # only prove hits inside its nearest 2 entries
    n = 12
    mats = []
    for i in range(n):
        t = np.array([0, 0, -2.0 * i], np.float32)
        mats.append(compose_trs(t, quat_identity(), np.ones(3, np.float32)))
    mesh = cube()
    scene = pack_trace_scene([(0, mesh, None)], [(0, np.stack(mats))])
    sd = scene_dev(scene)
    o = jnp.asarray(np.array([[0, 0, 6.0]], np.float32))
    d = jnp.asarray(np.array([[0, 0, -1.0]], np.float32))
    got, trunc = twophase_closest_hit(sd, o, d, K=2)
    ref = bvh_closest_hit(sd, o, d)
    # the nearest box IS within the first entries here, so the hit agrees
    assert np.asarray(got.prim)[0] == np.asarray(ref.prim)[0]
    # merge semantics: combined result never closer than the truth
    assert np.asarray(got.t)[0] >= np.asarray(ref.t)[0] - 1e-5


# ------------------------------------------------- phase B: Pallas items path
class TestPallasItems:
    """ops.traverse_items: item packing + the fixed-instance Pallas kernel
    (interpret mode on CPU) vs the classic two-level walker."""

    def test_pack_invariants(self, rng):
        from rfw_tpu.ops.traverse_items import STILE, _pack_items

        N = 2048
        inst = rng.integers(-1, 5, N).astype(np.int32)
        # capacity = items + worst-case per-instance STILE alignment (the
        # production sizing, twophase_closest_fused) — STILE follows the
        # RFW_SSUB_ITEMS stream width
        C = -(-(N + 5 * STILE) // STILE) * STILE
        slot_item, stream_inst, ovf = _pack_items(jnp.asarray(inst), 5, C)
        slot_item = np.asarray(slot_item)
        stream_inst = np.asarray(stream_inst)
        ovf = np.asarray(ovf)
        placed = slot_item[slot_item >= 0]
        valid = set(np.where(inst >= 0)[0].tolist())
        # every valid item placed exactly once (no overflow at this size)
        assert len(placed) == len(set(placed.tolist()))
        assert set(placed.tolist()) == valid and not ovf.any()
        for s in range(C // STILE):
            seg = slot_item[s * STILE:(s + 1) * STILE]
            ins = set(inst[i] for i in seg if i >= 0)
            assert len(ins) <= 1  # stream sub-tiles are single-instance
            assert stream_inst[s] == (ins.pop() if ins else -1)
            occ = seg >= 0  # runs fill contiguously from the aligned start
            k = occ.sum()
            assert occ[:k].all() and not occ[k:].any()

    def test_pack_overflow_drops_not_corrupts(self, rng):
        from rfw_tpu.ops.traverse_items import _pack_items

        inst = rng.integers(-1, 5, 2048).astype(np.int32)
        slot_item, _, ovf = _pack_items(jnp.asarray(inst), 5, 1024)
        slot_item = np.asarray(slot_item)
        ovf = np.asarray(ovf)
        placed = slot_item[slot_item >= 0]
        assert len(placed) == len(set(placed.tolist()))
        assert len(placed) + ovf.sum() == (inst >= 0).sum()

    def test_matches_classic_interpret(self, rng):
        from rfw_tpu.render import bvh_closest_hit
        from rfw_tpu.ops import prepare_pallas_scene
        from rfw_tpu.ops.traverse_items import pallas_twophase_closest_hit
        from tests.test_traversal import scene_dev

        scene = pack_trace_scene(
            [(0, sphere(quality=1), None), (1, cube(), None)],
            [(0, _random_instances(rng, 7)), (1, _random_instances(rng, 4))],
        )
        sd = scene_dev(scene)
        ps = prepare_pallas_scene(sd)
        o, d = make_rays(256, rng, origin_box=8.0, target_box=6.0)
        got, trunc = pallas_twophase_closest_hit(
            ps, sd, jnp.asarray(o), jnp.asarray(d), K=4, capacity_tiles=4,
            interpret=True)
        ref = bvh_closest_hit(sd, jnp.asarray(o), jnp.asarray(d))

        tr = np.asarray(trunc)
        ok = ~tr
        m_ref = np.asarray(ref.prim) >= 0
        m_got = np.asarray(got.prim) >= 0
        assert (m_ref[ok] == m_got[ok]).all()
        both = ok & m_ref & m_got
        assert both.any()
        np.testing.assert_allclose(np.asarray(got.t)[both],
                                   np.asarray(ref.t)[both],
                                   rtol=1e-4, atol=1e-4)
        assert (np.asarray(got.prim)[both] == np.asarray(ref.prim)[both]).all()
        assert (np.asarray(got.inst)[both] == np.asarray(ref.inst)[both]).all()
        assert tr.mean() < 0.2

    def test_capacity_overflow_flags_truncated(self, rng):
        """A capacity too small for the item list drops items — affected
        rays must be flagged, unaffected rays still correct."""
        from rfw_tpu.render import bvh_closest_hit
        from rfw_tpu.ops import prepare_pallas_scene
        from rfw_tpu.ops.traverse_items import pallas_twophase_closest_hit
        from tests.test_traversal import scene_dev

        scene = pack_trace_scene(
            [(0, sphere(quality=1), None), (1, cube(), None)],
            [(0, _random_instances(rng, 7)), (1, _random_instances(rng, 4))],
        )
        sd = scene_dev(scene)
        ps = prepare_pallas_scene(sd)
        o, d = make_rays(256, rng, origin_box=8.0, target_box=6.0)
        got, trunc = pallas_twophase_closest_hit(
            ps, sd, jnp.asarray(o), jnp.asarray(d), K=4, capacity_tiles=1,
            interpret=True)
        ref = bvh_closest_hit(sd, jnp.asarray(o), jnp.asarray(d))
        tr = np.asarray(trunc)
        assert tr.any()  # 1 tile cannot hold 11 aligned runs
        ok = ~tr
        m_ref = np.asarray(ref.prim) >= 0
        m_got = np.asarray(got.prim) >= 0
        assert (m_ref[ok] == m_got[ok]).all()
        both = ok & m_ref & m_got
        np.testing.assert_allclose(np.asarray(got.t)[both],
                                   np.asarray(ref.t)[both],
                                   rtol=1e-4, atol=1e-4)

    def test_pallas_entries_match_jnp(self, rng):
        """ops.traverse_entries (phase-A Pallas kernel, interpret) agrees
        exactly with the jnp tlas_entries, including the empty-child-slot
        validity gate (inverted boxes must not insert phantom entries)."""
        from rfw_tpu.ops import prepare_pallas_scene
        from rfw_tpu.ops.traverse_entries import pallas_tlas_entries

        scene = pack_trace_scene(
            [(0, sphere(quality=1), None), (1, cube(), None)],
            [(0, _random_instances(rng, 7)), (1, _random_instances(rng, 4))],
        )
        from tests.test_traversal import scene_dev
        sd = scene_dev(scene)
        ps = prepare_pallas_scene(sd)
        R, K = 640, 4  # non-multiple of LANES exercises ray padding
        o, d = make_rays(R, rng, origin_box=8.0, target_box=6.0)
        got = pallas_tlas_entries(ps, jnp.asarray(o), jnp.asarray(d), K=K,
                                  interpret=True)
        ref = tlas_entries(jnp.asarray(sd.tlas_wide_f),
                           jnp.asarray(sd.tlas_wide_i),
                           jnp.asarray(o), jnp.asarray(d), K=K)
        g_ts = np.asarray(got.t_entry)
        g_in = np.asarray(got.inst)
        e_ts = np.asarray(ref.t_entry)
        np.testing.assert_allclose(
            np.where(np.isfinite(g_ts), g_ts, 1e30),
            np.where(np.isfinite(e_ts), e_ts, 1e30), rtol=1e-5, atol=1e-5)
        e_in = np.asarray(ref.inst)
        for r in range(0, R, 3):
            assert (set(i for i in g_in[r] if i >= 0)
                    == set(i for i in e_in[r] if i >= 0)), r


class TestFusedTwoPhase:
    """twophase_closest_fused / twophase_closest_with_fallback: the fully
    traceable product path (compact-before-sort pack + scatter-min merge +
    compacted classic-kernel retrace of truncated rays)."""

    def _scene(self, rng):
        from rfw_tpu.ops import prepare_pallas_scene
        from tests.test_traversal import scene_dev

        scene = pack_trace_scene(
            [(0, sphere(quality=1), None), (1, cube(), None)],
            [(0, _random_instances(rng, 7)), (1, _random_instances(rng, 4))],
        )
        sd = scene_dev(scene)
        return sd, prepare_pallas_scene(sd)

    def test_fused_matches_classic_outside_truncation(self, rng):
        from rfw_tpu.render import bvh_closest_hit
        from rfw_tpu.ops.traverse_items import twophase_closest_fused

        sd, ps = self._scene(rng)
        o, d = make_rays(256, rng, origin_box=8.0, target_box=6.0)
        got, trunc = twophase_closest_fused(
            ps, jnp.asarray(o), jnp.asarray(d), K=4, items_per_ray=4.0,
            n_inst_static=sd.inst_matrix.shape[0], interpret=True)
        ref = bvh_closest_hit(sd, jnp.asarray(o), jnp.asarray(d))
        tr = np.asarray(trunc)
        ok = ~tr
        m_ref = np.asarray(ref.prim) >= 0
        m_got = np.asarray(got.prim) >= 0
        assert (m_ref[ok] == m_got[ok]).all()
        both = ok & m_ref & m_got
        assert both.any()
        np.testing.assert_allclose(np.asarray(got.t)[both],
                                   np.asarray(ref.t)[both],
                                   rtol=1e-4, atol=1e-4)
        assert (np.asarray(got.prim)[both] == np.asarray(ref.prim)[both]).all()
        assert (np.asarray(got.inst)[both] == np.asarray(ref.inst)[both]).all()

    def test_fused_tri_hbm_matches_resident(self, rng):
        """tri_hbm items kernel: the DMA'd treelet staging must reproduce
        the VMEM-resident fused result exactly (hit mask, t, prim, inst,
        truncation flags)."""
        from rfw_tpu.ops.traverse_items import twophase_closest_fused

        sd, ps = self._scene(rng)
        o, d = make_rays(256, rng, origin_box=8.0, target_box=6.0)
        a, tr_a = twophase_closest_fused(
            ps, jnp.asarray(o), jnp.asarray(d), K=4, items_per_ray=4.0,
            n_inst_static=sd.inst_matrix.shape[0], interpret=True)
        b, tr_b = twophase_closest_fused(
            ps, jnp.asarray(o), jnp.asarray(d), K=4, items_per_ray=4.0,
            n_inst_static=sd.inst_matrix.shape[0], interpret=True,
            tri_hbm=True)
        assert (np.asarray(tr_a) == np.asarray(tr_b)).all()
        np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t),
                                   rtol=0, atol=0)
        assert (np.asarray(a.prim) == np.asarray(b.prim)).all()
        assert (np.asarray(a.inst) == np.asarray(b.inst)).all()

    def test_fallback_makes_every_ray_exact(self, rng):
        """With K below the overlap depth MANY rays truncate; the fallback
        retrace must make ALL rays equal the classic kernel."""
        from rfw_tpu.ops import prepare_pallas_scene
        from rfw_tpu.ops.traverse_items import (
            twophase_closest_fused, twophase_closest_with_fallback,
        )
        from tests.test_traversal import scene_dev

        # 12 unit spheres stacked along -z: a ray offset toward the AABB
        # corner enters every instance box but can miss every sphere —
        # with K=2 its full entry list truncates (the hit, or the miss,
        # lies beyond the last kept entry)
        mats = [compose_trs(np.array([0, 0, -2.0 * i], np.float32),
                            quat_identity(), np.ones(3, np.float32))
                for i in range(12)]
        scene = pack_trace_scene([(0, sphere(quality=1), None)],
                                 [(0, np.stack(mats))])
        sd = scene_dev(scene)
        ps = prepare_pallas_scene(sd)
        from rfw_tpu.render import bvh_closest_hit
        o, d = make_rays(255, rng, origin_box=3.0, target_box=2.0)
        # the corner ray enters every instance AABB but misses every
        # sphere -> full K=2 list + miss = truncated. (A silhouette-grazing
        # ray would NOT be a fair oracle check here: the Pallas Woop leaf
        # test and the lockstep walker legitimately differ by an epsilon
        # class on tangent hits — verified against the classic kernel.)
        crafted_o = np.array([[0.95, 0.95, 6.0]], np.float32)
        crafted_d = np.array([[0, 0, -1.0]], np.float32)
        o = np.concatenate([crafted_o, o])
        d = np.concatenate([crafted_d, d])
        ref = bvh_closest_hit(sd, jnp.asarray(o), jnp.asarray(d))
        ni = sd.inst_matrix.shape[0]
        _, trunc = twophase_closest_fused(
            ps, jnp.asarray(o), jnp.asarray(d), K=2, n_inst_static=ni,
            interpret=True)
        got = twophase_closest_with_fallback(
            ps, jnp.asarray(o), jnp.asarray(d), K=2, n_inst_static=ni,
            interpret=True)
        assert np.asarray(trunc).any()  # the fallback actually fires here
        m_ref = np.asarray(ref.prim) >= 0
        m_got = np.asarray(got.prim) >= 0
        assert (m_ref == m_got).all()
        both = m_ref & m_got
        np.testing.assert_allclose(np.asarray(got.t)[both],
                                   np.asarray(ref.t)[both],
                                   rtol=1e-4, atol=1e-4)
        assert (np.asarray(got.prim)[both] == np.asarray(ref.prim)[both]).all()

    def test_fused_per_ray_t_limit_and_dead_lanes(self, rng):
        """Dead lanes (t_limit 0) must come back as misses with t == 0 —
        the wavefront's masked-lane contract."""
        from rfw_tpu.ops.traverse_items import twophase_closest_with_fallback

        sd, ps = self._scene(rng)
        o, d = make_rays(128, rng, origin_box=8.0, target_box=6.0)
        tl = np.full(128, 1e30, np.float32)
        tl[::2] = 0.0
        got = twophase_closest_with_fallback(
            ps, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tl), K=4,
            n_inst_static=sd.inst_matrix.shape[0], interpret=True)
        prim = np.asarray(got.prim)
        t = np.asarray(got.t)
        assert (prim[::2] == -1).all()
        np.testing.assert_allclose(t[::2], 0.0)


def test_dense_entries_match_tree_walk(rng):
    """dense_tlas_entries (the (R,I) slab scan) agrees with the jnp TLAS
    walk: same entry counts, same ascending ts, same instance sets
    (ties may permute ids at equal t)."""
    from rfw_tpu.render.twophase import dense_tlas_entries

    mesh = sphere(quality=1)
    box = cube()
    scene = pack_trace_scene(
        [(0, mesh, None), (1, box, None)],
        [(0, _random_instances(rng, 9)), (1, _random_instances(rng, 5))],
    )
    K = 6
    o, d = make_rays(512, rng, origin_box=8.0, target_box=6.0)
    ref = tlas_entries(jnp.asarray(scene.tlas_wide_f),
                       jnp.asarray(scene.tlas_wide_i),
                       jnp.asarray(o), jnp.asarray(d), K=K)
    got = dense_tlas_entries(jnp.asarray(scene.inst_aabb_min),
                             jnp.asarray(scene.inst_aabb_max),
                             jnp.asarray(o), jnp.asarray(d), K=K)
    g_ts, e_ts = np.asarray(got.t_entry), np.asarray(ref.t_entry)
    np.testing.assert_allclose(
        np.where(np.isfinite(g_ts), g_ts, 1e30),
        np.where(np.isfinite(e_ts), e_ts, 1e30), rtol=1e-4, atol=1e-4)
    g_in, e_in = np.asarray(got.inst), np.asarray(ref.inst)
    for r in range(0, 512, 5):
        assert (set(i for i in g_in[r] if i >= 0)
                == set(i for i in e_in[r] if i >= 0)), r
    # per-ray t_limit: dead rays produce no entries
    tl = np.full(512, 0.0, np.float32)
    dead = dense_tlas_entries(jnp.asarray(scene.inst_aabb_min),
                              jnp.asarray(scene.inst_aabb_max),
                              jnp.asarray(o), jnp.asarray(d),
                              jnp.asarray(tl), K=K)
    assert (np.asarray(dead.inst) == -1).all()


class TestFusedOcclusion:
    """twophase_occluded_fused / twophase_occluded_with_fallback: the
    any-hit twin of the fused items path (bounce-vertex NEE shadow rays).
    Lean item kernel (prim-flag only) + per-ray OR merge + classic
    any-hit retrace of undecided rays."""

    def _scene(self, rng):
        from rfw_tpu.ops import prepare_pallas_scene
        from tests.test_traversal import scene_dev

        scene = pack_trace_scene(
            [(0, sphere(quality=1), None), (1, cube(), None)],
            [(0, _random_instances(rng, 7)), (1, _random_instances(rng, 4))],
        )
        sd = scene_dev(scene)
        return sd, prepare_pallas_scene(sd)

    def test_occluded_matches_classic(self, rng):
        from rfw_tpu.render.intersect import bvh_occluded
        from rfw_tpu.ops.traverse_items import twophase_occluded_with_fallback

        sd, ps = self._scene(rng)
        o, d = make_rays(256, rng, origin_box=8.0, target_box=6.0)
        # shadow-ray contract: mixed finite limits + dead lanes at 0
        tl = rng.uniform(0.5, 20.0, 256).astype(np.float32)
        tl[::5] = 0.0  # dead lanes cost nothing and stay unoccluded
        got = twophase_occluded_with_fallback(
            ps, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tl),
            K=4, items_per_ray=4.0,
            n_inst_static=sd.inst_matrix.shape[0], interpret=True)
        ref = bvh_occluded(sd, jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray(tl))
        assert (np.asarray(got) == np.asarray(ref)).all()
        assert not np.asarray(got)[::5].any()

    def test_occluded_fused_undecided_contract(self, rng):
        """K below the overlap depth: fused alone flags undecided rays
        (conservative, never falsely occluded); the fallback makes every
        ray exact."""
        from rfw_tpu.ops import prepare_pallas_scene
        from rfw_tpu.render.intersect import bvh_occluded
        from rfw_tpu.ops.traverse_items import (
            twophase_occluded_fused, twophase_occluded_with_fallback,
        )
        from tests.test_traversal import scene_dev

        mats = [compose_trs(np.array([0, 0, -2.0 * i], np.float32),
                            quat_identity(), np.ones(3, np.float32))
                for i in range(12)]
        scene = pack_trace_scene([(0, sphere(quality=1), None)],
                                 [(0, np.stack(mats))])
        sd = scene_dev(scene)
        ps = prepare_pallas_scene(sd)
        rng2 = np.random.default_rng(7)
        o = np.stack([rng2.uniform(-0.95, 0.95, 64),
                      rng2.uniform(-0.95, 0.95, 64),
                      np.full(64, 6.0)], axis=1).astype(np.float32)
        d = np.tile(np.array([[0, 0, -1.0]], np.float32), (64, 1))
        tl = np.full(64, 40.0, np.float32)
        occ, und = twophase_occluded_fused(
            ps, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tl),
            K=2, items_per_ray=2.0,
            n_inst_static=sd.inst_matrix.shape[0], interpret=True)
        ref = np.asarray(bvh_occluded(sd, jnp.asarray(o), jnp.asarray(d),
                                      jnp.asarray(tl)))
        occ = np.asarray(occ)
        und = np.asarray(und)
        # fused never claims occlusion falsely, and every miss it cannot
        # prove is flagged undecided
        assert not (occ & ~ref).any()
        assert (ref[~occ] <= und[~occ]).all()
        got = np.asarray(twophase_occluded_with_fallback(
            ps, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tl),
            K=2, items_per_ray=2.0,
            n_inst_static=sd.inst_matrix.shape[0], interpret=True))
        assert (got == ref).all()


class TestOddGridBatch:
    def test_matches_classic_at_batch_3(self, rng, monkeypatch):
        """Grid batches that are not multiples of 8 must still be exact:
        Mosaic requires the windowed SMEM `sinst` block's row count % 8
        == 0, so _run_items_arrays repacks step i's rows to offset
        i*batch8 (batch8 = batch rounded up to 8). batch=3 forces the
        repack; parity vs the classic walker pins the layout."""
        from rfw_tpu.render import bvh_closest_hit
        from rfw_tpu.ops import prepare_pallas_scene, traverse
        from rfw_tpu.ops.traverse_items import pallas_twophase_closest_hit
        from tests.test_traversal import scene_dev

        monkeypatch.setattr(traverse, "_CHUNK_PINNED", True)
        monkeypatch.setattr(traverse, "CHUNK_TILES", 3)

        scene = pack_trace_scene(
            [(0, sphere(quality=1), None), (1, cube(), None)],
            [(0, _random_instances(rng, 7)), (1, _random_instances(rng, 4))],
        )
        sd = scene_dev(scene)
        ps = prepare_pallas_scene(sd)
        o, d = make_rays(256, rng, origin_box=8.0, target_box=6.0)
        got, trunc = pallas_twophase_closest_hit(
            ps, sd, jnp.asarray(o), jnp.asarray(d), K=4, capacity_tiles=4,
            interpret=True)
        ref = bvh_closest_hit(sd, jnp.asarray(o), jnp.asarray(d))
        ok = ~np.asarray(trunc)
        m_ref = np.asarray(ref.prim) >= 0
        m_got = np.asarray(got.prim) >= 0
        assert (m_ref[ok] == m_got[ok]).all()
        both = ok & m_ref & m_got
        assert both.any()
        np.testing.assert_allclose(np.asarray(got.t)[both],
                                   np.asarray(ref.t)[both],
                                   rtol=1e-4, atol=1e-4)
        assert (np.asarray(got.prim)[both]
                == np.asarray(ref.prim)[both]).all()
