"""Device LBVH builder invariants (accel/lbvh.py — Morton + Karras tree)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rfw_tpu.accel.lbvh import build_lbvh_device, morton_codes
from rfw_tpu.accel.bvh_cpu import triangle_aabbs
from rfw_tpu.models import sphere


@pytest.fixture(scope="module")
def tri_boxes():
    m = sphere(quality=2)
    v = m.tri_vertices()
    return triangle_aabbs(v[:, 0], v[:, 1], v[:, 2])


def _walk(bvh, n):
    """Walk the tree from root 0; return visit counts per node + leaf prims."""
    node_left = np.asarray(bvh.node_left)
    node_right = np.asarray(bvh.node_right)
    node_count = np.asarray(bvh.node_count)
    visits = np.zeros(node_left.shape[0], np.int32)
    prims = []
    stack = [0]
    while stack:
        i = stack.pop()
        visits[i] += 1
        if node_count[i] > 0:
            prims.append(int(node_left[i]))
        else:
            stack.append(int(node_left[i]))
            stack.append(int(node_right[i]))
    return visits, prims


class TestLbvh:
    def test_structure(self, tri_boxes):
        mn, mx = tri_boxes
        n = mn.shape[0]
        bvh = build_lbvh_device(jnp.asarray(mn), jnp.asarray(mx))
        assert bvh.node_min.shape[0] == 2 * n - 1
        # prim_order is a permutation
        po = np.sort(np.asarray(bvh.prim_order))
        assert (po == np.arange(n)).all()
        # every node reachable exactly once; leaves cover sorted positions
        visits, prims = _walk(bvh, n)
        assert (visits == 1).all()
        assert sorted(prims) == list(range(n))

    def test_aabbs_contain_children(self, tri_boxes):
        mn, mx = tri_boxes
        n = mn.shape[0]
        bvh = build_lbvh_device(jnp.asarray(mn), jnp.asarray(mx))
        nmin = np.asarray(bvh.node_min)
        nmax = np.asarray(bvh.node_max)
        nl = np.asarray(bvh.node_left)
        nr = np.asarray(bvh.node_right)
        nc = np.asarray(bvh.node_count)
        internal = np.nonzero(nc == 0)[0]
        eps = 1e-5
        for i in internal:
            for c in (nl[i], nr[i]):
                assert (nmin[i] <= nmin[c] + eps).all(), (i, c)
                assert (nmax[i] >= nmax[c] - eps).all(), (i, c)
        # leaves carry the right primitive boxes
        po = np.asarray(bvh.prim_order)
        leaf_idx = np.nonzero(nc == 1)[0]
        for li in leaf_idx[:64]:
            j = nl[li]  # position in sorted order
            p = po[j]
            np.testing.assert_allclose(nmin[li], mn[p], atol=1e-6)
            np.testing.assert_allclose(nmax[li], mx[p], atol=1e-6)

    def test_root_covers_scene(self, tri_boxes):
        mn, mx = tri_boxes
        bvh = build_lbvh_device(jnp.asarray(mn), jnp.asarray(mx))
        np.testing.assert_allclose(np.asarray(bvh.node_min[0]), mn.min(0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(bvh.node_max[0]), mx.max(0), atol=1e-5)

    def test_small_counts(self):
        for n in (1, 2, 3, 5, 17):
            rng = np.random.default_rng(n)
            c = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
            mn = c - 0.05
            mx = c + 0.05
            bvh = build_lbvh_device(jnp.asarray(mn), jnp.asarray(mx))
            visits, prims = _walk(bvh, n)
            assert sorted(prims) == list(range(n))

    def test_morton_orders_spatially(self):
        # points along x axis must sort monotonically in morton order
        pts = np.zeros((16, 3), np.float32)
        pts[:, 0] = np.linspace(0, 1, 16)
        codes = np.asarray(morton_codes(
            jnp.asarray(pts), jnp.zeros(3), jnp.ones(3)
        ))
        assert (np.diff(codes.astype(np.int64)) >= 0).all()
