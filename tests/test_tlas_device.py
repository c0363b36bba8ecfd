"""Device-side 8-ary TLAS (SURVEY §7 stage 5: per-frame TLAS from instance
matrices under jit; reference TLAS-only refit per synchronize, gpu-rt
lib.rs:1570-1581)."""

import numpy as np
import jax.numpy as jnp

from rfw_tpu.accel.tlas_device import build_tlas8_device, tlas8_node_count
from rfw_tpu.mathx import compose_trs, quat_identity
from rfw_tpu.models import cube, sphere
from rfw_tpu.render import pack_trace_scene
from rfw_tpu.render.pack import TraceScene
from rfw_tpu.render.intersect import brute_force_closest

from tests.test_traversal import make_rays, world_tris


def _random_instances(rng, n):
    mats = []
    for _ in range(n):
        t = rng.uniform(-6, 6, 3).astype(np.float32)
        s = rng.uniform(0.3, 1.4, 3).astype(np.float32)
        mats.append(compose_trs(t, quat_identity(), s))
    return np.stack(mats)


class TestTreeInvariants:
    def test_every_instance_reachable_once_and_contained(self, rng):
        n = 23  # forces two levels + padding
        m = _random_instances(rng, n)
        lmin = np.tile(np.array([-1, -1, -1], np.float32), (n, 1))
        lmax = np.tile(np.array([1, 1, 1], np.float32), (n, 1))
        box, code, cnt = (np.asarray(a) for a in build_tlas8_device(
            jnp.asarray(m), jnp.asarray(lmin), jnp.asarray(lmax)))
        assert box.shape[0] == tlas8_node_count(n)

        seen = []

        def walk(node, pmin, pmax):
            for c in range(8):
                bmin = box[node, 6 * c:6 * c + 3]
                bmax = box[node, 6 * c + 3:6 * c + 6]
                cd = code[node, c]
                if not np.all(bmin <= bmax):
                    continue  # empty slot
                assert np.all(bmin >= pmin - 1e-4) and np.all(bmax <= pmax + 1e-4)
                if cd >= 0:
                    walk(cd, bmin, bmax)
                else:
                    seen.append(-cd - 1)

        walk(0, np.full(3, -np.inf), np.full(3, np.inf))
        assert sorted(seen) == list(range(n))

    def test_single_instance(self, rng):
        m = _random_instances(rng, 1)
        box, code, cnt = build_tlas8_device(
            jnp.asarray(m), jnp.asarray(np.full((1, 3), -1, np.float32)),
            jnp.asarray(np.ones((1, 3), np.float32)))
        assert np.asarray(code)[0, 0] == -1  # leaf instance 0 (= -(0+1))
        assert (np.asarray(cnt)[0] == np.array([1, 0, 0, 0, 0, 0, 0, 0])).all()


class TestTraversalParity:
    def test_pallas_with_device_tlas_matches_oracle(self, rng):
        """Swap the packed scene's host-built TLAS supernodes for the
        device 8-ary build; the Pallas kernel must still match brute
        force."""
        from rfw_tpu.ops.traverse import (
            pallas_closest_hit, prepare_pallas_scene,
        )

        mesh = sphere(quality=1)
        box = cube()
        n_a, n_b = 9, 5
        mats_a = _random_instances(rng, n_a)
        mats_b = _random_instances(rng, n_b)
        scene = pack_trace_scene(
            [(0, mesh, None), (1, box, None)],
            [(0, mats_a), (1, mats_b)],
        )
        lmin = np.stack(
            [(mesh if s == 0 else box).aabb_min for s in scene.inst_mesh])
        lmax = np.stack(
            [(mesh if s == 0 else box).aabb_max for s in scene.inst_mesh])
        b8, c8, n8 = build_tlas8_device(
            jnp.asarray(scene.inst_matrix), jnp.asarray(lmin),
            jnp.asarray(lmax))
        swapped = scene._replace(
            tlas8_box=np.asarray(b8), tlas8_code=np.asarray(c8),
            tlas8_cnt=np.asarray(n8))
        sd = TraceScene(*[jnp.asarray(x) for x in swapped])
        ps = prepare_pallas_scene(sd)

        o, d = make_rays(1024, rng, origin_box=8.0, target_box=7.0)
        hit = pallas_closest_hit(ps, jnp.asarray(o), jnp.asarray(d),
                                 interpret=True)
        wv0, we1, we2 = world_tris(scene)
        t_ref, p_ref, _, _ = brute_force_closest(o, d, wv0, we1, we2)
        mask = np.asarray(hit.prim) >= 0
        assert (mask == (p_ref >= 0)).all()
        np.testing.assert_allclose(
            np.asarray(hit.t)[mask], t_ref[mask], rtol=1e-3, atol=1e-4)


class TestInstancingScale:
    def test_10k_instances_pack_and_device_tlas(self, rng):
        """Reference claims 'decent performance, even with >=10k instances'
        (README.md:10). Pack 10k instances, repack for motion, build the
        device TLAS, and trace a few rays correctly."""
        import time

        from rfw_tpu.models import cube
        from rfw_tpu.render.pack import repack_instances
        from rfw_tpu.ops.traverse import pallas_scene_bytes

        n = 10_000
        mesh = cube()
        mats = _random_instances(rng, n)
        t0 = time.perf_counter()
        scene = pack_trace_scene([(0, mesh, None)], [(0, mats)])
        t_pack = time.perf_counter() - t0
        # instance arenas are capacity-padded; the real prefix is marked
        # by inst_mesh >= 0 (padding fill = -1)
        assert int((scene.inst_mesh >= 0).sum()) == n

        # instance-motion repack (the per-frame path)
        mats2 = mats.copy()
        mats2[:, 0, 3] += 0.25
        t0 = time.perf_counter()
        scene2 = repack_instances(
            scene, [(0, mesh.aabb_min, mesh.aabb_max)], [(0, mats2)])
        t_repack = time.perf_counter() - t0
        assert t_repack < t_pack + 5.0  # sanity: repack not worse than pack

        # device TLAS over all 10k
        lmin = np.tile(mesh.aabb_min, (n, 1))
        lmax = np.tile(mesh.aabb_max, (n, 1))
        box, code, cnt = build_tlas8_device(
            jnp.asarray(mats2), jnp.asarray(lmin), jnp.asarray(lmax))
        assert np.asarray(cnt).sum() == n  # every instance is a leaf once

        # targeted sanity rays through the lockstep tier (the full oracle
        # is O(instances x tris) — covered at smaller counts above): a ray
        # aimed at a known instance's center must hit near it, a ray fired
        # away from the cloud must miss
        from rfw_tpu.render import bvh_closest_hit

        centers = mats2[:4, :3, 3]
        o = np.tile(np.array([[0, 0, 40.0]], np.float32), (5, 1))
        d = np.concatenate([
            (centers - o[:4]) / np.linalg.norm(centers - o[:4], axis=-1,
                                               keepdims=True),
            np.array([[0, 0, 1.0]], np.float32),  # away from everything
        ]).astype(np.float32)
        sd = TraceScene(*[jnp.asarray(x) for x in scene2])
        hit = bvh_closest_hit(sd, jnp.asarray(o), jnp.asarray(d))
        prim = np.asarray(hit.prim)
        assert (prim[:4] >= 0).all(), "rays at instance centers must hit"
        assert prim[4] == -1, "the escape ray must miss" 
