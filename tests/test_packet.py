"""Packet traversal (jnp tiles) + Pallas kernel (interpret mode) vs oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rfw_tpu.models import cube, sphere
from rfw_tpu.mathx import compose_trs, quat_identity
from rfw_tpu.render import pack_trace_scene, brute_force_closest
from rfw_tpu.render.pack import TraceScene
from rfw_tpu.render.packet import packet_closest_hit, packet_occluded, prepare_packet_scene


@pytest.fixture(scope="module")
def scene_and_rays():
    mesh = sphere(quality=1)
    box = cube()
    mats_a = [
        compose_trs(np.array([k * 2.5 - 2.5, 0, 0], np.float32), quat_identity(),
                    np.full(3, 0.5 + 0.3 * k, np.float32))
        for k in range(3)
    ]
    mats_b = [compose_trs(np.array([0, 2.5, 0], np.float32), quat_identity(),
                          np.ones(3, np.float32))]
    scene = pack_trace_scene(
        [(0, mesh, None), (1, box, None)],
        [(0, np.stack(mats_a)), (1, np.stack(mats_b))],
    )
    rng = np.random.default_rng(5)
    R = 1024
    o = rng.uniform(-5, 5, (R, 3)).astype(np.float32)
    o[:, 2] += 4
    tg = rng.uniform(-3, 3, (R, 3)).astype(np.float32)
    d = tg - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    def world_tris(scene):
        v0s, e1s, e2s = [], [], []
        for i in range(scene.num_instances):
            m = scene.inst_matrix[i]
            sel = scene.tri_mesh == scene.inst_mesh[i]
            v0s.append(scene.tri_v0[sel] @ m[:3, :3].T + m[:3, 3])
            e1s.append(scene.tri_e1[sel] @ m[:3, :3].T)
            e2s.append(scene.tri_e2[sel] @ m[:3, :3].T)
        return np.concatenate(v0s), np.concatenate(e1s), np.concatenate(e2s)

    t_ref, p_ref, _, _ = brute_force_closest(o, d, *world_tris(scene))
    return scene, o, d, t_ref, p_ref


class TestJnpPacket:
    def test_closest_matches_oracle(self, scene_and_rays):
        scene, o, d, t_ref, p_ref = scene_and_rays
        sd = TraceScene(*[jnp.asarray(x) for x in scene])
        ps = prepare_packet_scene(sd)
        hit = packet_closest_hit(ps, jnp.asarray(o), jnp.asarray(d), lanes=128)
        hm = np.asarray(hit.prim) >= 0
        assert (hm == (p_ref >= 0)).all()
        both = hm & (p_ref >= 0)
        np.testing.assert_allclose(np.asarray(hit.t)[both], t_ref[both],
                                   rtol=1e-4, atol=1e-5)

    def test_occlusion(self, scene_and_rays):
        scene, o, d, t_ref, p_ref = scene_and_rays
        sd = TraceScene(*[jnp.asarray(x) for x in scene])
        ps = prepare_packet_scene(sd)
        occ = packet_occluded(ps, jnp.asarray(o), jnp.asarray(d), 1e30, lanes=128)
        assert (np.asarray(occ) == (p_ref >= 0)).all()
        # t_limit shorter than every hit -> nothing occluded
        occ2 = packet_occluded(ps, jnp.asarray(o), jnp.asarray(d), 1e-4, lanes=128)
        assert not np.asarray(occ2).any()


class TestPallasInterpret:
    def test_closest_matches_oracle(self, scene_and_rays):
        from rfw_tpu.ops import prepare_pallas_scene, pallas_closest_hit

        scene, o, d, t_ref, p_ref = scene_and_rays
        sd = TraceScene(*[jnp.asarray(x) for x in scene])
        ps = prepare_pallas_scene(sd)
        hit = pallas_closest_hit(ps, jnp.asarray(o), jnp.asarray(d), interpret=True)
        hm = np.asarray(hit.prim) >= 0
        assert (hm == (p_ref >= 0)).all()
        both = hm & (p_ref >= 0)
        np.testing.assert_allclose(np.asarray(hit.t)[both], t_ref[both],
                                   rtol=1e-4, atol=1e-5)

    def test_occluded(self, scene_and_rays):
        from rfw_tpu.ops import prepare_pallas_scene, pallas_occluded

        scene, o, d, t_ref, p_ref = scene_and_rays
        sd = TraceScene(*[jnp.asarray(x) for x in scene])
        ps = prepare_pallas_scene(sd)
        occ = pallas_occluded(ps, jnp.asarray(o), jnp.asarray(d), 1e30, interpret=True)
        assert (np.asarray(occ) == (p_ref >= 0)).all()

    def test_tri_hbm_matches_oracle(self, scene_and_rays):
        """HBM-streamed-treelet tier: identical results to the resident
        kernel — the DMA'd leaf block must be byte-equivalent to the
        direct VMEM slice."""
        from rfw_tpu.ops import prepare_pallas_scene, pallas_closest_hit

        scene, o, d, t_ref, p_ref = scene_and_rays
        sd = TraceScene(*[jnp.asarray(x) for x in scene])
        ps = prepare_pallas_scene(sd)
        hit = pallas_closest_hit(ps, jnp.asarray(o), jnp.asarray(d),
                                 interpret=True, tri_hbm=True)
        hm = np.asarray(hit.prim) >= 0
        assert (hm == (p_ref >= 0)).all()
        both = hm & (p_ref >= 0)
        np.testing.assert_allclose(np.asarray(hit.t)[both], t_ref[both],
                                   rtol=1e-4, atol=1e-5)


def test_physics_world():
    from rfw_tpu.utils.physics import SphereWorld

    w = SphereWorld.new()
    w.add_sphere((0, 5, 0), radius=0.5)
    w.add_sphere((0.1, 8, 0), radius=0.5)
    for _ in range(300):
        w.step(1 / 60)
    # settled on the ground, not exploded
    assert (w.positions[:, 1] > 0.45).all() and (w.positions[:, 1] < 1.6).all()
    assert np.abs(w.velocities).max() < 1.0


def test_multitile_nstream_subprocess():
    """NSTREAM=16 (two-tile stream interleave + internal ray padding) is a
    separate compiled shape of the classic kernel; module constants bind at
    import, so it runs in a subprocess. Pins kernel==oracle at a ray count
    that does NOT divide the 2048-lane program (padding path)."""
    import os
    import subprocess
    import sys

    code = """
import numpy as np, jax.numpy as jnp
from rfw_tpu.models import sphere
from rfw_tpu.render import pack_trace_scene, brute_force_closest
from rfw_tpu.render.pack import TraceScene
from rfw_tpu.ops import prepare_pallas_scene, pallas_closest_hit, pallas_occluded
from rfw_tpu.mathx import compose_trs, quat_identity
mesh = sphere(quality=1)
m = compose_trs(np.zeros(3, np.float32), quat_identity(), np.ones(3, np.float32))
scene = pack_trace_scene([(0, mesh, None)], [(0, m[None])])
rng = np.random.default_rng(9)
R = 1024  # pads to one 2048-lane program
o = rng.uniform(-4, 4, (R, 3)).astype(np.float32); o[:, 2] += 3
d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
t_ref, p_ref, _, _ = brute_force_closest(o, d, scene.tri_v0, scene.tri_e1, scene.tri_e2)
sd = TraceScene(*[jnp.asarray(x) for x in scene])
ps = prepare_pallas_scene(sd)
hit = pallas_closest_hit(ps, jnp.asarray(o), jnp.asarray(d), interpret=True)
assert hit.t.shape == (R,)
hm = np.asarray(hit.prim) >= 0
assert (hm == (p_ref >= 0)).all()
both = hm & (p_ref >= 0)
np.testing.assert_allclose(np.asarray(hit.t)[both], t_ref[both], rtol=1e-4, atol=1e-5)
occ = np.asarray(pallas_occluded(ps, jnp.asarray(o), jnp.asarray(d), 1e30, interpret=True))
assert (occ == hm).all()
print("multitile ok")
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RFW_NSTREAM="16", JAX_PLATFORMS="cpu",
               JAX_PLATFORM_NAME="cpu",
               # no conftest in the subprocess: drop the axon plugin from
               # the path or a down tunnel hangs jax init (CLAUDE.md)
               PYTHONPATH=repo)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "multitile ok" in out.stdout
