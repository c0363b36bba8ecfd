"""On-device dynamic geometry (render/refit_device.py).

Parity contract: after a pose change, apply_dynamic's device-refit scene
must match a fresh HOST pack (skin_mesh_attributes + C++/python BLAS
refit + TLAS rebuild) on every field the tracer reads — same topology by
construction (the BLAS cache pins it), so arrays compare directly.
Backend-level: a TpuBackend with device_dynamics must render the same
images as the round-2 host path.
"""

import numpy as np
import pytest

from rfw_tpu.backend.structs import InstancesView3D, SkinView
from rfw_tpu.mathx import compose_trs, quat_identity
from rfw_tpu.models.primitives import sphere
from rfw_tpu.render.pack import pack_trace_scene
from tests.test_skinning import _quad_mesh, _rot_x


def _skinned_sphere(rng, J=5):
    """A sphere mesh with random smooth skinning over J joints."""
    m = sphere(quality=2)
    V = m.positions.shape[0]
    joints = rng.integers(0, J, (V, 4)).astype(np.int32)
    w = rng.random((V, 4)).astype(np.float32) + 0.05
    weights = (w / w.sum(-1, keepdims=True)).astype(np.float32)
    m.joints = joints
    m.weights = weights
    return m


def _pose(rng, J, scale=0.4):
    jm = np.zeros((J, 4, 4), np.float32)
    for j in range(J):
        jm[j, :3, :3] = np.eye(3) + rng.normal(size=(3, 3)) * scale
        jm[j, :3, 3] = rng.normal(size=3) * scale
        jm[j, 3, 3] = 1.0
    return jm


@pytest.fixture
def rng():
    return np.random.default_rng(5)


class TestApplyDynamicParity:
    def test_device_refit_matches_host_pack(self, rng):
        import jax
        import jax.numpy as jnp

        from rfw_tpu.render.refit_device import (
            apply_dynamic, build_tlas_plan, build_unit_plan,
        )
        from rfw_tpu.render.tpu_backend import skin_mesh_attributes

        J = 5
        mesh = _skinned_sphere(rng, J)
        cube_m = compose_trs(np.array([8, 0, 0], np.float32),
                             quat_identity(), np.ones(3, np.float32))
        from rfw_tpu.models.primitives import cube

        inst_skin = np.eye(4, dtype=np.float32)[None]
        blas_cache = {}
        ranges = {}
        rest = pack_trace_scene(
            [(0, mesh, None), (1, cube(), None)],
            [(0, inst_skin), (1, cube_m[None])],
            built_blas_out=blas_cache,
            mesh_ranges_out=ranges,
        )

        plan = build_unit_plan(
            rest, ranges[0], mesh.positions, mesh.normals, mesh.tangents,
            mesh.joints, mesh.weights, None,
        )
        lo, hi = ranges[0]["inst"]
        plan = plan._replace(inst_rows=np.arange(lo, hi, dtype=np.int32))
        tlas_plan = build_tlas_plan(rest)

        jm = _pose(rng, J)
        got = jax.jit(apply_dynamic)(
            jax.tree.map(jnp.asarray, rest), (plan,), tlas_plan,
            (jnp.asarray(jm),), (None,),
        )

        # expected: full host pack of the posed mesh with the CACHED blas
        # topology (refit path) — identical topology, comparable arrays
        pos, nrm, tan = skin_mesh_attributes(mesh, jm)
        exp = pack_trace_scene(
            [(0, mesh, blas_cache[0]), (1, cube(), blas_cache[1])],
            [(0, inst_skin), (1, cube_m[None])],
            deformed_positions={0: pos},
            deformed_attrs={0: (nrm, tan)},
        )

        for f in ["tri_v0", "tri_e1", "tri_e2", "tri_shade", "tri_lodf",
                  "blas_min", "blas_max", "blas_wide_f", "blas8_box",
                  "inst_aabb_min", "inst_aabb_max"]:
            g = np.asarray(getattr(got, f))
            e = np.asarray(getattr(exp, f))
            # empty-box sentinels differ cosmetically (+-inf device vs
            # +-FLT_MAX native C++ collapse) — canonicalize before compare
            big = 1e30
            fin = np.abs(e) < big
            assert ((np.abs(g) < big) == fin).all(), f
            assert (np.sign(g[~fin]) == np.sign(e[~fin])).all(), f
            np.testing.assert_allclose(g[fin], e[fin], rtol=1e-4, atol=1e-4,
                                       err_msg=f)

        # TLAS topology may legitimately differ between a rest-pose build
        # (device keeps it) and a posed rebuild; require the refit device
        # TLAS to be CONSISTENT instead: every leaf box equals its
        # instance box and every parent contains its children
        tmin = np.asarray(got.tlas_min)
        tmax = np.asarray(got.tlas_max)
        cnt = np.asarray(rest.tlas_count)
        left = np.asarray(rest.tlas_left)
        right = np.asarray(rest.tlas_right)
        prim = np.asarray(rest.tlas_prim)
        gi_min = np.asarray(got.inst_aabb_min)
        gi_max = np.asarray(got.inst_aabb_max)
        n_log = int((np.asarray(rest.inst_mesh) >= 0).sum())
        seen = [0]
        while seen:
            n = seen.pop()
            if cnt[n] > 0:
                inst = prim[left[n]]
                np.testing.assert_allclose(tmin[n], gi_min[inst], atol=1e-5)
                np.testing.assert_allclose(tmax[n], gi_max[inst], atol=1e-5)
            else:
                l, r = left[n], right[n]
                assert (tmin[n] <= tmin[l] + 1e-5).all()
                assert (tmax[n] >= tmax[l] - 1e-5).all()
                assert (tmin[n] <= tmin[r] + 1e-5).all()
                assert (tmax[n] >= tmax[r] - 1e-5).all()
                seen += [int(l), int(r)]
        assert n_log == 2

    def test_refit_scene_traces_like_host_pack(self, rng):
        """Hit-level check: lockstep traversal over the device-refit scene
        agrees with the host-packed posed scene for random rays."""
        import jax
        import jax.numpy as jnp

        from rfw_tpu.render import bvh_closest_hit
        from rfw_tpu.render.refit_device import (
            apply_dynamic, build_tlas_plan, build_unit_plan,
        )
        from rfw_tpu.render.tpu_backend import skin_mesh_attributes

        J = 4
        mesh = _skinned_sphere(rng, J)
        blas_cache = {}
        ranges = {}
        inst = np.stack([
            compose_trs(np.array([2.5 * i, 0, 0], np.float32),
                        quat_identity(), np.ones(3, np.float32))
            for i in range(3)
        ])
        rest = pack_trace_scene([(0, mesh, None)], [(0, inst)],
                                built_blas_out=blas_cache,
                                mesh_ranges_out=ranges)
        plan = build_unit_plan(
            rest, ranges[0], mesh.positions, mesh.normals, mesh.tangents,
            mesh.joints, mesh.weights, None,
        )
        lo, hi = ranges[0]["inst"]
        plan = plan._replace(inst_rows=np.arange(lo, hi, dtype=np.int32))
        tlas_plan = build_tlas_plan(rest)

        jm = _pose(rng, J, scale=0.25)
        got = jax.jit(apply_dynamic)(
            jax.tree.map(jnp.asarray, rest), (plan,), tlas_plan,
            (jnp.asarray(jm),), (None,),
        )

        pos, nrm, tan = skin_mesh_attributes(mesh, jm)
        exp = pack_trace_scene([(0, mesh, blas_cache[0])], [(0, inst)],
                               deformed_positions={0: pos},
                               deformed_attrs={0: (nrm, tan)})

        R = 256
        o = rng.normal(size=(R, 3)).astype(np.float32) * 4 + [2.5, 0, 6]
        tgt = rng.normal(size=(R, 3)).astype(np.float32) * 2 + [2.5, 0, 0]
        d = tgt - o
        d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)

        hg = bvh_closest_hit(got, jnp.asarray(o), jnp.asarray(d))
        he = bvh_closest_hit(jax.tree.map(jnp.asarray, exp),
                             jnp.asarray(o), jnp.asarray(d))
        assert (np.asarray(hg.prim) == np.asarray(he.prim)).all()
        assert (np.asarray(hg.inst) == np.asarray(he.inst)).all()
        m = np.asarray(he.prim) >= 0
        assert m.any()
        np.testing.assert_allclose(np.asarray(hg.t)[m], np.asarray(he.t)[m],
                                   rtol=1e-4, atol=1e-4)


class TestBackendDeviceDynamics:
    def _backend(self, device_dynamics, mesh, pose_a):
        from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings

        be = TpuBackend(32, 32, TpuSettings(
            samples_per_frame=1, pixel_center=True,
            device_dynamics=device_dynamics))
        be.set_3d_meshes([(0, mesh)])
        be.set_skins([(0, SkinView(joint_matrices=pose_a))])
        be.set_3d_instances([(0, InstancesView3D(
            matrices=np.eye(4, dtype=np.float32)[None],
            skin_ids=np.array([0], np.int32),
            changed=np.array([True]),
            local_aabb_min=mesh.aabb_min, local_aabb_max=mesh.aabb_max,
        ))])
        be.synchronize()
        return be

    def test_backend_fast_path_matches_host_path(self):
        from rfw_tpu.backend.contract import RenderMode
        from rfw_tpu.scene.camera import Camera3D

        mesh = _quad_mesh()
        rest = np.eye(4, dtype=np.float32)[None]
        posed = _rot_x(-90.0)[None].astype(np.float32)
        cam = Camera3D(fov=60).look_at(
            np.array([0.5, 2.0, 0.6], np.float32),
            np.array([0.5, 0.0, -0.5], np.float32))

        frames = {}
        for dyn in (True, False):
            be = self._backend(dyn, mesh, rest)
            # second skin update: the dyn backend must take the device
            # path (scene_host stays at rest pose), the host backend
            # repacks
            be.set_skins([(0, SkinView(joint_matrices=posed))])
            be.synchronize()
            if dyn:
                assert be._dyn is not None
                assert "tri_shade" in be._dev_stale  # device path ran
            frames[dyn] = be.render(
                None, cam.get_view(32, 32), RenderMode.NORMAL)
        # identical math on both paths -> at most LSB quantization skew
        diff = np.abs(frames[True].astype(int) - frames[False].astype(int))
        assert diff.max() <= 1, diff.max()

    def test_backend_morph_fast_path_matches_host_path(self):
        from rfw_tpu.backend.contract import RenderMode
        from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings
        from rfw_tpu.scene.camera import Camera3D

        mesh = _quad_mesh()
        mesh.joints = None
        mesh.weights = None
        # one morph target: fold the quad forward along +Z
        delta = np.zeros((1, 4, 3), np.float32)
        delta[0, :, 2] = [0.0, 0.0, 0.8, 0.8]
        mesh.morph_targets = delta

        cam = Camera3D(fov=60).look_at(
            np.array([0.5, 0.5, 3.0], np.float32),
            np.array([0.5, 0.5, 0.0], np.float32))

        def inst(w):
            return InstancesView3D(
                matrices=np.eye(4, dtype=np.float32)[None],
                skin_ids=np.full(1, -1, np.int32),
                changed=np.array([True]),
                morph_weights=np.array([[w]], np.float32),
                local_aabb_min=mesh.aabb_min, local_aabb_max=mesh.aabb_max,
            )

        frames = {}
        for dyn in (True, False):
            be = TpuBackend(32, 32, TpuSettings(
                samples_per_frame=1, pixel_center=True,
                device_dynamics=dyn))
            be.set_3d_meshes([(0, mesh)])
            be.set_3d_instances([(0, inst(0.0))])
            be.synchronize()
            be.set_3d_instances([(0, inst(1.0))])
            be.synchronize()
            if dyn:
                assert be._dyn is not None
                assert "tri_shade" in be._dev_stale
            frames[dyn] = be.render(
                None, cam.get_view(32, 32), RenderMode.NORMAL)
        diff = np.abs(frames[True].astype(int) - frames[False].astype(int))
        assert diff.max() <= 1, diff.max()
