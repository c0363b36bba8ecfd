"""Device instance-motion path (VERDICT round-3 item 6).

The reference rebuilds its TLAS on host from instance AABBs every
synchronize (backends/gpu-rt/src/lib.rs:1570-1581). rfw_tpu's fast path
(`TpuBackend._try_device_motion` + `refit_device.instance_motion_update`)
keeps the TLAS topologies from the last host build and refits every mirror
(binary / 2-wide / 8-ary boxes, instance matrices/inverses/normals/AABBs)
ON DEVICE in one jit — steady-state motion uploads one matrix array and
does zero host TLAS work. Refit boxes always bound, so images must match
the host SAH-rebuild path exactly.
"""

import numpy as np

import rfw_tpu.render.tpu_backend as tb
from rfw_tpu.backend.contract import RenderMode
from rfw_tpu.backend.structs import InstancesView3D
from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings
from rfw_tpu.scene.camera import Camera3D
from tests.test_skinning import _quad_mesh

W, H = 64, 48
CAM = Camera3D(fov=60).look_at(np.array([1.5, 1.5, 5.0], np.float32),
                               np.array([1.5, 0.3, 0.0], np.float32))


def _settings(**kw):
    # motion_min_instances=0: tests pin the device fast path at tiny
    # instance counts (the production gate routes small pools to the
    # faster host rebuild — measured 82.5 vs 67.7 ms/frame at 13
    # instances on chip, docs/ROUND4.md)
    kw.setdefault("motion_min_instances", 0)
    return TpuSettings(samples_per_frame=1, max_bounces=0,
                       pixel_center=True, **kw)


def _static_mesh():
    mesh = _quad_mesh()
    mesh.joints = None
    mesh.weights = None
    return mesh


def _instances(offsets):
    mats = np.stack([np.eye(4, dtype=np.float32) for _ in offsets])
    for i, (x, y) in enumerate(offsets):
        mats[i, 0, 3] = x
        mats[i, 1, 3] = y
    mesh = _static_mesh()
    return InstancesView3D(
        matrices=mats,
        skin_ids=np.full(len(offsets), -1, np.int32),
        changed=np.ones(len(offsets), bool),
        local_aabb_min=mesh.aabb_min, local_aabb_max=mesh.aabb_max,
    )


def _feed(be, mesh, iv):
    from rfw_tpu.scene.materials import Materials

    be.set_materials(Materials().to_device(), [0])
    be.set_3d_meshes([(0, mesh)])
    be.set_3d_instances([(0, iv)])
    be.synchronize()


def _render(be):
    return be.render(None, CAM.get_view(W, H), RenderMode.NORMAL)


def test_motion_fast_path_matches_host_rebuild():
    """Moving instances through the device refit path renders the same
    pixels as the host SAH rebuild (boxes differ, hits cannot)."""
    frames = {}
    for dm in (True, False):
        be = TpuBackend(W, H, _settings(device_motion=dm))
        _feed(be, _static_mesh(), _instances([(0, 0), (2, 0), (1, 1)]))
        _render(be)
        # two motion steps (steady state: second step reuses the armed jit)
        for step in (0.4, 0.9):
            be.set_3d_instances(
                [(0, _instances([(0, step), (2 - step, 0), (1, 1 + step)]))])
            be.synchronize()
            frames[dm] = _render(be)
        if dm:
            assert be._motion is not None  # fast path actually armed
    assert np.array_equal(frames[True], frames[False])


def test_motion_steady_state_zero_host_repack(monkeypatch):
    """After the initial pack, motion syncs must never call the host
    repack (the VERDICT 'zero host TLAS repack' criterion)."""
    calls = {"n": 0}
    real = tb.repack_instances

    def counted(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(tb, "repack_instances", counted)
    be = TpuBackend(W, H, _settings(device_motion=True))
    _feed(be, _static_mesh(), _instances([(0, 0), (2, 0)]))
    for f in range(1, 5):
        be.set_3d_instances([(0, _instances([(0.1 * f, 0), (2, 0.1 * f)]))])
        be.synchronize()
    assert calls["n"] == 0
    assert be._motion_syncs == 4


def test_motion_rebuild_every_refreshes_topology(monkeypatch):
    """motion_rebuild_every=2 sends every 2nd motion sync through the
    host rebuild; images stay identical either way."""
    calls = {"n": 0}
    real = tb.repack_instances

    def counted(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(tb, "repack_instances", counted)
    be = TpuBackend(W, H, _settings(device_motion=True,
                                    motion_rebuild_every=2))
    _feed(be, _static_mesh(), _instances([(0, 0), (2, 0)]))
    for f in range(1, 5):
        be.set_3d_instances([(0, _instances([(0.1 * f, 0), (2, 0.1 * f)]))])
        be.synchronize()
    assert calls["n"] == 2  # syncs 2 and 4 rebuilt on host


def test_motion_instance_set_change_falls_back():
    """Adding an instance (count change) forces the full repack; the next
    motion-only sync re-arms the fast path on the new layout."""
    be = TpuBackend(W, H, _settings(device_motion=True))
    _feed(be, _static_mesh(), _instances([(0, 0), (2, 0)]))
    be.set_3d_instances([(0, _instances([(0.5, 0), (2, 0)]))])
    be.synchronize()
    assert be._motion is not None
    # count change -> geo dirty -> rebuild clears the armed cache
    be.set_3d_instances([(0, _instances([(0, 0), (2, 0), (1, 1)]))])
    be.synchronize()
    assert be._motion is None
    be.set_3d_instances([(0, _instances([(0, 0.3), (2, 0), (1, 1)]))])
    be.synchronize()
    assert be._motion is not None

    ref = TpuBackend(W, H, _settings(device_motion=False))
    _feed(ref, _static_mesh(), _instances([(0, 0.3), (2, 0), (1, 1)]))
    assert np.array_equal(_render(be), _render(ref))


def test_motion_with_shading_bounce():
    """One-bounce shaded render through the fast path matches the host
    path (exercises occlusion + bounce traversal over refit TLAS boxes)."""
    frames = {}
    for dm in (True, False):
        be = TpuBackend(W, H, TpuSettings(
            samples_per_frame=1, max_bounces=1, pixel_center=True,
            sampler="sobol", device_motion=dm, motion_min_instances=0))
        _feed(be, _static_mesh(), _instances([(0, 0), (2, 0)]))
        from rfw_tpu.scene.lights import PointLightsView

        be.set_point_lights(PointLightsView(
            position=np.array([[1.5, 2.0, 3.0]], np.float32),
            energy=np.array([[30.0, 28.0, 25.0]], np.float32),
            changed=np.ones(1, bool)))
        be.set_3d_instances([(0, _instances([(0.6, 0.2), (1.6, 0)]))])
        be.synchronize()
        frames[dm] = _render_color(be)
    assert np.array_equal(frames[True], frames[False])


def _render_color(be):
    return be.render(None, CAM.get_view(W, H), RenderMode.DEFAULT)
