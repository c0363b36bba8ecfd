"""Per-instance skin/morph poses (VERDICT round-2 #8).

Reference instances carry individual `skin_ids` and node morph weights
(crates/rfw-scene/src/instances_3d.rs:10-322) — two instances of one mesh
can be in different poses. rfw_tpu packs one deformed arena copy per
distinct (skin id, morph weights) group (TpuBackend._instance_layout);
these tests pin:

  * image parity against the oracle (which deforms per instance with the
    independently written _oracle_skin) for mixed-pose instance sets;
  * the device-dynamics fast path producing the same image as the host
    repack path for per-instance groups;
  * grouping-change detection: weight edits that split a group force a
    repack instead of silently reusing stale arenas.
"""

import numpy as np

from rfw_tpu.backend.contract import RenderMode
from rfw_tpu.backend.structs import InstancesView3D, SkinView
from rfw_tpu.render.cpu_reference import CpuReferenceBackend
from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings
from rfw_tpu.scene.camera import Camera3D
from tests.test_skinning import _quad_mesh, _rot_x

W, H = 64, 48
CAM = Camera3D(fov=60).look_at(np.array([1.5, 1.5, 4.0], np.float32),
                               np.array([1.5, 0.3, 0.0], np.float32))


def _settings(**kw):
    return TpuSettings(samples_per_frame=1, max_bounces=0,
                       pixel_center=True, **kw)


def _two_pose_instances(mesh):
    """Two instances of one skinned quad: skin 0 at rest, skin 1 folded."""
    mats = np.stack([np.eye(4, dtype=np.float32),
                     np.eye(4, dtype=np.float32)])
    mats[1, 0, 3] = 2.0  # second quad offset in +X
    return InstancesView3D(
        matrices=mats,
        skin_ids=np.array([0, 1], np.int32),
        changed=np.array([True, True]),
        local_aabb_min=mesh.aabb_min, local_aabb_max=mesh.aabb_max,
    )


def _feed(be, mesh, iv, skins=None):
    from rfw_tpu.scene.materials import Materials

    be.set_materials(Materials().to_device(), [0])
    be.set_3d_meshes([(0, mesh)])
    if skins:
        be.set_skins(list(skins.items()))
    be.set_3d_instances([(0, iv)])
    be.synchronize()


def test_two_instances_two_skins_match_oracle():
    mesh = _quad_mesh()
    skins = {0: SkinView(joint_matrices=np.eye(4, dtype=np.float32)[None]),
             1: SkinView(joint_matrices=_rot_x(-90.0)[None])}
    iv = _two_pose_instances(mesh)
    frames = {}
    for cls in (TpuBackend, CpuReferenceBackend):
        be = cls(W, H, _settings())
        _feed(be, mesh, iv, skins)
        frames[cls] = be.render(None, CAM.get_view(W, H), RenderMode.NORMAL)
    a = frames[TpuBackend].astype(int)
    b = frames[CpuReferenceBackend].astype(int)
    assert np.abs(a - b).max() <= 1
    # the two quads actually differ: instance 1 folded away from the
    # camera, its pixels show a rotated normal
    left = a[:, : W // 2]
    right = a[:, W // 2:]
    assert not np.array_equal(left, right)


def test_per_instance_morph_weights_match_oracle():
    mesh = _quad_mesh()
    mesh.joints = None
    mesh.weights = None
    delta = np.zeros((1, 4, 3), np.float32)
    delta[0, :, 2] = [0.0, 0.0, 1.2, 1.2]
    mesh.morph_targets = delta
    mats = np.stack([np.eye(4, dtype=np.float32),
                     np.eye(4, dtype=np.float32)])
    mats[1, 0, 3] = 2.0
    iv = InstancesView3D(
        matrices=mats,
        skin_ids=np.full(2, -1, np.int32),
        changed=np.array([True, True]),
        morph_weights=np.array([[0.0], [1.0]], np.float32),
        local_aabb_min=mesh.aabb_min, local_aabb_max=mesh.aabb_max,
    )
    frames = {}
    for cls in (TpuBackend, CpuReferenceBackend):
        be = cls(W, H, _settings())
        _feed(be, mesh, iv)
        frames[cls] = be.render(None, CAM.get_view(W, H), RenderMode.NORMAL)
    a = frames[TpuBackend].astype(int)
    b = frames[CpuReferenceBackend].astype(int)
    assert np.abs(a - b).max() <= 1
    assert not np.array_equal(a[:, : W // 2], a[:, W // 2:])


def test_device_dynamics_matches_host_path_for_groups():
    """Pose update on ONE of two per-instance groups: the device refit
    path and the host repack path must render the same image."""
    mesh = _quad_mesh()
    rest = np.eye(4, dtype=np.float32)[None]
    frames = {}
    for dyn in (True, False):
        be = TpuBackend(W, H, _settings(device_dynamics=dyn))
        skins = {0: SkinView(joint_matrices=rest),
                 1: SkinView(joint_matrices=rest)}
        _feed(be, mesh, _two_pose_instances(mesh), skins)
        # animate only skin 1
        be.set_skins([(1, SkinView(joint_matrices=_rot_x(-60.0)[None]))])
        be.synchronize()
        if dyn:
            assert be._dyn is not None
            assert len(be._dyn["plans"]) == 2  # one plan per pose group
            assert "tri_shade" in be._dev_stale  # device path ran
        frames[dyn] = be.render(None, CAM.get_view(W, H), RenderMode.NORMAL)
    diff = np.abs(frames[True].astype(int) - frames[False].astype(int))
    assert diff.max() <= 1, diff.max()


def test_group_split_forces_repack():
    """Morph weights diverging across instances changes the grouping ->
    full repack (arena layout must grow a copy), not the fast path."""
    mesh = _quad_mesh()
    mesh.joints = None
    mesh.weights = None
    delta = np.zeros((1, 4, 3), np.float32)
    delta[0, :, 2] = [0.0, 0.0, 1.0, 1.0]
    mesh.morph_targets = delta
    mats = np.stack([np.eye(4, dtype=np.float32),
                     np.eye(4, dtype=np.float32)])
    mats[1, 0, 3] = 2.0

    def iv(w0, w1):
        return InstancesView3D(
            matrices=mats, skin_ids=np.full(2, -1, np.int32),
            changed=np.array([True, True]),
            morph_weights=np.array([[w0], [w1]], np.float32),
            local_aabb_min=mesh.aabb_min, local_aabb_max=mesh.aabb_max,
        )

    be = TpuBackend(W, H, _settings())
    _feed(be, mesh, iv(0.0, 0.0))
    assert len(be._dyn["plans"]) == 1  # identical weights -> one unit

    # same pattern (both weights move together) -> fast path, no repack
    be.set_3d_instances([(0, iv(0.5, 0.5))])
    assert not be._geo_dirty
    assert 0 in be._morph_dirty
    be.synchronize()
    assert len(be._dyn["plans"]) == 1

    # diverge -> grouping splits -> repack with a second arena copy
    be.set_3d_instances([(0, iv(0.5, 1.0))])
    assert be._geo_dirty
    be.synchronize()
    assert len(be._dyn["plans"]) == 2  # one deformed arena copy per pose

    # oracle parity after the split
    bc = CpuReferenceBackend(W, H, _settings())
    _feed(bc, mesh, iv(0.5, 1.0))
    a = be.render(None, CAM.get_view(W, H), RenderMode.NORMAL).astype(int)
    b = bc.render(None, CAM.get_view(W, H), RenderMode.NORMAL).astype(int)
    assert np.abs(a - b).max() <= 1
