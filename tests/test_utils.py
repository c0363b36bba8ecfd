"""Storage invariant tests — the sync protocol rests on these
(model: reference crates/rfw-utils/src/collections.rs:704-790 tests)."""

import numpy as np
import pytest

from rfw_tpu.utils import FlaggedStorage, TrackedStorage, Tracked, Averager


class TestFlaggedStorage:
    def test_push_get(self):
        s = FlaggedStorage()
        a = s.push("a")
        b = s.push("b")
        assert s[a] == "a" and s[b] == "b"
        assert len(s) == 2

    def test_erase_reuse(self):
        s = FlaggedStorage()
        a = s.push("a")
        s.push("b")
        assert s.erase(a) == "a"
        assert a not in s
        c = s.push("c")
        assert c == a  # free-list LIFO reuse
        assert s[c] == "c"

    def test_overwrite_grows(self):
        s = FlaggedStorage()
        s.overwrite(5, "x")
        assert s[5] == "x"
        assert len(s) == 1
        assert 3 not in s

    def test_iterator_skips_holes(self):
        s = FlaggedStorage()
        ids = [s.push(i) for i in range(4)]
        s.erase(ids[1])
        got = dict(iter(s))
        assert got == {ids[0]: 0, ids[2]: 2, ids[3]: 3}

    def test_erase_inactive_raises(self):
        s = FlaggedStorage()
        with pytest.raises(KeyError):
            s.erase(0)


class TestTrackedStorage:
    def test_changes_flow(self):
        s = TrackedStorage()
        a = s.push(1)
        b = s.push(2)
        assert s.changed_indices() == [a, b]
        s.reset_changed()
        assert not s.any_changed
        s.get_mut(b)
        assert s.changed_indices() == [b]

    def test_erased_feed(self):
        s = TrackedStorage()
        a = s.push("a")
        s.reset_changed()
        s.erase(a)
        assert s.take_erased() == [a]
        assert s.take_erased() == []

    def test_trigger_all(self):
        s = TrackedStorage()
        ids = [s.push(i) for i in range(3)]
        s.reset_changed()
        s.trigger_changed_all()
        assert s.changed_indices() == sorted(ids)


def test_tracked_value():
    t = Tracked(5)
    assert t.changed
    t.reset_changed()
    t.value = 6
    assert t.changed and t.value == 6


def test_averager_rolls():
    a = Averager(capacity=4)
    for v in [1, 2, 3, 4]:
        a.add(v)
    assert a.average() == 2.5
    a.add(5)  # evicts 1
    assert a.average() == 3.5


def test_scale_mode():
    from rfw_tpu.app.instance import ScaleMode, _resolve_scale

    assert _resolve_scale(ScaleMode.REGULAR, dpi=2.0) == 1.0
    assert _resolve_scale(ScaleMode.HIGH_DPI, dpi=2.0) == 2.0
    assert _resolve_scale(0.5) == 0.5
    assert ScaleMode.CUSTOM.factor(custom=1.5) == 1.5


def test_transform_guard_writes_once_on_exit():
    import numpy as np

    from rfw_tpu.scene.instances import InstanceList3D

    lst = InstanceList3D()
    h = lst.allocate()
    lst.reset_changed()
    with h.transform() as t:
        t.translate((1, 2, 3)).rotate_y(np.pi / 2).scale(2.0)
        assert not lst.changed[h.index]  # nothing written mid-batch
    assert lst.changed[h.index]
    m = lst.matrices[h.index]
    np.testing.assert_allclose(m[:3, 3], [1, 2, 3], atol=1e-6)
    # 90-deg yaw of scale-2 x-axis -> -z column
    np.testing.assert_allclose(m[:3, 0], [0, 0, -2], atol=1e-5)


class TestEcsEntities:
    """Entity/component layer (reference bevy_ecs entities + queries,
    examples/animated/src/main.rs:197-219 par_for_each_mut -> batched
    column queries here)."""

    def test_spawn_query_batch(self):
        import numpy as np

        from rfw_tpu.app.ecs import World

        w = World()
        for i in range(5):
            w.spawn(pos=np.array([i, 0, 0], np.float32),
                    vel=np.array([0, 1.0 * i, 0], np.float32))
        w.spawn(pos=np.array([9, 9, 9], np.float32))  # no vel
        batch = w.query("pos", "vel")
        assert len(batch) == 5
        # vectorized update over the whole batch, scattered back
        batch.set("pos", batch.col("pos") + batch.col("vel"))
        assert np.allclose(w.get_component(batch.entities[3], "pos"),
                           [3, 3, 0])
        # the vel-less entity is untouched and not matched
        only_pos = w.query("pos")
        assert len(only_pos) == 6

    def test_despawn_swap_remove(self):
        import numpy as np

        from rfw_tpu.app.ecs import World

        w = World()
        es = [w.spawn(x=np.float32(i)) for i in range(4)]
        w.despawn(es[1])
        b = w.query("x")
        assert len(b) == 3
        got = sorted(float(v) for v in b.col("x"))
        assert got == [0.0, 2.0, 3.0]
        # rows stay dense and addressable after the swap-remove
        assert float(w.get_component(es[3], "x")) == 3.0

    def test_missing_component_query_empty(self):
        from rfw_tpu.app.ecs import World

        w = World()
        w.spawn(a=1.0)
        assert len(w.query("a", "nope")) == 0


def test_upload_lights_single_transfer_parity():
    """upload_lights (2-blob + 1-dispatch device upload) must reproduce
    every DeviceLights field bit-exactly vs per-field jnp.asarray — it is
    the per-frame path for light-animated scenes."""
    import jax.numpy as jnp
    import numpy as np

    from rfw_tpu.backend.lights import (
        AreaLightsView, DirectionalLightsView, PointLightsView,
        SpotLightsView,
    )
    from rfw_tpu.render.lights_pack import pack_lights, upload_lights

    rng = np.random.default_rng(3)

    def f(*shape):
        return rng.uniform(0.1, 5, shape).astype(np.float32)

    point = PointLightsView(f(3, 3), f(3, 3), np.zeros(3, bool))
    spot = SpotLightsView(f(2, 3), f(2, 3), f(2, 3),
                          np.array([0.9, 0.8], np.float32),
                          np.array([0.7, 0.6], np.float32),
                          np.zeros(2, bool))
    directional = DirectionalLightsView(f(1, 3), f(1, 3), np.zeros(1, bool))
    zi = np.array([0, 1], np.int32)
    area = AreaLightsView(f(2, 3), f(2, 3), f(2, 3), f(2, 3), f(2),
                          f(2, 3), f(2, 3), f(2, 3),
                          zi, zi, zi, np.zeros(2, bool))
    host = pack_lights(point, spot, directional, area)

    ref = [np.asarray(jnp.asarray(x)) for x in host]
    got = upload_lights(host)
    for name, r, g in zip(host._fields, ref, list(got)):
        g = np.asarray(g)
        assert g.dtype == r.dtype, name
        assert g.shape == r.shape, name
        np.testing.assert_array_equal(g, r, err_msg=name)
