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
