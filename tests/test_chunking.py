"""auto_chunk: VMEM-adaptive grid-step batching (ops/traverse.py).

The kernel's dominant cost at scale is the ~650us/grid-step fixed cost
(docs/ROUND2.md cost model); auto_chunk spends whatever scoped VMEM the
scene leaves free on more sub-tiles per step. These tests pin the sizing
invariants — the semantic parity of different batch sizes is covered by
the interpret-mode kernel tests (test_packet/test_twophase), where
batch = min(chunk, T) collapses to T.
"""

from __future__ import annotations

from rfw_tpu.ops.traverse import (
    LANE,
    VMEM_STEP_MARGIN,
    VMEM_TOTAL,
    auto_chunk,
)

SUB = 8
CLOSEST_TILE = 4 * 12 * SUB * LANE  # o/d/tl in + t/prim/inst/u/v out
ANYHIT_TILE = 4 * 8 * SUB * LANE  # o/d/tl in + prim out
MB = 1024 * 1024


def test_max_budget_scene_keeps_proven_batch():
    # the 11.5MB VMEM_SCENE_BUDGET ceiling must still get the round-2
    # proven 16-tile batch (the margin calibration anchors here)
    assert auto_chunk(int(11.5 * MB), CLOSEST_TILE, 9 * 4 * SUB * LANE) == 16


def test_small_scene_earns_larger_batches():
    c = auto_chunk(6 * MB, CLOSEST_TILE, 9 * 4 * SUB * LANE)
    assert c >= 32
    # any-hit steps are smaller, so they earn at least as much
    assert auto_chunk(6 * MB, ANYHIT_TILE, 10 * 4 * SUB * LANE) >= c


def test_never_zero_even_oversubscribed():
    assert auto_chunk(VMEM_TOTAL, CLOSEST_TILE) == 1


def test_double_buffered_fit():
    # the chosen batch's double-buffered step buffers must actually fit
    for resident in (0, 2 * MB, 5 * MB, 9 * MB, int(11.5 * MB)):
        for tile in (CLOSEST_TILE, ANYHIT_TILE):
            c = auto_chunk(resident, tile)
            if c > 1:
                assert (resident + 2 * c * tile
                        <= VMEM_TOTAL - VMEM_STEP_MARGIN)


def test_env_pin_overrides(monkeypatch):
    # RFW_CHUNK_TILES pins the batch for A/B sweeps: the module reads the
    # env at import, so emulate via the module flags it derives
    import rfw_tpu.ops.traverse as tr

    monkeypatch.setattr(tr, "_CHUNK_PINNED", True)
    monkeypatch.setattr(tr, "CHUNK_TILES", 7)
    assert tr.auto_chunk(0, CLOSEST_TILE) == 7
