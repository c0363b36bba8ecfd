"""Multi-host (multi-process) scale-out: DCN init + scene broadcast.

SURVEY.md §2.10 prescribes the TPU equivalent of the reference's
host->device delta-sync at pod scale: ICI collectives inside a host,
"DCN broadcast of scene updates in multi-host mode". The reference has no
multi-process story at all (single-GPU, SURVEY §2.9); this module is the
new capability that makes rfw_tpu's multi-host claim real rather than
docs-only:

  * `init_distributed` — process-agnostic `jax.distributed.initialize`
    wrapper (env-driven like every JAX launcher: COORDINATOR/NPROC/PID
    or explicit args). Call once per process before device queries.
  * `global_film_mesh` — a film-axis mesh over EVERY process's devices
    (jax.devices() is global after init); film tiles shard across hosts,
    the scene replicates, and XLA routes the film gather over DCN.
  * `broadcast_scene` — host-0's packed scene pytree to all processes
    (processes other than 0 pass shape/dtype skeletons). Scene loading +
    packing happens once, on host 0, exactly like the reference's single
    scene authority (rfw/src/system/mod.rs:19-206 sync choke point).

Tested by tests/test_distributed.py: a real 2-process CPU smoke test
(each process 2 virtual devices) that initializes, broadcasts a pytree,
and psums over a global 4-device mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime for multi-host rendering.

    Arguments fall back to RFW_COORDINATOR / RFW_NUM_PROCESSES /
    RFW_PROCESS_ID (standard launcher pattern). Returns True when a
    multi-process runtime was initialized, False for the single-process
    no-op (so callers can share one code path)."""
    import jax

    coordinator = coordinator or os.environ.get("RFW_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("RFW_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("RFW_PROCESS_ID", "0"))
    if num_processes <= 1 or coordinator is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_film_mesh(axis: str = "film"):
    """1-D film mesh over ALL processes' devices (call after
    init_distributed; jax.devices() is then the global device list)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def broadcast_scene(tree, is_source: Optional[bool] = None):
    """Broadcast host-0's scene pytree (packed TraceScene / materials /
    atlas / lights — any pytree of arrays) to every process.

    Non-source processes pass a skeleton with matching shapes/dtypes
    (e.g. zeros); the returned tree holds host-0's values everywhere.
    `is_source` defaults to process_index()==0."""
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return tree
    if is_source is None:
        is_source = jax.process_index() == 0
    return multihost_utils.broadcast_one_to_all(tree, is_source=is_source)
