"""rfw_tpu — a TPU-native rendering framework.

A from-scratch rebuild of the capabilities of ``meirbon/rfw-rs`` (reference:
/root/reference) designed for TPUs: the scene layer is a host-side authoring
API that lowers to structure-of-arrays device buffers, and rendering is a
wavefront path tracer written in JAX/XLA/Pallas.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):

  L7  examples/                      demo applications
  L6  rfw_tpu.font                   text -> 2D mesh plugin
  L5  rfw_tpu.app                    app runtime: Instance, scheduler, events
  L4  rfw_tpu.scene + rfw_tpu.models scene graph, meshes, materials, lights
  L3  rfw_tpu.backend                Backend protocol + SoA data views
  L2  rfw_tpu.render + rfw_tpu.ops   TPU wavefront path tracer (jnp + Pallas)
  L1  rfw_tpu.utils, rfw_tpu.mathx,  storages, change feeds, timing, math,
      rfw_tpu.accel                  BVH builders (CPU SAH oracle + device LBVH)
      rfw_tpu.parallel               device-mesh / film-tile sharding
"""

__version__ = "0.1.0"

import os as _os

from rfw_tpu.utils import log as _log

if "RFW_LOG" in _os.environ:
    # honour RFW_LOG even in scripts that never build an app Instance
    # (reference initialises env_logger at startup, rfw/src/lib.rs:108)
    _log.init()

from rfw_tpu.utils.collections import FlaggedStorage, TrackedStorage
from rfw_tpu.utils.timing import Timer, Averager
