"""2-process CPU smoke test for the multi-host (DCN) path.

Makes the SURVEY §2.10 multi-host claim real: two OS processes, two
virtual CPU devices each, initialize the JAX distributed runtime via
rfw_tpu.parallel.distributed, broadcast a scene-like pytree from process
0, and psum a film-sharded array over the 4-device global mesh.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

from rfw_tpu.parallel.distributed import (
    broadcast_scene, global_film_mesh, init_distributed,
)

ok = init_distributed()
assert ok, "distributed init returned single-process"

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

pid = jax.process_index()
assert jax.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()

# scene broadcast: host 0 owns the values, host 1 passes a skeleton
if pid == 0:
    scene = {"tri": np.arange(12, dtype=np.float32).reshape(3, 4),
             "mat": np.full((2, 2), 7.5, np.float32)}
else:
    scene = {"tri": np.zeros((3, 4), np.float32),
             "mat": np.zeros((2, 2), np.float32)}
scene = broadcast_scene(scene)
assert float(np.asarray(scene["tri"]).sum()) == 66.0, scene["tri"]
assert float(np.asarray(scene["mat"]).sum()) == 30.0

# film-sharded psum over the global mesh (DCN-equivalent collective)
mesh = global_film_mesh()
sh = NamedSharding(mesh, P("film"))
from jax.experimental import multihost_utils
host_rows = np.arange(8, dtype=np.float32)  # global film; 4 local rows each
g = multihost_utils.host_local_array_to_global_array(
    host_rows[4 * pid: 4 * pid + 4], mesh, P("film"))

@jax.jit
def total(x):
    return jnp.sum(x)

t = float(np.asarray(total(g)))
assert t == float(np.arange(8).sum()), t
print(f"WORKER {pid} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_smoke(tmp_path):
    port = _free_port()
    env_base = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS")
    }
    # drop the axon TPU plugin from the workers entirely: JAX_PLATFORMS is
    # ignored once the plugin registers (CLAUDE.md), and two processes
    # touching the one tunneled chip would hang
    env_base["PYTHONPATH"] = os.pathsep.join(
        p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p) or "/root/repo"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in env_base["PYTHONPATH"].split(os.pathsep):
        env_base["PYTHONPATH"] = repo + os.pathsep + env_base["PYTHONPATH"]
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            RFW_COORDINATOR=f"127.0.0.1:{port}",
            RFW_NUM_PROCESSES="2",
            RFW_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {pid} timed out")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{err[-2000:]}"
        assert f"WORKER {pid} OK" in out
