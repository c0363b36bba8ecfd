"""HBM-streamed-treelet tier vs jnp packet tier on an over-VMEM-budget
scene (VERDICT round-2 item 5 gate: >=2x the packet tier at ~500k tris).

Builds a procedural terrain (two triangles per grid cell) big enough that
`pallas_scene_bytes` exceeds VMEM_SCENE_BUDGET — the classic resident
kernel refuses it — and times coherent primary closest-hit on:
  * the tri_hbm Pallas kernel (supernodes resident, treelets DMA'd)
  * the jnp packet tier (the previous fallback)
Honest scalar-reduce timing (CLAUDE.md).

Usage: python tools/bench_hbm.py [--grid 500] [--width 1024 --height 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def terrain_mesh(n: int):
    """(2*n*n)-triangle deterministic height field on [0,n]x[0,n]."""
    from rfw_tpu.models.mesh3d import build_mesh3d

    xs = np.arange(n + 1, dtype=np.float32)
    X, Z = np.meshgrid(xs, xs, indexing="ij")
    Y = (np.sin(X * 0.37) * np.cos(Z * 0.23) * 2.0
         + np.sin(X * 0.11 + Z * 0.17) * 3.0).astype(np.float32)
    P = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    idx = np.arange((n + 1) * (n + 1)).reshape(n + 1, n + 1)
    a = idx[:-1, :-1].reshape(-1)
    b = idx[1:, :-1].reshape(-1)
    c = idx[1:, 1:].reshape(-1)
    d = idx[:-1, 1:].reshape(-1)
    tris = np.concatenate(
        [np.stack([a, b, c], 1), np.stack([a, c, d], 1)]).astype(np.int32)
    return build_mesh3d(positions=P, indices=tris, name="terrain")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=500)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rfw_tpu.ops.traverse import (
        VMEM_SCENE_BUDGET, pallas_closest_hit, pallas_scene_bytes,
        pallas_resident_bytes, prepare_pallas_scene,
    )
    from rfw_tpu.render import pack_trace_scene
    from rfw_tpu.render.pack import TraceScene
    from rfw_tpu.render.packet import packet_closest_hit, prepare_packet_scene
    from rfw_tpu.render.wavefront import _block_swizzle, camera_rays
    from rfw_tpu.scene.camera import Camera3D

    n = args.grid
    mesh = terrain_mesh(n)
    print(f"terrain: {mesh.num_triangles} tris", file=sys.stderr)
    t0 = time.perf_counter()
    scene = pack_trace_scene(
        [(0, mesh, None)], [(0, np.eye(4, dtype=np.float32)[None])])
    print(f"pack+BVH {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    sdev = TraceScene(*[jnp.asarray(x) for x in scene])
    sb, rb = pallas_scene_bytes(sdev), pallas_resident_bytes(sdev)
    print(f"scene_bytes {sb/1e6:.1f}MB (budget {VMEM_SCENE_BUDGET/1e6:.1f}) "
          f"resident {rb/1e6:.1f}MB", file=sys.stderr)
    assert sb > VMEM_SCENE_BUDGET, "grid too small to exercise the HBM tier"

    W, H = args.width, args.height
    R = W * H
    cam = Camera3D(fov=55).look_at(
        np.array([n * 0.5, 28.0, -n * 0.12], np.float32),
        np.array([n * 0.5, 0.0, n * 0.5], np.float32))
    view = jnp.asarray(cam.get_view(W, H).as_array())
    px, py, _ = _block_swizzle(W, H, 1024)
    o, d = camera_rays(view, W, H, jax.random.PRNGKey(2), (px, py))
    o = jax.block_until_ready(jnp.asarray(o))
    d = jax.block_until_ready(jnp.asarray(d))

    ps = jax.jit(prepare_pallas_scene)(sdev)
    np.asarray(jnp.sum(ps.scene_t))
    pk = prepare_packet_scene(sdev)

    results = {"n_tris": int(mesh.num_triangles),
               "scene_mb": round(sb / 1e6, 1)}

    def timed(name, fn):
        t0 = time.perf_counter()
        hitfrac = float(np.asarray(jnp.mean((fn().prim >= 0)
                                            .astype(jnp.float32))))
        print(f"{name}: first {time.perf_counter()-t0:.1f}s "
              f"hit {hitfrac:.3f}", file=sys.stderr)
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(jnp.sum(fn().t))
            best = min(best, time.perf_counter() - t0)
        results[name + "_ms"] = round(best * 1e3, 1)
        results[name + "_mrays"] = round(R / best / 1e6, 2)
        print(f"{name:10s} {best*1e3:8.1f} ms  {R/best/1e6:6.2f} Mrays/s",
              file=sys.stderr)

    timed("hbm", lambda: pallas_closest_hit(ps, o, d, tri_hbm=True))
    timed("packet", lambda: packet_closest_hit(pk, o, d, 1e30, lanes=1024))
    results["speedup"] = round(
        results["packet_ms"] / results["hbm_ms"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
