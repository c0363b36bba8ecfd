"""On-chip decomposition of the animated demo's per-frame cost.

The queue-8 animated run measured ~6.2 s/frame while skins are dirty
(sync 1.5-3 s, render 3-4.5 s) at 256x128 — vs 177-195 ms/frame for
instance-motion-only frames. The CPU JAX_LOG_COMPILES repro proved there
are NO per-frame retraces, so the cost is real dispatch/transfer/
execution. This tool times each suspect in isolation with the honest
scalar-pull clock:

  lights    pack_lights + per-field upload  vs  upload_lights (2-blob)
  dyn sync  set_time -> scene.synchronize -> device skin+refit, INCLUDING
            execution (a scalar pull of the refit output closes the clock;
            the demo's sync_ms stops at dispatch)
  render    warm render_frame on a quiescent scene (static everything)

Usage (REAL CHIP — do not set JAX_PLATFORMS):
  python tools/profile_dynamics.py [--size 256x128] [--reps 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ASSETS = "/root/reference/assets/models"  # same content the demos load


def clock(fn, reps, pull):
    """Per-rep wall ms; each rep ends with a 4-byte device pull that
    depends on the computation (the only honest tunnel clock)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        pull(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="256x128")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    W, H = (int(v) for v in args.size.split("x"))

    import jax.numpy as jnp

    from rfw_tpu.app import Instance
    from rfw_tpu.mathx import compose_trs, quat_identity
    from rfw_tpu.models import sphere
    from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings
    from rfw_tpu.scene import Material

    backend = TpuBackend(W, H, TpuSettings(
        samples_per_frame=1, max_bounces=1, sky_intensity=0.5, clamp=20.0))
    app = Instance(backend, W, H)
    scene = app.scene
    metal = scene.add_material(Material(
        name="m", color=np.array([0.9, 0.6, 0.5, 1], np.float32),
        metallic=1.0, roughness=0.3))
    ball = sphere(quality=2, radius=0.25, material_id=metal)
    bid = scene.add_3d_object(ball)
    for ix in range(12):
        for iz in range(12):
            h = scene.add_3d_instance(bid)
            h.set_matrix(compose_trs(
                np.array([(ix - 6) * 0.8, 0.5, (iz - 6) * 0.8], np.float32),
                quat_identity(), np.ones(3, np.float32)))
    # EXACTLY the animated.py content set (incl. pica) so every program
    # compiled by the demo's on-chip run is a cache hit here
    man = scene.add_3d(scene.load(f"{ASSETS}/CesiumMan/CesiumMan.gltf"))
    man.set_root_matrix(compose_trs(
        np.array([-2.5, 0, 0], np.float32), quat_identity(),
        np.array([1.5, 1.5, 1.5], np.float32)))
    man2 = scene.add_3d(scene.load(f"{ASSETS}/CesiumMan/CesiumMan.gltf"))
    man2.set_root_matrix(compose_trs(
        np.array([2.5, 0, 0], np.float32), quat_identity(),
        np.array([1.5, 1.5, 1.5], np.float32)))
    pica = scene.add_3d(scene.load(f"{ASSETS}/pica/scene.gltf"))
    k = 18.0 / 64.0
    cxz = np.array([(-36.92 + 27.37) / 2, 0.0, (-32.19 + 18.17) / 2])
    pica.set_root_matrix(compose_trs(
        np.array([-cxz[0] * k, 1.17 * k, -cxz[2] * k], np.float32),
        quat_identity(), np.full(3, k, np.float32)))
    scene.add_directional_light((0.35, -1.0, 0.25), (2.2, 2.1, 1.9))
    for a in (0.0, 2.1, 4.2):
        scene.add_spot_light((np.cos(a) * 5, 6, np.sin(a) * 5), (0, -1, 0),
                             (60, 56, 50), 20, 35)
    app.camera.look_at(np.array([5.5, 4.0, 7.0], np.float32),
                       np.array([0, 1.2, 0], np.float32))

    man.set_time(0.2)
    frame = app.render_frame()
    print(f"first frame done {frame.shape}")
    man.set_time(0.25)
    app.render_frame()  # second variant compile (post-refit scene_dev)
    print("second frame done")

    from rfw_tpu.render.lights_pack import DeviceLights, pack_lights, upload_lights

    # ---- lights upload: per-field vs 2-blob -------------------------------
    def lights_fields():
        dl = pack_lights(backend._point, backend._spot,
                         backend._directional, backend._area)
        return DeviceLights(*[jnp.asarray(x) for x in dl])

    def lights_blob():
        dl = pack_lights(backend._point, backend._spot,
                         backend._directional, backend._area)
        return upload_lights(dl)

    pull_lights = lambda dl: np.asarray(jnp.sum(dl.light_table))
    m, ts = clock(lights_fields, args.reps, pull_lights)
    print(f"lights per-field upload {m:8.1f} ms   {['%.0f' % x for x in ts]}")
    m, ts = clock(lights_blob, args.reps, pull_lights)
    print(f"lights 2-blob upload    {m:8.1f} ms   {['%.0f' % x for x in ts]}")

    # ---- dirty dynamic sync incl. device execution ------------------------
    t = [0.3]

    def dyn():
        t[0] += 0.05
        man.set_time(t[0])
        man2.set_time(t[0] + 0.7)
        scene.synchronize(backend)
        return backend._scene_dev

    pull_dyn = lambda sd: np.asarray(jnp.sum(sd.tlas_min))
    m, ts = clock(dyn, args.reps, pull_dyn)
    mode = "device" if backend._dyn is not None else "HOST-FALLBACK"
    print(f"dirty skin sync+exec    {m:8.1f} ms   {['%.0f' % x for x in ts]} ({mode})")

    # ---- warm quiescent render --------------------------------------------
    m, ts = clock(lambda: app.render_frame(), args.reps, lambda fr: None)
    print(f"quiescent render_frame  {m:8.1f} ms   {['%.0f' % x for x in ts]}")

    # ---- dirty-skin FULL frame (what the demo measures) --------------------
    def full():
        t[0] += 0.05
        man.set_time(t[0])
        man2.set_time(t[0] + 0.7)
        return app.render_frame()

    m, ts = clock(full, args.reps, lambda fr: None)
    print(f"dirty-skin render_frame {m:8.1f} ms   {['%.0f' % x for x in ts]}")
    print("DONE")


if __name__ == "__main__":
    main()
