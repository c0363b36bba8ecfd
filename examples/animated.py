"""The `animated` demo (reference examples/animated/src/main.rs:1-313):
a grid of bouncing instanced spheres, two skinned CesiumMan characters, the
pica interior scene, rotating spot lights + a directional sun, and an FPS
overlay — driven headlessly through the app runtime, frames streamed to
PNGs.

Usage:
  python examples/animated.py [--frames 8] [--size 640x360] [--spp 2]
                              [--grid 12] [--out-dir /tmp/animated]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ASSETS = "/root/reference/assets/models"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", default="640x360")
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--grid", type=int, default=12, help="sphere grid side")
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--out-dir", default="/tmp/animated")
    ap.add_argument("--no-pica", action="store_true")
    args = ap.parse_args(argv)
    W, H = (int(x) for x in args.size.split("x"))

    from rfw_tpu.app import Instance
    from rfw_tpu.app.ecs import Stage
    from rfw_tpu.font import FontPlugin, Section, Text
    from rfw_tpu.app.timer import GameTimer
    from rfw_tpu.mathx import compose_trs, quat_identity
    from rfw_tpu.models import sphere
    from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings
    from rfw_tpu.scene import Material, Scene
    from rfw_tpu.scene.scene import Scene as SceneT
    from rfw_tpu.utils import Averager, Timer

    os.makedirs(args.out_dir, exist_ok=True)

    backend = TpuBackend(
        W, H,
        TpuSettings(samples_per_frame=args.spp, max_bounces=args.bounces,
                    sky_intensity=0.5, clamp=20.0),
    )
    app = Instance(backend, W, H)
    scene = app.scene
    font = FontPlugin()
    app.with_plugin(font)

    # ---- content ---------------------------------------------------------
    metal = scene.add_material(Material(
        name="sphere-metal", color=np.array([0.95, 0.64, 0.54, 1], np.float32),
        metallic=1.0, roughness=0.25,
    ))
    ball = sphere(quality=2, radius=0.25, material_id=metal)
    ball_id = scene.add_3d_object(ball)

    # sphere grid as ECS entities: each sphere is an entity with a
    # base-position component + a bounce phase; the update system below
    # queries the batch and computes all matrices in one vectorized pass
    # (reference expresses this as bevy par_for_each_mut,
    # examples/animated/src/main.rs:197-219)
    n = args.grid
    handles = []
    for ix in range(n):
        for iz in range(n):
            x = (ix - n / 2) * 0.8
            z = (iz - n / 2) * 0.8
            h = scene.add_3d_instance(ball_id)
            app.world.spawn(
                base_xz=np.array([x, z], np.float32),
                phase=np.float32(0.3 * (x + z)),
                handle_idx=np.int64(len(handles)),
            )
            handles.append(h)
    print(f"{len(handles)} sphere instances (ECS entities)")

    # skinned characters
    cesium = scene.load(f"{ASSETS}/CesiumMan/CesiumMan.gltf")
    man1 = scene.add_3d(cesium)
    man1.set_root_matrix(compose_trs(
        np.array([-2.5, 0, 0], np.float32), quat_identity(),
        np.array([1.5, 1.5, 1.5], np.float32)))
    man2 = scene.add_3d(scene.load(f"{ASSETS}/CesiumMan/CesiumMan.gltf"))
    man2.set_root_matrix(compose_trs(
        np.array([2.5, 0, 0], np.float32), quat_identity(),
        np.array([1.5, 1.5, 1.5], np.float32)))

    if not args.no_pica:
        pica = scene.add_3d(scene.load(f"{ASSETS}/pica/scene.gltf"))
        # center the room under the demo content (pica world bounds are
        # roughly [-37,-1,-32]..[27,19,18]): shift to origin, floor at y=0,
        # scale to ~18 units across
        k = 18.0 / 64.0
        center_xz = np.array([(-36.92 + 27.37) / 2, 0.0, (-32.19 + 18.17) / 2])
        t = np.array([-center_xz[0] * k, 1.17 * k, -center_xz[2] * k], np.float32)
        pica.set_root_matrix(compose_trs(t, quat_identity(), np.full(3, k, np.float32)))

    # lights (reference: 3 rotating spots + 1 directional)
    scene.add_directional_light((0.35, -1.0, 0.25), (2.2, 2.1, 1.9))
    spot_ids = [
        scene.add_spot_light((np.cos(a) * 5, 6, np.sin(a) * 5), (0, -1, 0),
                             (60, 56, 50), 20, 35)
        for a in (0.0, 2.1, 4.2)
    ]

    # ---- systems ---------------------------------------------------------
    def bounce_spheres(world):
        t = world.get(GameTimer).elapsed
        batch = world.query("base_xz", "phase", "handle_idx")
        xz = batch.col("base_xz")  # (N,2) — whole grid in one expression
        y = 0.3 + np.abs(np.sin(t * 2.0 + batch.col("phase")))
        mats = np.tile(np.eye(4, dtype=np.float32), (len(batch), 1, 1))
        mats[:, 0, 3] = xz[:, 0]
        mats[:, 1, 3] = y
        mats[:, 2, 3] = xz[:, 1]
        for idx, m in zip(batch.col("handle_idx"), mats):
            handles[int(idx)].set_matrix(m)

    def animate(world):
        t = world.get(GameTimer).elapsed
        man1.set_time(t)
        man2.set_time(t + 0.7)
        sc = world.get(SceneT)
        for k, sid in enumerate(spot_ids):
            a = t * 0.8 + k * 2.1
            sl = sc.lights.spot.get_mut(sid)
            sl.position = np.array([np.cos(a) * 5, 6, np.sin(a) * 5], np.float32)

    fps = Averager(100)

    def overlay(world):
        timer = world.get(GameTimer)
        if timer.dt > 0:
            fps.add(1.0 / timer.dt)
        font.draw(Section(
            screen_position=(10, 10),
            texts=[Text(f"FPS {fps.average():5.1f}  frame {timer.frame}", px=22)],
        ))

    app.with_system(bounce_spheres).with_system(animate).with_system(overlay)
    app.camera.look_at(np.array([5.5, 4.0, 7.0], np.float32),
                       np.array([0, 1.2, 0], np.float32))
    app.camera.fov = 62

    # ---- run -------------------------------------------------------------
    t = Timer()
    for i in range(args.frames):
        frame = app.render_frame()
        from PIL import Image

        Image.fromarray(frame).save(f"{args.out_dir}/frame_{i:04d}.png")
        st = backend.stats
        print(f"frame {i}: {t.elapsed_ms():.0f}ms  "
              f"(sync {st['sync_ms'].last():.0f}ms, "
              f"render {st['render_ms'].last():.0f}ms, "
              f"{st['mrays_per_s'].last():.1f} Mray/s)")
        t.reset()


if __name__ == "__main__":
    main()
