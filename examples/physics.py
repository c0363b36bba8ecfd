"""Physics-coupled demo (reference examples/nphysics/src/main.rs:1-379):
spheres dropped on a plane, impulse on a key/frame trigger, physics state
copied into scene instance transforms each frame -> per-frame TLAS rebuild
+ path trace + FPS overlay. BASELINE.json config 5.

Usage: python examples/physics.py [--frames 10] [--size 320x180] [--spp 2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--size", default="320x180")
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--balls", type=int, default=12,
                    help="sphere instance count (large pools exercise the "
                         "device instance-motion path, gated at >= 64)")
    ap.add_argument("--out-dir", default="/tmp/physics")
    args = ap.parse_args(argv)
    W, H = (int(x) for x in args.size.split("x"))
    os.makedirs(args.out_dir, exist_ok=True)

    from rfw_tpu.app import Instance
    from rfw_tpu.app.timer import GameTimer
    from rfw_tpu.font import FontPlugin, Section, Text
    from rfw_tpu.models import plane, sphere
    from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings
    from rfw_tpu.scene import Material
    from rfw_tpu.utils.physics import SphereWorld

    backend = TpuBackend(W, H, TpuSettings(samples_per_frame=args.spp,
                                           max_bounces=2, sky_intensity=0.6))
    app = Instance(backend, W, H)
    scene = app.scene
    font = FontPlugin()
    app.with_plugin(font)

    mat_floor = scene.add_material(Material(
        color=np.array([0.55, 0.55, 0.6, 1], np.float32), roughness=0.9))
    mat_ball = scene.add_material(Material(
        color=np.array([0.8, 0.35, 0.2, 1], np.float32), roughness=0.35,
        metallic=0.6))

    floor_id = scene.add_3d_object(plane(up=(0, 1, 0), size=(20, 20),
                                         material_id=mat_floor))
    scene.add_3d_instance(floor_id)
    ball = sphere(quality=2, radius=0.5, material_id=mat_ball)
    ball_id = scene.add_3d_object(ball)

    world = SphereWorld.new()
    handles = []
    rng = np.random.default_rng(3)
    side = max(1.5, 0.45 * float(args.balls) ** 0.5 * 1.2)
    for k in range(args.balls):
        p = np.array([rng.uniform(-side, side), 2.0 + (k % 24) * 1.1,
                      rng.uniform(-side, side)], np.float32)
        world.add_sphere(p, radius=0.5)
        handles.append(scene.add_3d_instance(ball_id))

    scene.add_directional_light((0.4, -1, 0.3), (2.5, 2.4, 2.2))
    scene.add_point_light((0, 6, 4), (40, 40, 42))

    def physics_system(w):
        timer = w.get(GameTimer)
        dt = min(max(timer.dt, 1e-3), 0.05)
        if timer.frame == 5:  # the reference applies an impulse on spacebar
            world.apply_impulse_all((0.0, 5.0, 0.0))
        world.step(dt)
        for i, h in enumerate(handles):
            h.set_trs(world.positions[i], (0, 0, 0, 1), (1, 1, 1))

    def overlay(w):
        timer = w.get(GameTimer)
        font.draw(Section((8, 8), [Text(f"physics frame {timer.frame}", px=18)]))

    app.with_system(physics_system).with_system(overlay)
    app.camera.look_at(np.array([6, 4.5, 8], np.float32),
                       np.array([0, 1, 0], np.float32))
    app.camera.fov = 50

    from PIL import Image

    import time as _time

    ms = []
    for i in range(args.frames):
        t0 = _time.perf_counter()
        frame = app.render_frame()  # sync + render + film pull
        ms.append((_time.perf_counter() - t0) * 1e3)
        Image.fromarray(frame).save(f"{args.out_dir}/frame_{i:04d}.png")
        print(f"frame {i} ok  {ms[-1]:.1f} ms", flush=True)
    if len(ms) > 4:
        steady = sorted(ms[4:])
        print(f"steady-state median {steady[len(steady) // 2]:.1f} ms/frame "
              f"(frames 4..{args.frames - 1})", flush=True)


if __name__ == "__main__":
    main()
