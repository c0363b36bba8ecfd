"""2D demo (reference examples/d2/src/main.rs:1-195): textured/colored 2D
quads + font rendering composited by the backend's 2D pass — here over an
empty 3D film.

Usage: python examples/d2.py [--size 640x360] [--frames 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="640x360")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--out-dir", default="/tmp/d2")
    args = ap.parse_args(argv)
    W, H = (int(x) for x in args.size.split("x"))
    os.makedirs(args.out_dir, exist_ok=True)

    from rfw_tpu.app import Instance
    from rfw_tpu.app.timer import GameTimer
    from rfw_tpu.font import FontPlugin, Section, Text
    from rfw_tpu.mathx import compose_trs
    from rfw_tpu.models import quad2d, sphere
    from rfw_tpu.render.tpu_backend import TpuBackend, TpuSettings
    from rfw_tpu.scene import Material, Texture

    backend = TpuBackend(W, H, TpuSettings(samples_per_frame=1, max_bounces=1,
                                           sky_intensity=0.12))
    app = Instance(backend, W, H)
    scene = app.scene
    font = FontPlugin()
    app.with_plugin(font)

    # a minimal 3D backdrop so the film isn't empty
    m = scene.add_material(Material(color=np.array([0.3, 0.4, 0.6, 1], np.float32)))
    sid = scene.add_3d_object(sphere(quality=1, material_id=m))
    scene.add_3d_instance(sid)
    scene.add_point_light((2, 2, 3), (20, 20, 20))
    app.camera.look_at(np.array([0, 0, 4], np.float32), np.zeros(3, np.float32))

    # checkerboard texture for the 2D quad
    c = np.indices((64, 64)).sum(axis=0) % 2
    tex = np.stack([c * 255, 64 + c * 128, 255 - c * 200, np.full_like(c, 255)],
                   axis=-1).astype(np.uint8)
    tex_id = scene.add_texture(Texture.from_array(tex))

    # 2D meshes: one textured quad + one vertex-colored quad (pixel space)
    q1 = quad2d(center=(140, 180), size=(160, 160), texture_id=tex_id)
    q1_id = scene.add_2d_object(q1)
    scene.add_2d_instance(q1_id)

    q2 = quad2d(center=(420, 200), size=(120, 80), color=(1.0, 0.4, 0.2, 0.8))
    q2_id = scene.add_2d_object(q2)
    h2 = scene.add_2d_instance(q2_id)

    def spin(world):
        t = world.get(GameTimer).elapsed
        # rotate the colored quad about its center in pixel space
        cx, cy = 420, 200
        a = t * 1.5
        rot = np.eye(4, dtype=np.float32)
        rot[0, 0] = np.cos(a)
        rot[0, 1] = -np.sin(a)
        rot[1, 0] = np.sin(a)
        rot[1, 1] = np.cos(a)
        tr1 = np.eye(4, dtype=np.float32)
        tr1[:2, 3] = (-cx, -cy)
        tr2 = np.eye(4, dtype=np.float32)
        tr2[:2, 3] = (cx, cy)
        h2.set_matrix(tr2 @ rot @ tr1)
        font.draw(Section((16, 12), [Text("rfw-tpu 2D", px=32)]))
        font.draw(Section((16, 52), [Text(f"frame {world.get(GameTimer).frame}",
                                          px=18, color=(1, 0.8, 0.3, 1))]))

    app.with_system(spin)

    from PIL import Image

    for i in range(args.frames):
        frame = app.render_frame()
        Image.fromarray(frame).save(f"{args.out_dir}/frame_{i:04d}.png")
        print(f"frame {i} ok", flush=True)


if __name__ == "__main__":
    main()
