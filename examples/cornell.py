"""Cornell-box path-trace demo (BASELINE.json config 3): area light, NEE +
BSDF sampling with MIS, progressive accumulation. Writes a PNG.

Usage: python examples/cornell.py [--size 256] [--spp 16] [--out cornell.png]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_cornell():
    """Cornell box: 5 walls + 2 blocks + area light, using cbox.mtl-style
    materials (reference assets/models/cbox.mtl: Light Kd 10 10 10 emissive,
    colored walls)."""
    from rfw_tpu.models import cube, quad3d
    from rfw_tpu.models.mesh3d import Mesh3D, build_mesh3d
    from rfw_tpu.scene.materials import Material, Materials

    mats = Materials()
    white = mats.push(Material(name="white", color=np.array([0.73, 0.73, 0.73, 1], np.float32), roughness=1.0, specular_f=0.0))
    red = mats.push(Material(name="red", color=np.array([0.63, 0.065, 0.05, 1], np.float32), roughness=1.0, specular_f=0.0))
    green = mats.push(Material(name="green", color=np.array([0.14, 0.45, 0.091, 1], np.float32), roughness=1.0, specular_f=0.0))
    light = mats.push(Material(name="light", color=np.array([17.0, 12.0, 4.0, 1], np.float32)))

    parts = [
        quad3d(normal=(0, 1, 0), position=(0, 0, 0), width=2, height=2, material_id=white),  # floor
        quad3d(normal=(0, -1, 0), position=(0, 2, 0), width=2, height=2, material_id=white),  # ceiling
        quad3d(normal=(0, 0, 1), position=(0, 1, -1), width=2, height=2, material_id=white),  # back
        quad3d(normal=(1, 0, 0), position=(-1, 1, 0), width=2, height=2, material_id=red),  # left
        quad3d(normal=(-1, 0, 0), position=(1, 1, 0), width=2, height=2, material_id=green),  # right
        cube(position=(-0.35, 0.6, -0.35), size=(0.6, 1.2, 0.6), material_id=white),
        cube(position=(0.4, 0.3, 0.3), size=(0.6, 0.6, 0.6), material_id=white),
        quad3d(normal=(0, -1, 0), position=(0, 1.98, 0), width=0.5, height=0.5, material_id=light),
    ]

    # merge into one mesh
    pos = np.concatenate([p.positions for p in parts])
    off = np.cumsum([0] + [p.num_vertices for p in parts[:-1]])
    idx = np.concatenate([p.indices + off[i] for i, p in enumerate(parts)])
    nrm = np.concatenate([p.normals for p in parts])
    uv = np.concatenate([p.uvs for p in parts])
    mat_ids = np.concatenate([p.tri_material for p in parts])
    mesh = build_mesh3d(pos, idx, normals=nrm, uvs=uv, material_ids=mat_ids, name="cornell")
    return mesh, mats


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--out", default="cornell.png")
    ap.add_argument("--honest", action="store_true",
                    help="warm up outside the timer and force a per-spp "
                         "device scalar pull (the only clock that blocks "
                         "over the axon tunnel)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rfw_tpu.render import pack_trace_scene
    from rfw_tpu.render.pack import TraceScene
    from rfw_tpu.render.atlas import pack_atlas, atlas_to_device
    from rfw_tpu.render.lights_pack import pack_lights, DeviceLights
    from rfw_tpu.render.wavefront import RenderConfig, render_sample
    from rfw_tpu.render.film import add_sample, frame_to_host, new_film, tonemap
    from rfw_tpu.scene.camera import Camera3D
    from rfw_tpu.scene.lights import extract_area_lights
    from rfw_tpu.backend.lights import (
        DirectionalLightsView, PointLightsView, SpotLightsView,
    )
    from rfw_tpu.backend.structs import DeviceMaterials

    mesh, mats = build_cornell()

    # area-light extraction (reference update_lights semantics)
    light_flags = mats.light_flags()
    emissive_tri = light_flags[mesh.tri_material]
    radiance = np.stack([mats.get(int(m)).emission for m in mesh.tri_material])
    area_lights, light_id = extract_area_lights(
        emissive_tri, radiance, mesh.tri_vertices(),
        np.eye(4, dtype=np.float32)[None], 0, np.array([0]),
    )
    mesh.tri_light[:] = light_id
    print(f"area lights: {area_lights.count}")

    scene = pack_trace_scene([(0, mesh, None)], [(0, np.eye(4, dtype=np.float32)[None])])
    sd = TraceScene(*[jnp.asarray(x) for x in scene])
    dm = mats.to_device()
    dmats = DeviceMaterials(*[jnp.asarray(getattr(dm, f)) for f in dm.__dataclass_fields__])
    atlas = atlas_to_device(pack_atlas([t for _, t in mats.textures]))
    dl = pack_lights(
        PointLightsView.empty(), SpotLightsView.empty(),
        DirectionalLightsView.empty(), area_lights,
    )
    dl = DeviceLights(*[jnp.asarray(x) for x in dl])

    cam = Camera3D(fov=40).look_at(np.array([0, 1.0, 3.4], np.float32), np.array([0, 1.0, 0], np.float32))
    view = jnp.asarray(cam.get_view(args.size, args.size).as_array())

    cfg = RenderConfig(max_bounces=args.bounces, clamp=100.0)
    film = new_film(args.size, args.size)
    key = jax.random.PRNGKey(7)
    if args.honest:
        # compile outside the timer, then the honest tunnel clock: a
        # device-side scalar reduce pulled per spp (block_until_ready
        # does not block over axon — see CLAUDE.md)
        res = render_sample(sd, dmats, atlas, dl, view,
                            jax.random.fold_in(key, 999),
                            args.size, args.size, cfg)
        np.asarray(jnp.sum(res.radiance))
    t0 = time.time()
    for s in range(args.spp):
        res = render_sample(sd, dmats, atlas, dl, view, jax.random.fold_in(key, s),
                            args.size, args.size, cfg)
        film = add_sample(film, res.radiance)
        if args.honest:
            np.asarray(jnp.sum(res.radiance))
    film.block_until_ready()
    dt = time.time() - t0
    rays = args.size * args.size * args.spp * (args.bounces + 1)
    tag = "honest" if args.honest else "upper bound"
    print(f"{args.spp} spp in {dt:.2f}s ({rays/dt/1e6:.1f} Mrays/s {tag})")

    frame = frame_to_host(tonemap(film, jnp.float32(args.spp), args.size, args.size))
    from PIL import Image
    Image.fromarray(frame).save(args.out)
    print("saved", args.out)


if __name__ == "__main__":
    main()
