"""Scene snapshot / resume.

Reference (feature `serde`): SerializableScene (rfw-scene/src/lib.rs:157-203)
+ per-mesh bincode with material/texture remap (objects_3d/mod.rs:519-671),
camera `.cam` files (camera/mod.rs:318-339), saved by Instance::save_scene
as `.scenev1` (rfw/src/lib.rs:292-298).

TPU rebuild: one compressed npz holding every SoA array + a JSON manifest —
meshes, instance pools, materials, textures (base mip only; mips regen on
load), lights, cameras, and optionally the progressive film accumulator
(so long renders resume mid-accumulation). Extension: `.scenev1.npz`.
"""

from __future__ import annotations

import json
from typing import Dict, Optional, Tuple

import numpy as np

from rfw_tpu.models.mesh3d import Mesh3D
from rfw_tpu.scene.camera import Camera3D
from rfw_tpu.scene.materials import Material, Texture
from rfw_tpu.scene.scene import Scene

EXTENSION = ".scenev1.npz"
_MAT_FIELDS = (
    "metallic subsurface specular_f roughness specular_tint anisotropic sheen "
    "sheen_tint clearcoat clearcoat_gloss transmission eta custom0 custom1 "
    "custom2 custom3 diffuse_tex normal_tex metallic_roughness_tex emissive_tex "
    "sheen_tex custom_tex double_sided"
).split()


def save_scene(scene: Scene, path: str, camera: Optional[Camera3D] = None,
               film: Optional[np.ndarray] = None, spp: int = 0) -> None:
    if not path.endswith(EXTENSION):
        path += EXTENSION
    arrays: Dict[str, np.ndarray] = {}
    manifest: Dict = {"version": 1, "meshes": [], "materials": [], "textures": [],
                      "lights": {}, "instances": {}}

    for slot, mesh in scene.meshes_3d:
        key = f"mesh{slot}"
        manifest["meshes"].append({"slot": slot, "name": mesh.name,
                                   "has_skin": mesh.has_skin})
        arrays[f"{key}_positions"] = mesh.positions
        arrays[f"{key}_normals"] = mesh.normals
        arrays[f"{key}_uvs"] = mesh.uvs
        arrays[f"{key}_tangents"] = mesh.tangents
        arrays[f"{key}_indices"] = mesh.indices
        arrays[f"{key}_tri_material"] = mesh.tri_material
        arrays[f"{key}_ranges"] = mesh.ranges
        if mesh.has_skin:
            arrays[f"{key}_joints"] = mesh.joints
            arrays[f"{key}_weights"] = mesh.weights

    for slot, il in scene.instances_3d.items():
        arrays[f"inst{slot}_matrices"] = il.matrices
        arrays[f"inst{slot}_skin_ids"] = il.skin_ids
        arrays[f"inst{slot}_active"] = il.active
        manifest["instances"][str(slot)] = int(il.capacity)

    for idx, mat in scene.materials.materials:
        entry = {"slot": idx, "name": mat.name}
        entry.update({f: (getattr(mat, f) if not isinstance(getattr(mat, f), bool)
                          else bool(getattr(mat, f))) for f in _MAT_FIELDS})
        manifest["materials"].append(entry)
        arrays[f"mat{idx}_color"] = mat.color
        arrays[f"mat{idx}_specular"] = mat.specular
        arrays[f"mat{idx}_absorption"] = mat.absorption

    for idx, tex in scene.materials.textures:
        manifest["textures"].append({"slot": idx, "srgb": tex.srgb, "path": tex.path})
        arrays[f"tex{idx}_base"] = tex.mips[0]

    lights = scene.lights
    manifest["lights"]["point"] = [
        {"slot": i} for i, _ in lights.point
    ]
    for i, l in lights.point:
        arrays[f"plight{i}"] = np.concatenate([l.position, l.energy])
    manifest["lights"]["spot"] = [
        {"slot": i, "inner": l.inner_angle, "outer": l.outer_angle}
        for i, l in lights.spot
    ]
    for i, l in lights.spot:
        arrays[f"slight{i}"] = np.concatenate([l.position, l.direction, l.energy])
    manifest["lights"]["directional"] = [{"slot": i} for i, _ in lights.directional]
    for i, l in lights.directional:
        arrays[f"dlight{i}"] = np.concatenate([l.direction, l.energy])

    if camera is not None:
        arrays["camera"] = np.concatenate([
            camera.position, camera.direction,
            np.array([camera.fov, camera.aperture, camera.focal_distance,
                      camera.near_plane, camera.far_plane, camera.speed], np.float32),
        ])
    if film is not None:
        arrays["film"] = np.asarray(film)
        manifest["film_spp"] = int(spp)

    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_scene(path: str) -> Tuple[Scene, Optional[Camera3D], Optional[np.ndarray], int]:
    """Returns (scene, camera, film, spp)."""
    if not path.endswith(EXTENSION):
        path += EXTENSION
    data = np.load(path, allow_pickle=False)
    manifest = json.loads(bytes(data["__manifest__"]).decode())

    scene = Scene()
    # materials: slot 0/default already exist — overwrite by slot
    for entry in manifest["materials"]:
        idx = entry["slot"]
        mat = Material(name=entry.get("name", ""))
        for f in _MAT_FIELDS:
            setattr(mat, f, entry[f])
        mat.color = data[f"mat{idx}_color"].astype(np.float32)
        mat.specular = data[f"mat{idx}_specular"].astype(np.float32)
        mat.absorption = data[f"mat{idx}_absorption"].astype(np.float32)
        scene.materials.materials.overwrite(idx, mat)

    for entry in manifest["textures"]:
        idx = entry["slot"]
        tex = Texture.from_array(data[f"tex{idx}_base"], path=entry.get("path"),
                                 srgb=entry.get("srgb", True))
        scene.materials.textures.overwrite(idx, tex)

    for m in manifest["meshes"]:
        slot = m["slot"]
        key = f"mesh{slot}"
        mesh = Mesh3D(
            positions=data[f"{key}_positions"],
            normals=data[f"{key}_normals"],
            uvs=data[f"{key}_uvs"],
            tangents=data[f"{key}_tangents"],
            indices=data[f"{key}_indices"],
            tri_material=data[f"{key}_tri_material"],
            tri_light=np.full(data[f"{key}_indices"].shape[0], -1, np.int32),
            ranges=data[f"{key}_ranges"],
            joints=data[f"{key}_joints"] if m["has_skin"] else None,
            weights=data[f"{key}_weights"] if m["has_skin"] else None,
            aabb_min=data[f"{key}_positions"].min(axis=0),
            aabb_max=data[f"{key}_positions"].max(axis=0),
            name=m.get("name", ""),
        )
        scene.meshes_3d.overwrite(slot, mesh)
        from rfw_tpu.scene.instances import InstanceList3D

        il = InstanceList3D()
        if f"inst{slot}_matrices" in data:
            il.matrices = data[f"inst{slot}_matrices"].astype(np.float32)
            il.skin_ids = data[f"inst{slot}_skin_ids"].astype(np.int32)
            il.active = data[f"inst{slot}_active"].astype(bool)
            il.changed = np.ones_like(il.active)
            il._free = [i for i in range(il.capacity) if not il.active[i]]
            il.any_changed = True
        scene.instances_3d[slot] = il
    scene._instances_changed = True

    from rfw_tpu.scene.lights import DirectionalLight, PointLight, SpotLight

    for e in manifest["lights"]["point"]:
        v = data[f"plight{e['slot']}"]
        scene.lights.point.overwrite(e["slot"], PointLight(v[:3], v[3:6]))
    for e in manifest["lights"]["spot"]:
        v = data[f"slight{e['slot']}"]
        scene.lights.spot.overwrite(
            e["slot"], SpotLight(v[:3], v[3:6], v[6:9], e["inner"], e["outer"])
        )
    for e in manifest["lights"]["directional"]:
        v = data[f"dlight{e['slot']}"]
        scene.lights.directional.overwrite(e["slot"], DirectionalLight(v[:3], v[3:6]))

    camera = None
    if "camera" in data:
        c = data["camera"]
        camera = Camera3D(position=c[:3].astype(np.float32),
                          direction=c[3:6].astype(np.float32),
                          fov=float(c[6]), aperture=float(c[7]),
                          focal_distance=float(c[8]), near_plane=float(c[9]),
                          far_plane=float(c[10]), speed=float(c[11]))
    film = data["film"] if "film" in data else None
    spp = manifest.get("film_spp", 0)
    return scene, camera, film, spp
