"""Asset loaders (reference crates/rfw-scene/src/loaders/).

Each loader implements `load(path, materials) -> MeshDescriptor | SceneDescriptor`
against the target Materials store (texture/material ids pre-remapped).
Dispatch by extension lives in Scene.load (reference lib.rs:271-300).
"""

from rfw_tpu.loaders.obj import ObjLoader
from rfw_tpu.loaders.gltf import GltfLoader

LOADERS = {
    ".obj": ObjLoader(),
    ".gltf": GltfLoader(),
    ".glb": GltfLoader(),
}
