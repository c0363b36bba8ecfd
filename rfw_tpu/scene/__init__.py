from rfw_tpu.scene.materials import Material, Materials, Texture
from rfw_tpu.scene.descriptor import MeshDescriptor, NodeDescriptor, SceneDescriptor, SkinDescriptor
