"""Loader tests: OBJ/MTL fixture + glTF assets from the reference repo."""

import os

import numpy as np
import pytest

from rfw_tpu.scene.materials import Materials
from rfw_tpu.loaders.obj import ObjLoader
from rfw_tpu.loaders.gltf import GltfLoader

PICA = "/root/reference/assets/models/pica/scene.gltf"
CESIUM = "/root/reference/assets/models/CesiumMan/CesiumMan.gltf"


@pytest.fixture
def obj_fixture(tmp_path):
    """Two-material cube-ish OBJ with MTL (the reference assets ship no .obj
    geometry, only sponza/sibenik .mtl + textures)."""
    mtl = tmp_path / "fix.mtl"
    mtl.write_text(
        "newmtl red\nNs 96.0\nKd 0.8 0.1 0.1\nKs 0.5 0.5 0.5\nNi 1.45\nd 1.0\n"
        "\nnewmtl glow\nKd 1 1 1\nKe 5.0 4.0 3.0\n"
    )
    obj = tmp_path / "fix.obj"
    obj.write_text(
        "mtllib fix.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "v 0 0 1\nv 1 0 1\nv 1 1 1\nv 0 1 1\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "vn 0 0 -1\nvn 0 0 1\n"
        "usemtl red\n"
        "f 1/1/1 3/3/1 2/2/1\nf 1/1/1 4/4/1 3/3/1\n"
        "usemtl glow\n"
        "f 5/1/2 6/2/2 7/3/2\nf 5/1/2 7/3/2 8/4/2\n"
        # negative indices quad (auto-triangulated fan)
        "usemtl red\n"
        "f -8 -7 -6 -5\n"
    )
    return str(obj)


class TestObj:
    def test_parse_and_materials(self, obj_fixture):
        mats = Materials()
        res = ObjLoader().load(obj_fixture, mats)
        mesh = res.mesh
        assert mesh.num_triangles == 6  # 2 + 2 + quad fan(2)
        red = next(m for _, m in mats.materials if m.name == "red")
        assert abs(red.color[0] - 0.8) < 1e-6
        assert abs(red.eta - 1.45) < 1e-6
        # Ns 96 -> roughness sqrt(2/98)
        assert abs(red.roughness - np.sqrt(2.0 / 98.0)) < 1e-5
        glow = next(m for _, m in mats.materials if m.name == "glow")
        assert glow.is_emissive and glow.color[0] == 5.0

    def test_normals_from_file(self, obj_fixture):
        mats = Materials()
        mesh = ObjLoader().load(obj_fixture, mats).mesh
        # faces with explicit vn 0 0 -1 / 0 0 1 keep those normals
        assert set(np.round(np.abs(mesh.normals[:, 2]), 3)) <= {0.0, 1.0}

    def test_missing_extension_raises(self):
        from rfw_tpu.scene import Scene, SceneError

        with pytest.raises(SceneError):
            Scene().load("/nonexistent/file.fbx")


class TestGltf:
    def test_pica_counts(self):
        mats = Materials()
        sd = GltfLoader().load(PICA, mats)
        assert len(sd.meshes) == 170
        assert len(sd.nodes) == 339
        assert sum(m.num_triangles for m in sd.meshes) == 76274

    def test_cesium_skin_and_animation(self):
        mats = Materials()
        sd = GltfLoader().load(CESIUM, mats)
        m = sd.meshes[0]
        assert m.has_skin
        assert m.joints.shape == (m.num_vertices, 4)
        np.testing.assert_allclose(m.weights.sum(-1), 1.0, atol=1e-4)
        assert len(sd.skins[0].joint_nodes) == 19
        assert sd.skins[0].inverse_bind_matrices.shape == (19, 4, 4)
        anim = sd.animations[0]
        assert abs(anim.duration - 2.0) < 1e-3
        paths = {c.path for c in anim.channels}
        assert {"translation", "rotation"} <= paths


def test_gltf_srgb_classification():
    """Only baseColor/emissive textures are sRGB; normal and metallic-
    roughness maps are linear data and must not be gamma-decoded."""
    from rfw_tpu.loaders.gltf import _srgb_texture_set

    class Fake:
        json = {
            "materials": [
                {
                    "pbrMetallicRoughness": {
                        "baseColorTexture": {"index": 0},
                        "metallicRoughnessTexture": {"index": 1},
                    },
                    "normalTexture": {"index": 2},
                    "emissiveTexture": {"index": 3},
                }
            ]
        }

    assert _srgb_texture_set(Fake()) == {0, 3}


def test_texture_view_carries_srgb():
    import numpy as np

    from rfw_tpu.scene.materials import Texture

    rgba = np.zeros((64, 64, 4), np.uint8)
    assert Texture.from_array(rgba, srgb=False).view().srgb is False
    assert Texture.from_array(rgba, srgb=True).view().srgb is True


def test_gltf_strided_accessor_at_buffer_end():
    """A bufferView ending exactly at the last element's itemsize (glTF only
    guarantees stride*(count-1)+itemsize bytes) must resolve, not raise."""
    import numpy as np

    from rfw_tpu.loaders.gltf import _Gltf

    count, stride = 4, 20  # vec3 f32 (12B) interleaved at 20B stride
    buf = bytearray(stride * (count - 1) + 12)
    expect = np.arange(count * 3, dtype=np.float32).reshape(count, 3)
    for i in range(count):
        buf[i * stride : i * stride + 12] = expect[i].tobytes()

    g = _Gltf.__new__(_Gltf)
    g.json = {
        "accessors": [{
            "componentType": 5126, "type": "VEC3", "count": count,
            "bufferView": 0,
        }],
        "bufferViews": [{"buffer": 0, "byteStride": stride}],
        "buffers": [{}],
    }
    g.bin = bytes(buf)
    g._buffers = {}
    g.base = "."
    np.testing.assert_array_equal(g.accessor(0), expect)
