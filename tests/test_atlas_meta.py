"""Material-carried texture metadata (wavefront._fetch_material_c).

The per-kind (off0, w0, h0, mip_count, srgb) metadata normally costs one
(R,) gather per texture kind inside sample_bilinear; the integrator
instead packs it into the material block so it rides the existing one-hot
MXU fetch. These tests pin that the carried-metadata path is BIT-identical
to the legacy per-kind gathers at the component level (end-to-end renders
may differ by XLA fusion noise ~1e-7, covered by the golden gates).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rfw_tpu.backend.structs import DeviceMaterials
from rfw_tpu.render.atlas import atlas_to_device, pack_atlas, sample_bilinear
from rfw_tpu.render.wavefront import _fetch_material_c
from rfw_tpu.scene.materials import Texture


def _mk_textures(rng, n):
    texs = []
    for i in range(n):
        side = int(2 ** rng.integers(2, 6))  # 4..32, POT -> meta valid
        img = (rng.random((side, side, 4)) * 255).astype(np.uint8)
        texs.append(Texture.from_array(img, srgb=bool(i % 2)))
    return texs


def _mk_materials(rng, n_mat, n_tex):
    tex = rng.integers(-1, n_tex, (n_mat, 6)).astype(np.int32)
    return DeviceMaterials(
        color=rng.random((n_mat, 4)).astype(np.float32) * 2.0,
        specular=rng.random((n_mat, 4)).astype(np.float32),
        absorption=rng.random((n_mat, 4)).astype(np.float32),
        params=rng.random((n_mat, 16)).astype(np.float32),
        flags=np.zeros(n_mat, np.int32),
        tex=tex,
    )


@pytest.mark.parametrize("trilinear", [False, True])
@pytest.mark.parametrize("tex_mask", [15, 5])
def test_fetch_material_meta_carried_bitwise(trilinear, tex_mask):
    rng = np.random.default_rng(7)
    atlas = atlas_to_device(pack_atlas(_mk_textures(rng, 5)))
    assert atlas.meta is not None  # POT exact-halving chains
    mats = _mk_materials(rng, 12, 5)  # 12 > ONEHOT_MIN -> MXU row fetch
    dmats = DeviceMaterials(*[jnp.asarray(x) for x in (
        mats.color, mats.specular, mats.absorption, mats.params,
        mats.flags, mats.tex)])

    R = 256
    mat_id = jnp.asarray(rng.integers(0, 12, R), jnp.int32)
    uv = (jnp.asarray(rng.random(R) * 3 - 1, jnp.float32),
          jnp.asarray(rng.random(R) * 3 - 1, jnp.float32))
    lod = jnp.asarray(rng.random(R) * 9, jnp.float32)
    entering = jnp.asarray(rng.random(R) > 0.5)

    def run(at):
        p, em, nts, emb, ab = _fetch_material_c(
            dmats, at, mat_id, uv, lod, entering, tex_mask, trilinear)
        return np.stack([np.asarray(x) for x in (
            *p.base_color, p.metallic, p.roughness, *em, *nts, *emb, *ab)])

    carried = run(atlas)
    legacy = run(atlas._replace(meta=None))
    assert np.array_equal(carried, legacy)


@pytest.mark.parametrize("trilinear", [False, True])
def test_sample_bilinear_meta_row_matches_internal(trilinear):
    rng = np.random.default_rng(3)
    atlas = atlas_to_device(pack_atlas(_mk_textures(rng, 4)))
    R = 128
    tid = jnp.asarray(rng.integers(-1, 4, R), jnp.int32)
    uv = (jnp.asarray(rng.random(R), jnp.float32),
          jnp.asarray(rng.random(R), jnp.float32))
    lod = jnp.asarray(rng.random(R) * 6, jnp.float32)

    t = jnp.maximum(tid, 0)
    row = atlas.meta[t]
    meta_row = (row[:, 0], row[:, 1], row[:, 2], row[:, 3], row[:, 4] > 0)
    a = np.asarray(sample_bilinear(atlas, tid, uv, lod, trilinear,
                                   meta_row=meta_row))
    b = np.asarray(sample_bilinear(atlas, tid, uv, lod, trilinear))
    c = np.asarray(sample_bilinear(
        atlas._replace(meta=None), tid, uv, lod, trilinear))
    assert np.array_equal(a, b)
    assert np.array_equal(a, c)
