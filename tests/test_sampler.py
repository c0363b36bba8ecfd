"""Owen-scrambled Sobol sampler: uniformity + stratification + decorrelation."""

import numpy as np
import jax.numpy as jnp

from rfw_tpu.render.sampler import sample_slot, sobol2d


def test_uniform_and_stratified():
    n = 256
    idx = jnp.arange(n, dtype=jnp.uint32)
    seed = jnp.full(n, 12345, jnp.uint32)
    u0, u1 = sobol2d(idx, seed)
    u0 = np.asarray(u0)
    u1 = np.asarray(u1)
    assert (u0 >= 0).all() and (u0 < 1).all()
    # (0,2)-sequence property: any prefix of 2^k samples is stratified —
    # 256 samples must land one per cell of the 16x16 grid
    cells = (np.floor(u0 * 16).astype(int), np.floor(u1 * 16).astype(int))
    occupancy = np.zeros((16, 16), int)
    np.add.at(occupancy, cells, 1)
    assert (occupancy == 1).all()
    # means close to 0.5 (far tighter than random for 256 samples)
    assert abs(u0.mean() - 0.5) < 0.01
    assert abs(u1.mean() - 0.5) < 0.01


def test_pixel_decorrelation():
    n = 128
    idx = jnp.arange(n, dtype=jnp.uint32)
    a = np.asarray(sobol2d(idx, jnp.full(n, 1, jnp.uint32))[0])
    b = np.asarray(sobol2d(idx, jnp.full(n, 2, jnp.uint32))[0])
    # different pixels see different scrambles
    assert np.abs(a - b).max() > 0.1
    r = np.corrcoef(a, b)[0, 1]
    assert abs(r) < 0.35


def test_sample_slot_shapes():
    pid = jnp.arange(64, dtype=jnp.int32)
    u2 = sample_slot(jnp.uint32(3), pid, 0, n=2)
    u3 = sample_slot(jnp.uint32(3), pid, 5, n=3)
    assert u2.shape == (64, 2) and u3.shape == (64, 3)
    assert float(jnp.min(u3)) >= 0.0 and float(jnp.max(u3)) < 1.0
    # traced slot works too
    u = sample_slot(jnp.uint32(3), pid, jnp.int32(7), n=3)
    assert u.shape == (64, 3)
