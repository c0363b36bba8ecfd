"""Multi-chip scale-out: film-tile data parallelism over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.9: no multi-process, no
collectives). This module is the *new* TPU capability: shard pixel/ray
space across chips with `jax.sharding` (DP over film tiles), replicate the
scene arenas (they fit HBM), and let XLA insert the collectives. The film
accumulator lives sharded; only the final tonemapped frame (or periodic
progressive snapshots) is gathered — so the per-sample loop needs *zero*
cross-chip traffic on ICI beyond what jit emits for the replicated scene
(nothing), exactly the layout SURVEY.md §5 prescribes.

Design notes:
  * ray count R = width*height must be divisible by the mesh size — film
    rows pad to the mesh (1080p = 2,073,600 pixels divides 2/4/8 chips).
  * `render_sample` is per-ray elementwise over its R axis apart from
    gathers into replicated scene arrays, so sharding its ray inputs
    shards the whole integrator without code changes — the payoff of the
    functional wavefront design.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def film_mesh(n_devices: Optional[int] = None, axis: str = "film") -> Mesh:
    """1-D device mesh over film tiles."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_rays(mesh: Mesh, *arrays: jax.Array, axis: str = "film"):
    """Place per-ray arrays sharded over the mesh's film axis."""
    sh = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def render_sample_sharded(
    mesh: Mesh,
    scene,
    mats,
    atlas,
    lights,
    view: jax.Array,
    key: jax.Array,
    width: int,
    height: int,
    config=None,
    axis: str = "film",
):
    """Render one spp with rays sharded across the mesh.

    Returns a SampleResult whose arrays are sharded over `axis`; call
    `jax.device_get` (or film.tonemap after an all-gather via device_put to
    a replicated sharding) when a full frame is needed.
    """
    from rfw_tpu.render.wavefront import RenderConfig, render_sample

    config = config or RenderConfig()
    scene_r = replicate(mesh, scene)
    mats_r = replicate(mesh, mats)
    atlas_r = replicate(mesh, atlas)
    lights_r = replicate(mesh, lights)
    view_r = jax.device_put(view, NamedSharding(mesh, P()))
    key_r = jax.device_put(key, NamedSharding(mesh, P()))

    ray_sharding = NamedSharding(mesh, P(axis))

    # Ray generation happens inside render_sample from iota; every output is
    # per-ray, so a single out_shardings entry (a pytree prefix) forces the
    # pixel axis to shard over the film mesh *inside* the compiled program —
    # not as an after-the-fact constraint on already-materialized outputs.
    fn = jax.jit(
        functools.partial(render_sample, width=width, height=height, config=config),
        out_shardings=ray_sharding,
    )
    with mesh:
        return fn(scene_r, mats_r, atlas_r, lights_r, view_r, key_r)


def mesh_2d(n_spp: int, n_film: int) -> Mesh:
    """2-D device mesh: samples x film tiles (e.g. a v5e-8 as 2x4)."""
    devs = np.array(jax.devices()[: n_spp * n_film]).reshape(n_spp, n_film)
    return Mesh(devs, ("spp", "film"))


def render_sharded_2d(
    mesh: Mesh,
    scene,
    mats,
    atlas,
    lights,
    view: jax.Array,
    key: jax.Array,
    width: int,
    height: int,
    spp: int,
    config=None,
):
    """Hybrid scale-out over a 2-D (spp, film) mesh: each device renders
    ITS film strip for ITS slice of the samples; the sample mean reduces
    over the spp axis (one psum on ICI), leaving the film sharded over
    the film axis. Combines the two 1-D strategies: more chips than film
    tiles can load-balance, more samples than chips stay parallel.

    Implementation: shard_map over BOTH axes — each shard runs plain
    per-shard render_sample calls on its film strip (row0 from
    lax.axis_index), so data-dependent control flow like the live-prefix
    compaction lax.switch stays un-vmapped and fully active (an earlier
    vmap formulation executed every switch branch, silently turning the
    round-3 compaction win off on the flagship scale-out path).

    With the "sobol" sampler pass per-sample indices: sampling is then
    pixel-keyed and the result is bit-identical to the sequential mean.
    The "random" sampler draws lane-shaped uniforms, so strip splits
    change the randoms (still an unbiased estimator, not bit-equal).
    Returns the (R,3) mean radiance sharded over the film axis.
    """
    from jax import shard_map

    from rfw_tpu.render.wavefront import RenderConfig, render_sample

    config = config or RenderConfig()
    n_spp_ax, n_film = mesh.devices.shape
    assert spp % n_spp_ax == 0, f"spp {spp} must divide the spp axis {n_spp_ax}"
    assert height % n_film == 0, f"height {height} must divide {n_film} strips"
    h_loc = height // n_film
    r_loc = width * h_loc
    spp_loc = spp // n_spp_ax
    keys = jax.random.split(key, spp)

    scene_r = replicate(mesh, scene)
    mats_r = replicate(mesh, mats)
    atlas_r = replicate(mesh, atlas)
    lights_r = replicate(mesh, lights)
    view_r = jax.device_put(view, NamedSharding(mesh, P()))
    use_sobol = config.sampler == "sobol"

    def body(keys_local):
        row0 = jax.lax.axis_index("film").astype(jnp.int32) * h_loc
        s0 = jax.lax.axis_index("spp").astype(jnp.uint32) * spp_loc

        def one(i, acc):
            r = render_sample(
                scene_r, mats_r, atlas_r, lights_r, view_r, keys_local[i],
                width, h_loc, config,
                sample_index=(s0 + i.astype(jnp.uint32)) if use_sobol
                else None,
                row0=row0,
            )
            return acc + r.radiance

        acc = jax.lax.fori_loop(
            0, spp_loc, one, jnp.zeros((r_loc, 3), jnp.float32))
        return jax.lax.psum(acc, "spp")

    f = jax.jit(shard_map(
        body, mesh=mesh, in_specs=P("spp"), out_specs=P("film"),
        check_vma=False,
    ))
    with mesh:
        return f(jax.device_put(keys, NamedSharding(mesh, P("spp")))) / spp


def render_spp_sharded(
    mesh: Mesh,
    scene,
    mats,
    atlas,
    lights,
    view: jax.Array,
    key: jax.Array,
    width: int,
    height: int,
    spp: int,
    config=None,
    axis: str = "spp",
):
    """Sample-parallel scale-out: each device renders DIFFERENT samples of
    the FULL frame; the accumulated radiance reduces with one psum on ICI.

    The complementary strategy to film-tile DP: film tiles shard pixels
    (zero collectives, load-imbalanced when scene complexity is uneven
    across the frame), spp sharding replicates pixels (one (R,3) psum per
    batch, perfectly load-balanced because every chip renders the whole
    frame). spp must divide by the mesh size. Returns the (R,3) mean
    radiance, fully replicated.
    """
    from jax import shard_map

    from rfw_tpu.render.wavefront import RenderConfig, render_sample

    config = config or RenderConfig()
    n_dev = int(np.prod(mesh.devices.shape))
    assert spp % n_dev == 0, f"spp {spp} must divide the {n_dev}-device mesh"
    keys = jax.random.split(key, spp)

    scene_r = replicate(mesh, scene)
    mats_r = replicate(mesh, mats)
    atlas_r = replicate(mesh, atlas)
    lights_r = replicate(mesh, lights)
    view_r = jax.device_put(view, NamedSharding(mesh, P()))
    R = width * height

    def body(keys_local):
        def one(i, acc):
            r = render_sample(
                scene_r, mats_r, atlas_r, lights_r, view_r, keys_local[i],
                width, height, config,
            )
            return acc + r.radiance

        acc = jax.lax.fori_loop(
            0, keys_local.shape[0], one, jnp.zeros((R, 3), jnp.float32))
        return jax.lax.psum(acc, axis)

    f = jax.jit(shard_map(
        body, mesh=mesh, in_specs=P(axis), out_specs=P(),
        check_vma=False,
    ))
    with mesh:
        return f(jax.device_put(keys, NamedSharding(mesh, P(axis)))) / spp
