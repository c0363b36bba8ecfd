"""Pallas phase-A kernel: per-ray K-nearest TLAS instance entries.

The measured round-3 bottleneck (docs/ROUND2.md, tools/bench_items.py):
the jnp lockstep TLAS walk (render.twophase.tlas_entries) costs 1431ms
of the 1687ms two-phase total at 960x544 — it drags a (R,48) stack and
(R,K) insert state through one XLA while_loop, so every iteration
touches the whole ray front. This kernel gives each tile its own
in-VMEM walk like ops.traverse, but with no triangle tests and no
instance re-basing: the TLAS supernodes already live in the merged
scene_t arena (render/pack.py offsets internal TLAS children by the
BLAS node count), rays stay in world space, and a TLAS child with a
negative code IS an instance leaf — its slab entry t gets a branchless
per-lane K-nearest insert into the output refs directly.

Child culling uses the per-lane current K-th best (ts[K-1]) exactly the
way the closest-hit kernel culls with t_best, so the walk sharpens as
lists fill.

Reference anchor: the TLAS level of the reference's two-level MBVH
traversal (backends/gpu-rt intersection.glsl:106-167); emitting entries
instead of recursing into BLAS leaves is the TPU two-phase addition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rfw_tpu.ops.traverse import (
    LANE,
    PallasScene,
    STACK_DEPTH,
    KERNEL_MAX_ITERS,
    auto_chunk,
)
# canonical (8,128)-tile granularity; the stream count follows the
# two-phase pipeline knob (traverse.NSTREAM_TP), NOT the classic
# kernel's RFW_NSTREAM (see traverse_items.py note)
from rfw_tpu.ops.traverse import (
    LANES8 as LANES,
    NSTREAM_TP as NSTREAM,
    SUB8 as SUB,
)

SSUB = SUB // NSTREAM
from rfw_tpu.render.intersect import T_MAX, T_MIN


def _entries_kernel_factory(K: int, batch: int, arity: int = 8):
    def kernel(
        meta_ref,  # SMEM (1,4) i32: [tlas_root, 0, 0, 0]
        scene_ref,  # VMEM (8*arity, Spad) i32 merged supernode columns
        o_ref, d_ref, tlim_ref,  # per-step inputs, leading dim = batch
        ts_ref, ins_ref,  # outputs (batch, K, SUB, LANE) f32 / i32
        inv_ref,  # VMEM scratch (3, SUB, LANE): 1/d per tile
        stack_ref,  # SMEM scratch (NSTREAM, STACK_DEPTH) i32
    ):
        tlas_root = meta_ref[0, 0]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

        def fetch_col(idx):
            base = pl.multiple_of((idx // LANE) * LANE, LANE)
            block = scene_ref[:, pl.ds(base, LANE)]
            onehot = lane_iota == (idx - base)
            return jnp.sum(
                jnp.where(onehot, block, jnp.zeros_like(block)),
                axis=1, keepdims=True,
            )  # (8*arity,1) i32 — box rows bitcast to f32 at use

        def tile_walk(o_ref, d_ref, tlim_ref, ts_ref, ins_ref):
            for j in range(K):
                ts_ref[0, j] = jnp.full((SUB, LANE), jnp.inf, jnp.float32)
                ins_ref[0, j] = jnp.full((SUB, LANE), -1, jnp.int32)

            def safe_inv(x):
                return 1.0 / jnp.where(jnp.abs(x) < 1e-20,
                                       jnp.where(x < 0, -1e-20, 1e-20), x)

            for a in range(3):
                inv_ref[a] = safe_inv(d_ref[0, a])

            def body(carry):
                walks, iters = carry
                new_walks = []
                popped = []
                for k in range(NSTREAM):
                    node, sp, done = walks[k]
                    do_pop = (node == -1) & ~done
                    sp = jnp.where(do_pop, sp - 1, sp)
                    spc = jnp.maximum(sp, 0)
                    node = jnp.where(do_pop, stack_ref[k, spc], node)
                    popped.append((node, sp, done))

                cols = [fetch_col(jnp.maximum(popped[k][0], 0))
                        for k in range(NSTREAM)]

                for k in range(NSTREAM):
                    node, sp, done = popped[k]
                    col = cols[k]
                    boxf = jax.lax.bitcast_convert_type(
                        col[0:6 * arity], jnp.float32)
                    sl = slice(k * SSUB, (k + 1) * SSUB)
                    ox = o_ref[0, 0, sl, :]
                    oy = o_ref[0, 1, sl, :]
                    oz = o_ref[0, 2, sl, :]
                    ix = inv_ref[0, sl, :]
                    iy = inv_ref[1, sl, :]
                    iz = inv_ref[2, sl, :]
                    tlim = tlim_ref[0, sl, :]
                    is_int = (node >= 0) & ~done

                    next_code = jnp.int32(-1)
                    for c in range(arity):
                        mnx = boxf[6 * c + 0:6 * c + 1, 0:1]
                        mny = boxf[6 * c + 1:6 * c + 2, 0:1]
                        mnz = boxf[6 * c + 2:6 * c + 3, 0:1]
                        mxx = boxf[6 * c + 3:6 * c + 4, 0:1]
                        mxy = boxf[6 * c + 4:6 * c + 5, 0:1]
                        mxz = boxf[6 * c + 5:6 * c + 6, 0:1]
                        tx0 = (mnx - ox) * ix
                        tx1 = (mxx - ox) * ix
                        ty0 = (mny - oy) * iy
                        ty1 = (mxy - oy) * iy
                        tz0 = (mnz - oz) * iz
                        tz1 = (mxz - oz) * iz
                        tn = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1),
                                        jnp.minimum(ty0, ty1)),
                            jnp.minimum(tz0, tz1),
                        )
                        tf = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.maximum(tz0, tz1),
                        )
                        # cull against the per-lane K-th best AND t_limit,
                        # comparing the CLAMPED entry t (origin-inside
                        # nodes must not pass on dead lanes, t_limit 0)
                        t_cull = jnp.minimum(ts_ref[0, K - 1, sl, :], tlim)
                        okl = ((tn <= tf) & (tf > T_MIN)
                               & (jnp.maximum(tn, 0.0) < t_cull))
                        hitk = jnp.any(okl) & is_int

                        code = col[6 * arity + c, 0]
                        leaf = code < 0
                        # Unused child slots carry INVERTED boxes (+inf min,
                        # -inf max) which slab as tn=-inf/tf=+inf and would
                        # insert phantom instance-0 entries at t=0 (their
                        # code is -1) — gate inserts on box validity. (The
                        # closest-hit kernels survive without this gate only
                        # because their phantom visits re-test real geometry.)
                        box_ok = (mnx <= mxx) & (mny <= mxy) & (mnz <= mxz)

                        @pl.when(hitk & leaf)
                        def _(k=k, okl=okl, tn=tn, code=code,
                              box_ok=box_ok):
                            # Per sublane row: `code`/`box_ok` are lane
                            # extracts — (1,1) vectors in Mosaic, which
                            # cannot broadcast into both sublanes and lanes
                            # at once (and XLA folds any (1,LANE) staging
                            # right back). With (1,LANE) row operands every
                            # broadcast is lane-only.
                            for s_ in range(SSUB):
                                row = k * SSUB + s_
                                rsl = slice(row, row + 1)
                                oklr = okl[s_:s_ + 1, :] & box_ok
                                tq = jnp.where(
                                    oklr,
                                    jnp.maximum(tn[s_:s_ + 1, :], 0.0),
                                    jnp.float32(jnp.inf))
                                idq = jnp.where(oklr, -code - 1,
                                                jnp.int32(-1))
                                for j in range(K):
                                    cur_t = ts_ref[0, j, rsl, :]
                                    cur_i = ins_ref[0, j, rsl, :]
                                    take = tq < cur_t
                                    ts_ref[0, j, rsl, :] = jnp.where(
                                        take, tq, cur_t)
                                    ins_ref[0, j, rsl, :] = jnp.where(
                                        take, idq, cur_i)
                                    tq = jnp.where(take, cur_t, tq)
                                    idq = jnp.where(take, cur_i, idq)

                        hit_int = hitk & ~leaf
                        do_push = hit_int & (next_code != -1)

                        @pl.when(do_push)
                        def _(k=k, sp=sp, next_code=next_code):
                            slot = jnp.minimum(sp, STACK_DEPTH - 1)
                            stack_ref[k, slot] = next_code

                        sp = jnp.where(do_push,
                                       jnp.minimum(sp + 1, STACK_DEPTH), sp)
                        next_code = jnp.where(hit_int, code, next_code)

                    was_int = node >= 0
                    node = jnp.where(was_int & ~done, next_code,
                                     jnp.int32(-1))
                    exhausted = (node == -1) & (sp <= 0)
                    done = done | exhausted
                    new_walks.append((node, sp, done))

                return tuple(new_walks), iters + 1

            def cond(carry):
                walks, iters = carry
                fin = walks[0][2]
                for k in range(1, NSTREAM):
                    fin = fin & walks[k][2]
                return (~fin) & (iters < KERNEL_MAX_ITERS)

            init = tuple(
                (tlas_root, jnp.int32(0), jnp.bool_(False))
                for _ in range(NSTREAM)
            )
            jax.lax.while_loop(cond, body, (init, jnp.int32(0)))

        def per_batch(b, _):
            s = pl.ds(b, 1)
            tile_walk(o_ref.at[s], d_ref.at[s], tlim_ref.at[s],
                      ts_ref.at[s], ins_ref.at[s])
            return 0

        jax.lax.fori_loop(0, batch, per_batch, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("K", "interpret", "batch"))
def _run_entries_arrays(meta, scene_t, o4, d4, tl3,
                        K: int, interpret: bool = False, batch: int = 1):
    T = o4.shape[0]
    assert T % batch == 0
    kernel = _entries_kernel_factory(K, batch, scene_t.shape[0] // 8)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scene_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile3 = pl.BlockSpec((batch, 3, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    tile1 = pl.BlockSpec((batch, SUB, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    tileK = pl.BlockSpec((batch, K, SUB, LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((T, K, SUB, LANE), jnp.float32),
        jax.ShapeDtypeStruct((T, K, SUB, LANE), jnp.int32),
    )
    return pl.pallas_call(
        kernel,
        grid=(T // batch,),
        in_specs=[smem_spec, scene_spec, tile3, tile3, tile1],
        out_specs=(tileK, tileK),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((3, SUB, LANE), jnp.float32),
            pltpu.SMEM((NSTREAM, STACK_DEPTH), jnp.int32),
        ],
        interpret=interpret,
    )(meta, scene_t, o4, d4, tl3)


def pallas_tlas_entries(ps: PallasScene, ray_o, ray_d, t_limit=T_MAX,
                        K: int = 8, interpret: bool = False):
    """Per ray, the K nearest TLAS instance entries (slab entry t
    ascending; inst -1 / t +inf for empty slots) — the Pallas
    counterpart of render.twophase.tlas_entries, same truncation
    contract (a FULL list may have dropped a nearer-hit instance)."""
    from rfw_tpu.render.twophase import TlasEntries

    R = ray_o.shape[0]
    tile_n = LANES
    T = -(-R // tile_n)
    pad = T * tile_n - R
    tl = jnp.broadcast_to(jnp.asarray(t_limit, jnp.float32), (R,))
    if pad:
        ray_o = jnp.concatenate(
            [ray_o, jnp.zeros((pad, 3), ray_o.dtype)])
        ray_d = jnp.concatenate(
            [ray_d, jnp.ones((pad, 3), ray_d.dtype)])
        tl = jnp.concatenate(
            [tl, jnp.full((pad,), -jnp.inf, tl.dtype)])  # padding lanes dead
    o4 = ray_o.reshape(T, SUB, LANE, 3).transpose(0, 3, 1, 2)
    d4 = ray_d.reshape(T, SUB, LANE, 3).transpose(0, 3, 1, 2)
    tl3 = tl.reshape(T, SUB, LANE)

    # VMEM-adaptive batch: only scene_t is resident here, but the entry
    # outputs are K planes per tile each, so steps are (7 + 2K)-plane wide
    batch = min(auto_chunk(4 * ps.scene_t.size,
                           4 * (7 + 2 * K) * SUB * LANE,
                           4 * 3 * SUB * LANE), T)
    n_steps = -(-T // batch)
    padT = n_steps * batch - T
    if padT:
        o4 = jnp.concatenate(
            [o4, jnp.zeros((padT,) + o4.shape[1:], o4.dtype)])
        d4 = jnp.concatenate(
            [d4, jnp.ones((padT,) + d4.shape[1:], d4.dtype)])
        tl3 = jnp.concatenate(
            [tl3, jnp.full((padT,) + tl3.shape[1:], -jnp.inf, tl3.dtype)])

    z = jnp.zeros((), jnp.int32)
    meta = jnp.stack(
        [jnp.asarray(ps.tlas_root, jnp.int32), z, z, z])[None]
    ts, ins = _run_entries_arrays(meta, ps.scene_t, o4, d4, tl3,
                                  K=K, interpret=interpret, batch=batch)
    ts = ts[:T].transpose(0, 2, 3, 1).reshape(-1, K)[:R]
    ins = ins[:T].transpose(0, 2, 3, 1).reshape(-1, K)[:R]
    return TlasEntries(t_entry=ts, inst=ins)
