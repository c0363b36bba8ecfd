"""Offline (numpy) simulator of the Pallas treelet-traversal walk.

Counts while-loop iterations per kernel program — the latency-bound cost
unit of ops/traverse.py (each iteration = one supernode/leaf visit per
live stream; program cost = max over its NSTREAM streams) — WITHOUT the
chip. Used to evaluate traversal-order strategies before paying a remote
Mosaic compile:

  current   children iterated 0..7 in build order (next = last hit, so
            effective visit order is ~reverse build order)
  axis      children sorted at build time by centroid along the node's
            dominant-spread axis; the stream iterates far-to-near for its
            majority direction sign on that axis (1-bit flip) so the pop
            order is near-first  [candidate kernel change]
  consensus per-visit exact ordering by the stream's mean entry distance
            (upper bound for any shared-order scheme)

Mirrors the kernel semantics exactly: shared stack per stream, per-ray
t_best pruning, TLAS->BLAS instance re-basing, TREELET-dense leaves.

Usage:
  JAX_PLATFORM_NAME=cpu PYTHONPATH=/root/repo python tools/sim_visits.py \
      [--width 512 --height 256 --tiles 16 --nstream 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TREELET = 64
T_MIN = 1e-4
T_MAX = 1e30


def _rebuild_wide(scene, depth):
    """Re-collapse the packed binary arenas at (1<<depth)-ary width.

    Mirrors what pack.py does at build time for another arity: per unique
    BLAS root, collapse that subtree of the merged binary arena (leaf
    node_left already stores GLOBAL first-triangle ids, so no offset), then
    merge chunks with code rebasing; same for the binary TLAS. Returns
    (blas_box, blas_code, blas_cnt, blas_roots_per_instance,
     tlas_box, tlas_code, tlas_cnt)."""
    from rfw_tpu.accel.bvh_cpu import BvhNodes
    from rfw_tpu.render.pack import build_widen

    arena = BvhNodes(
        node_min=np.asarray(scene.blas_min, np.float32),
        node_max=np.asarray(scene.blas_max, np.float32),
        node_left=np.asarray(scene.blas_left, np.int32),
        node_right=np.asarray(scene.blas_right, np.int32),
        node_count=np.asarray(scene.blas_count, np.int32),
        prim_order=np.zeros(1, np.int32),
    )
    roots = np.asarray(scene.blas_root, np.int32)
    boxes, codes, cnts = [], [], []
    off = 0
    root_of = {}
    for r in sorted(set(int(x) for x in roots)):
        b, c, n = build_widen(arena, tlas=False, depth=depth, root=r)
        c = np.where(c >= 0, c + off, c)
        boxes.append(b)
        codes.append(c)
        cnts.append(n)
        root_of[r] = off
        off += b.shape[0]
    blas_box = np.concatenate(boxes)
    blas_code = np.concatenate(codes)
    blas_cnt = np.concatenate(cnts)
    inst_roots = np.array([root_of[int(r)] for r in roots], np.int32)

    tlas = BvhNodes(
        node_min=np.asarray(scene.tlas_min, np.float32),
        node_max=np.asarray(scene.tlas_max, np.float32),
        node_left=np.asarray(scene.tlas_left, np.int32),
        node_right=np.asarray(scene.tlas_right, np.int32),
        node_count=np.asarray(scene.tlas_count, np.int32),
        prim_order=np.asarray(scene.tlas_prim, np.int32),
    )
    t_box, t_code, t_cnt = build_widen(tlas, tlas=True, depth=depth)
    return (blas_box, blas_code, blas_cnt, inst_roots, t_box, t_code, t_cnt)


class SimScene:
    """Merged wideN arenas in the kernel's global id space."""

    def __init__(self, scene, depth: int = 3):
        if depth == 3:
            blas_box = np.asarray(scene.blas8_box)
            blas_code = np.asarray(scene.blas8_code)
            blas_cnt = np.asarray(scene.blas8_cnt)
            inst_roots = np.asarray(scene.blas8_root)
            t_box = np.asarray(scene.tlas8_box)
            t_code = np.asarray(scene.tlas8_code)
            t_cnt = np.asarray(scene.tlas8_cnt)
        else:
            (blas_box, blas_code, blas_cnt, inst_roots,
             t_box, t_code, t_cnt) = _rebuild_wide(scene, depth)
        self.arity = blas_code.shape[1]
        nb8 = int(blas_box.shape[0])
        t_code = np.asarray(t_code).copy()
        t_code[t_code >= 0] += nb8
        self.box = np.concatenate(
            [blas_box, t_box]).astype(np.float32)  # (S, 6*arity)
        self.code = np.concatenate([blas_code, t_code]).astype(np.int32)
        self.cnt = np.concatenate([blas_cnt, t_cnt]).astype(np.int32)
        self.root = nb8
        self.blas_root = np.asarray(inst_roots).astype(np.int32)
        self.inst_inv = np.asarray(scene.inst_inv).astype(np.float32)
        self.v0 = np.asarray(scene.tri_v0).astype(np.float32)
        self.e1 = np.asarray(scene.tri_e1).astype(np.float32)
        self.e2 = np.asarray(scene.tri_e2).astype(np.float32)
        # per-node dominant-spread axis over the child-box centers (the
        # "axis" strategy's build-time metadata — 2 bits per node)
        mins = self.box.reshape(-1, self.arity, 6)[:, :, 0:3]
        maxs = self.box.reshape(-1, self.arity, 6)[:, :, 3:6]
        centers = 0.5 * (mins + maxs)  # (S,8,3) (inf for empty children)
        valid = mins[:, :, 0] <= maxs[:, :, 0]
        c_masked = np.where(valid[:, :, None], centers, np.nan)
        spread = np.nanmax(c_masked, axis=1) - np.nanmin(c_masked, axis=1)
        spread = np.where(np.isfinite(spread), spread, 0.0)
        self.axis = np.argmax(spread, axis=1).astype(np.int32)  # (S,)
        self.centers = np.where(valid[:, :, None], centers, np.inf)


def _aabb_t(box6, o, d_inv, t_best):
    """Slab test of one AABB against (n,) rays. Returns (ok mask, tn)."""
    mn, mx = box6[0:3], box6[3:6]
    t0 = (mn[None, :] - o) * d_inv
    t1 = (mx[None, :] - o) * d_inv
    tn = np.max(np.minimum(t0, t1), axis=1)
    tf = np.min(np.maximum(t0, t1), axis=1)
    ok = (tn <= tf) & (tf > T_MIN) & (tn < t_best)
    return ok, tn


def _leaf_test(sc: SimScene, first, o, d, t_best):
    """Dense TREELET test; returns updated t_best."""
    lo = first
    hi = min(first + TREELET, sc.v0.shape[0])
    v0, e1, e2 = sc.v0[lo:hi], sc.e1[lo:hi], sc.e2[lo:hi]
    # Moller-Trumbore, (T,n)
    pvec = np.cross(d[:, None, :], e2[None, :, :])  # (n,T,3)
    det = np.einsum("ntk,tk->nt", pvec, e1)
    inv = np.where(np.abs(det) < 1e-20, 0.0, 1.0 / np.where(det == 0, 1, det))
    tvec = o[:, None, :] - v0[None, :, :]
    u = np.einsum("ntk,ntk->nt", tvec, pvec) * inv
    qvec = np.cross(tvec, e1[None, :, :])
    v = np.einsum("ntk,nk->nt", qvec, d) * inv
    t = np.einsum("ntk,tk->nt", qvec, e2) * inv
    ok = ((u >= -1e-7) & (v >= -1e-7) & (u + v <= 1 + 1e-7)
          & (t > T_MIN) & (t < t_best[:, None]) & (np.abs(det) > 1e-20))
    t = np.where(ok, t, np.inf)
    return np.minimum(t_best, t.min(axis=1))


def walk_stream_fused(sc: SimScene, o_w, db_w, ds_w, t_lim_s, order: str):
    """Fused dual-ray stream walk: every lane carries a closest-hit bounce
    ray (o_w, db_w) AND an any-hit shadow ray (o_w, ds_w, limit t_lim_s)
    from the SAME origin. One shared stack; a node is visited if EITHER
    population needs it. Models fusing the NEE occlusion trace of vertex k
    into the bounce trace of vertex k+1 (origins coincide: both leave the
    vertex-k hit point). Returns (iterations, t_best_bounce, shadow_dead).

    Lanes whose shadow t_lim is 0 fail every slab test except for boxes
    containing the ray origin (tn < 0 passes regardless of t_best) —
    harmless for the cost model because the co-located live bounce ray
    visits those same boxes anyway;
    bounce-dead lanes are encoded the same way by the caller via db zeros
    + t_best init — here every lane's bounce ray is considered live, which
    matches the integrator (it traces the full sorted prefix)."""
    n = o_w.shape[0]
    t_best = np.full(n, T_MAX, np.float32)
    t_s = np.asarray(t_lim_s, np.float32).copy()
    dead_s = t_s <= T_MIN
    stack = []
    node, inst = sc.root, -1
    o, db, ds = o_w, db_w, ds_w
    dinv_b = 1.0 / np.where(np.abs(db) < 1e-20,
                            np.where(db < 0, -1e-20, 1e-20), db)
    dinv_s = 1.0 / np.where(np.abs(ds) < 1e-20,
                            np.where(ds < 0, -1e-20, 1e-20), ds)
    mean_d = db_w.mean(axis=0)
    iters = 0

    def rebase(i):
        nonlocal o, db, ds, dinv_b, dinv_s
        if i < 0:
            o, db, ds = o_w, db_w, ds_w
        else:
            m = sc.inst_inv[i]
            o = o_w @ m[:3, :3].T + m[:3, 3]
            db = db_w @ m[:3, :3].T
            ds = ds_w @ m[:3, :3].T
        dinv_b = 1.0 / np.where(np.abs(db) < 1e-20,
                                np.where(db < 0, -1e-20, 1e-20), db)
        dinv_s = 1.0 / np.where(np.abs(ds) < 1e-20,
                                np.where(ds < 0, -1e-20, 1e-20), ds)

    while True:
        if node == -1:
            if not stack:
                break
            node, new_inst = stack.pop()
            if new_inst != inst:
                inst = new_inst
                rebase(inst)
        iters += 1
        if node <= -2:
            lv = -node - 2
            first = (lv >> 6) << 6
            t_best = _leaf_test(sc, first, o, db, t_best)
            sh = _leaf_test(sc, first, o, ds,
                            np.where(dead_s, 0.0, t_s))
            dead_s = dead_s | (sh < t_s)
            node = -1
            continue
        in_tlas = inst < 0
        hits = []
        for c in range(sc.arity):
            box6 = sc.box[node, 6 * c:6 * c + 6]
            ok_b, tn = _aabb_t(box6, o, dinv_b, t_best)
            ok_s, _ = _aabb_t(box6, o, dinv_s,
                              np.where(dead_s, 0.0, t_s))
            ok = ok_b | ok_s
            if ok.any():
                tm = tn[ok_b] if ok_b.any() else tn[ok]
                hits.append((c, float(tm.mean())))
        if order == "axis":
            a = sc.axis[node]
            sgn = mean_d[a]
            hits.sort(key=lambda h: sc.centers[node, h[0], a],
                      reverse=(sgn > 0))
        elif order == "consensus":
            hits.sort(key=lambda h: h[1], reverse=True)
        next_code, next_inst = -1, inst
        for c, _tn in hits:
            code = int(sc.code[node, c])
            cnt = int(sc.cnt[node, c])
            if code < 0:
                payload = -code - 1
                if in_tlas:
                    e_code = int(sc.blas_root[payload])
                    e_inst = payload
                else:
                    e_code = -(payload + min(cnt - 1, TREELET - 1)) - 2
                    e_inst = inst
            else:
                e_code, e_inst = code, inst
            if next_code != -1:
                stack.append((next_code, next_inst))
            next_code, next_inst = e_code, e_inst
        if next_inst != inst and next_code != -1:
            inst = next_inst
            rebase(inst)
        node = next_code
        if node == -1 and not stack:
            break
    return iters, t_best, dead_s


def walk_stream(sc: SimScene, o_w, d_w, t_lim, order: str,
                any_hit: bool = False, cull: bool = False):
    """One stream's full traversal; returns (iterations, internal visits,
    leaf visits). o_w/d_w: (n,3) world rays. any_hit mirrors the occlusion
    kernel: a lane with any hit goes dead; the stream exits when every
    lane is dead or the stack drains.

    cull=True models STACK CULLING (candidate kernel change): each pushed
    entry carries min-over-lanes clamped entry distance; at pop time,
    entries whose stored distance already exceeds the stream's worst
    live-lane t_best are discarded for free (the kernel would consume
    them with cheap scalar SMEM pops before issuing the node fetch).
    Safe per-lane: skip only if min_lane(tn) >= max_lane(t_best) implies
    tn_lane >= t_best_lane for every lane."""
    n = o_w.shape[0]
    t_best = np.minimum(np.full(n, T_MAX, np.float32), t_lim)
    dead = np.zeros(n, bool)
    stack = []  # entries (code, inst, min_entry_t)
    node, inst = sc.root, -1
    o, d = o_w, d_w
    d_inv = 1.0 / np.where(np.abs(d) < 1e-20,
                           np.where(d < 0, -1e-20, 1e-20), d)
    mean_d = d_w.mean(axis=0)
    iters = n_int = n_leaf = n_culled = 0

    def rebase(i):
        nonlocal o, d, d_inv
        if i < 0:
            o, d = o_w, d_w
        else:
            m = sc.inst_inv[i]  # (4,4) world->object
            o = o_w @ m[:3, :3].T + m[:3, 3]
            d = d_w @ m[:3, :3].T
        d_inv = 1.0 / np.where(np.abs(d) < 1e-20,
                               np.where(d < 0, -1e-20, 1e-20), d)

    def t_worst():
        if any_hit:
            live = ~dead
            return float(t_best[live].max()) if live.any() else 0.0
        return float(t_best.max())

    while True:
        if node == -1:
            if not stack:
                break
            node, new_inst, etn = stack.pop()
            if cull:
                while etn >= t_worst():
                    n_culled += 1
                    if not stack:
                        node = None
                        break
                    node, new_inst, etn = stack.pop()
                if node is None:
                    break
            if new_inst != inst:
                inst = new_inst
                rebase(inst)
        iters += 1
        if node <= -2:
            n_leaf += 1
            lv = -node - 2
            first = (lv >> 6) << 6
            if any_hit:
                new_t = _leaf_test(sc, first, o, d, t_best)
                dead = dead | (new_t < t_best)
                if dead.all():
                    break
            else:
                t_best = _leaf_test(sc, first, o, d, t_best)
            node = -1
            continue
        n_int += 1
        in_tlas = inst < 0
        hits = []
        for c in range(sc.arity):
            box6 = sc.box[node, 6 * c:6 * c + 6]
            ok, tn = _aabb_t(box6, o, d_inv, t_best)
            if any_hit:
                ok = ok & ~dead
            if ok.any():
                hits.append((c, float(tn[ok].mean()),
                             max(0.0, float(tn[ok].min()))))
        if order == "axis":
            a = sc.axis[node]
            sgn = mean_d[a]
            # iterate far-to-near along the stream's sign => nearest is
            # assigned last => visited next; stack pops near-first
            # iterate far-to-near: descending centers along +axis rays
            hits.sort(key=lambda h: sc.centers[node, h[0], a],
                      reverse=(sgn > 0))
        elif order == "consensus":
            hits.sort(key=lambda h: h[1], reverse=True)  # far .. near
        # "current": build order 0..7 as-is
        next_code, next_inst, next_tn = -1, inst, 0.0
        for c, _tn, mtn in hits:
            code = int(sc.code[node, c])
            cnt = int(sc.cnt[node, c])
            if code < 0:  # leaf child
                payload = -code - 1
                if in_tlas:
                    e_code = int(sc.blas_root[payload])
                    e_inst = payload
                else:
                    e_code = -(payload + min(cnt - 1, TREELET - 1)) - 2
                    e_inst = inst
            else:
                e_code, e_inst = code, inst
            if next_code != -1:
                stack.append((next_code, next_inst, next_tn))
            next_code, next_inst, next_tn = e_code, e_inst, mtn
        if next_inst != inst and next_code != -1:
            inst = next_inst
            rebase(inst)
        node = next_code
        if node == -1 and not stack:
            break
    return iters, n_int, n_leaf, t_best, dead, n_culled


def run_fused(sc, o, db, ds, t_s, nstream, tiles, order):
    """Compare (closest walk on bounce rays) + (any-hit walk on shadow
    rays) against ONE fused dual-ray walk, at the kernel's program cost
    model (sum over programs of max-stream iterations). Also checks the
    fused walk's outputs agree with the separate walks."""
    lanes = 1024
    per_stream = lanes // nstream
    R = min(o.shape[0], tiles * lanes)
    cost_b = cost_s = cost_f = 0
    mism = 0
    for p in range(R // lanes):
        worst_b = worst_s = worst_f = 0
        for k in range(nstream):
            lo = p * lanes + k * per_stream
            sl = slice(lo, lo + per_stream)
            it_b, _, _, tb_sep, _, _ = walk_stream(
                sc, o[sl], db[sl], T_MAX, order)
            it_s, _, _, _, dead_sep, _ = walk_stream(
                sc, o[sl], ds[sl], t_s[sl], order, any_hit=True)
            it_f, tb_f, dead_f = walk_stream_fused(
                sc, o[sl], db[sl], ds[sl], t_s[sl], order)
            worst_b = max(worst_b, it_b)
            worst_s = max(worst_s, it_s)
            worst_f = max(worst_f, it_f)
            if not np.allclose(tb_f, tb_sep, rtol=1e-5, atol=1e-5):
                mism += 1
            live_lim = t_s[sl] > T_MIN
            if not np.array_equal(dead_f & live_lim, dead_sep & live_lim):
                mism += 1
        cost_b += worst_b
        cost_s += worst_s
        cost_f += worst_f
    sep = cost_b + cost_s
    print(f"fused dual-ray walk order={order:9s} "
          f"closest={cost_b} anyhit={cost_s} sep={sep} fused={cost_f}")
    print(f"    -> fused/closest = {cost_f / max(cost_b, 1):.3f}x; "
          f"fused saves {100.0 * (1 - cost_f / max(sep, 1)):.1f}% of "
          f"separate program-iters; agreement mismatches={mism}")
    for cpi in (1.1, 1.25, 1.5):
        eff = cost_f * cpi
        print(f"    -> at {cpi:.2f}x per-iter cost: saves "
              f"{100.0 * (1 - eff / max(sep, 1)):.1f}%")
    return cost_f, sep


def run_population(sc, o, d, t_lim, nstream, tiles, order, label,
                   t_ref=None, any_hit=False, cull=False, lanes=1024):
    """Tile rays into programs of nstream streams x (lanes//nstream) rays;
    report sum over programs of max-stream iterations (the kernel's cost
    model) plus visit breakdown. `lanes` = rays per program (kernel:
    NSTREAM * SSUB * 128 — bigger SSUB packs more rays into the same
    phase-1/3 instruction stream at the cost of wider visit unions)."""
    per_stream = lanes // nstream
    R = min(o.shape[0], tiles * lanes)
    prog_cost = 0
    tot_int = tot_leaf = tot_iter = tot_cull = 0
    max_t_err = 0.0
    for p in range(R // lanes):
        worst = 0
        for k in range(nstream):
            lo = p * lanes + k * per_stream
            it, ni, nl, tb, _, nc = walk_stream(
                sc, o[lo:lo + per_stream], d[lo:lo + per_stream],
                t_lim, order, any_hit=any_hit, cull=cull)
            worst = max(worst, it)
            tot_int += ni
            tot_leaf += nl
            tot_iter += it
            tot_cull += nc
            if t_ref is not None:
                tr = t_ref[lo:lo + per_stream]
                both = (tb < 1e25) & (tr < 1e25)
                if both.any():
                    max_t_err = max(max_t_err, float(
                        np.abs(tb[both] - tr[both]).max()))
                if ((tb < 1e25) != (tr < 1e25)).any():
                    max_t_err = max(max_t_err, np.inf)
        prog_cost += worst
    if t_ref is not None:
        print(f"    oracle t agreement: max |dt| = {max_t_err:.2e}")
    print(f"{label:28s} order={order:9s} prog-iters={prog_cost:8d} "
          f"(sum visits: int={tot_int} leaf={tot_leaf}"
          + (f" culled={tot_cull}" if cull else "") + ")")
    return prog_cost


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--tiles", type=int, default=16)
    ap.add_argument("--nstream", type=int, default=4)
    ap.add_argument("--orders", default="current,axis,consensus")
    ap.add_argument("--populations", default="primary,bounce")
    ap.add_argument("--sortkeys", default="octmorton",
                    help="bounce-ray sort keys to compare: "
                    "octmorton,instance,morton,none")
    ap.add_argument("--nstreams", default="",
                    help="extra NSTREAM values to sim (comma list)")
    ap.add_argument("--arity", type=int, default=8, choices=(8, 16, 32),
                    help="supernode width: 8 = the packed default; 16/32 "
                    "re-collapse the binary arenas (wider node per fetch "
                    "-> shorter dependent-fetch chains, more VPU slab "
                    "work per visit)")
    ap.add_argument("--anyhit", action="store_true",
                    help="walk populations in occlusion (any-hit) mode")
    ap.add_argument("--lanes", type=int, default=1024,
                    help="rays per program (kernel: NSTREAM*SSUB*128)")
    ap.add_argument("--cull", action="store_true",
                    help="model stack culling: pushed entries carry their "
                    "min entry distance; stale entries pop for free")
    ap.add_argument("--fused", action="store_true",
                    help="evaluate fusing the NEE shadow any-hit walk "
                    "into the bounce closest-hit walk (shared stack, "
                    "same per-lane origin) instead of the normal runs")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from bench import build_scene
    from rfw_tpu.render.wavefront import _block_swizzle, camera_rays
    from rfw_tpu.accel.lbvh import morton_codes

    W, H = args.width, args.height
    R = W * H
    sdev, dmats, atlas, dlights, view = build_scene(W, H)
    sc = SimScene(jax.tree_util.tree_map(np.asarray, sdev),
                  depth=args.arity.bit_length() - 1)
    print(f"scene: {sc.v0.shape[0]} arena tris, {sc.box.shape[0]} supernodes,"
          f" tlas_root={sc.root}", file=sys.stderr)

    sw = _block_swizzle(W, H, 1024)
    pixel_ids = (sw[0], sw[1]) if sw is not None else None
    import jax.numpy as jnp
    key = jax.random.PRNGKey(7)
    ray_o, ray_d = camera_rays(jnp.asarray(view), W, H, key, pixel_ids)
    o = np.asarray(ray_o, np.float32)
    d = np.asarray(ray_d, np.float32)

    pops = {}
    fused_pops = {}
    if "primary" in args.populations:
        pops["primary/coherent"] = (o, d, None)
    if "bounce" in args.populations:
        # first hits via the simulator itself (closest t per ray),
        # then cosine directions about the geometric normal, re-sorted by
        # (octant, origin morton) like sort_secondary
        from rfw_tpu.render.intersect import bvh_closest_hit

        hit = bvh_closest_hit(sdev, ray_o, ray_d, T_MAX)
        t = np.asarray(hit.t)
        prim = np.asarray(hit.prim)
        found = prim >= 0
        pos = o + t[:, None] * d
        ng_obj = np.cross(sc.e1[np.maximum(prim, 0)],
                          sc.e2[np.maximum(prim, 0)])
        # object->world normal via instance inverse-transpose ~ good enough
        # for the sim (most pica instances are rigid)
        ng = ng_obj / np.maximum(
            np.linalg.norm(ng_obj, axis=1, keepdims=True), 1e-12)
        ng = np.where((np.sum(ng * d, axis=1) > 0)[:, None], -ng, ng)
        rng = np.random.default_rng(3)
        u1, u2 = rng.random(R, np.float32), rng.random(R, np.float32)
        r = np.sqrt(u1)
        phi = 2 * np.pi * u2
        lx, ly = r * np.cos(phi), r * np.sin(phi)
        lz = np.sqrt(np.maximum(0, 1 - u1))
        up = np.where((np.abs(ng[:, 2]) < 0.9)[:, None],
                      np.array([0, 0, 1], np.float32),
                      np.array([1, 0, 0], np.float32))
        tx = np.cross(up, ng)
        tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-12)
        ty = np.cross(ng, tx)
        bd = lx[:, None] * tx + ly[:, None] * ty + lz[:, None] * ng
        bo = pos + ng * 1e-3
        bo, bd = bo[found], bd[found]
        ngf = ng[found]
        sd = st_lim = None
        if args.fused:
            # per-lane shadow ray toward a uniformly picked point/spot/dir
            # light, horizon-gated like the integrator (light behind the
            # surface -> t_lim 0 -> the lane never passes a slab test)
            dl = dlights
            cands = (
                [("pos", p) for p in np.asarray(
                    dl.point_pos, np.float32)[:int(dl.n_point[0])]]
                + [("pos", s) for s in np.asarray(
                    dl.spot_pos, np.float32)[:int(dl.n_spot[0])]]
                + [("dir", v) for v in np.asarray(
                    dl.dir_dir, np.float32)[:int(dl.n_dir[0])]]
            )
            rng2 = np.random.default_rng(11)
            pick = rng2.integers(0, len(cands), bo.shape[0])
            sd = np.zeros_like(bd)
            st_lim = np.zeros(bo.shape[0], np.float32)
            for i, (kind, vec) in enumerate(cands):
                m = pick == i
                if kind == "pos":
                    v = vec[None, :] - bo[m]
                    dist = np.linalg.norm(v, axis=1)
                    sd[m] = v / np.maximum(dist[:, None], 1e-12)
                    st_lim[m] = np.maximum(dist - 2e-3, 0.0)
                else:
                    sd[m] = -vec[None, :] / max(
                        float(np.linalg.norm(vec)), 1e-12)
                    st_lim[m] = 1e8
            cosl = np.sum(sd * ngf, axis=1)
            st_lim = np.where(cosl > 0, st_lim, 0.0).astype(np.float32)
        oct_ = ((bd[:, 0] < 0).astype(np.int64)
                | ((bd[:, 1] < 0).astype(np.int64) << 1)
                | ((bd[:, 2] < 0).astype(np.int64) << 2))
        mor = np.asarray(morton_codes(
            jnp.asarray(bo), jnp.asarray(bo.min(0)), jnp.asarray(bo.max(0)),
        )).astype(np.int64)
        inst_hint = np.asarray(hit.inst)[found]
        for skname in args.sortkeys.split(","):
            if skname == "octmorton":
                # the integrator default: octant*(1<<27) + (morton>>5)
                key = (oct_ << 27) | (mor >> 5)
            elif skname == "instance":
                # RFW_SORT_INST variant: instance-major
                h = np.clip(inst_hint, -1, 254) + 1
                key = (h.astype(np.int64) << 22) | (oct_ << 19) | (mor >> 11)
            elif skname == "morton":
                key = mor  # origin locality only, no octant
            elif skname == "mortonoct":
                # spatial-major, direction tiebreak within a morton cell
                key = ((mor >> 6) << 9) | (oct_ << 6) | (mor & 63)
            elif skname == "none":
                key = np.arange(len(oct_), dtype=np.int64)
            else:
                raise SystemExit(f"unknown sortkey {skname}")
            order = np.argsort(key, kind="stable")
            pops[f"bounce/{skname}"] = (bo[order], bd[order], None)
            if args.fused:
                fused_pops[f"bounce/{skname}"] = (
                    bo[order], bd[order], sd[order], st_lim[order])
        if "primary/coherent" in pops:
            pops["primary/coherent"] = (o, d, t)  # oracle anchor

    if args.fused:
        for label, (po, pdir, fsd, fst) in fused_pops.items():
            live = float((fst > 1e-4).mean())
            print(f"{label}: {po.shape[0]} rays, shadow-live "
                  f"{100 * live:.1f}%")
            run_fused(sc, po, pdir, fsd, fst, args.nstream, args.tiles,
                      "current")
        return

    nstreams = [args.nstream] + [
        int(x) for x in args.nstreams.split(",") if x]
    for label, (po, pd, t_ref) in pops.items():
        base = None
        for ns in nstreams:
            for strat in args.orders.split(","):
                t0 = time.time()
                cost = run_population(
                    sc, po, pd, T_MAX, ns, args.tiles, strat,
                    f"{label} ns={ns}",
                    t_ref=t_ref if strat == "current" and ns == nstreams[0]
                    and not args.anyhit else None,
                    any_hit=args.anyhit, cull=args.cull, lanes=args.lanes)
                if base is None:
                    base = cost
                else:
                    print(f"    -> ns={ns}/{strat}: "
                          f"{base / max(cost, 1):.3f}x fewer program-iters "
                          f"vs base  [{time.time()-t0:.0f}s]")


if __name__ == "__main__":
    main()
