"""Equal-spp variance of the NEE estimator: potential-weighted pick vs
the global power CDF (RFW_POTENTIAL_MAX=0 disables the potential path).

Renders N independent 1-spp frames of the bench scene and reports mean
per-pixel sample variance of luminance plus honest per-frame seconds.
Two drivers:

  * default: bench lights (two spots + sun) — the round-3 'potential must
    cut variance' gate (VERDICT round-2 item 6).
  * --sweep: the potential-pick CROSSOVER (VERDICT round-3 item 8). The
    potential path scores every padded light row with an unrolled
    full-lane (R,) loop — O(L) shading work — while the power CDF is one
    searchsorted. For each light count L (--lights grid of point lights
    replacing the spots) we measure variance AND wall time for both
    modes; the efficiency ratio var_ratio*time_ratio < 1 marks where the
    potential pick still pays. Reference scores every light per shading
    point unconditionally (shade.comp:283-365) — fine at GPU occupancy,
    a real cost on 128-lane VPU rows.

Usage: python tools/bench_nee.py [--width 512 --height 288 --frames 8]
       python tools/bench_nee.py --sweep [--counts 4,16,32,64]
(one process per mode — the flag is read at import time; the driver below
forks itself with the env set.)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def _grid_point_lights(scene_min, scene_max, n):
    """n point lights on a deterministic jittered grid inside the scene
    box (upper half, pulled off the walls so most are visible)."""
    rng = np.random.default_rng(1234)
    mn = np.asarray(scene_min, np.float32)
    mx = np.asarray(scene_max, np.float32)
    span = mx - mn
    u = rng.uniform(0.15, 0.85, size=(n, 3)).astype(np.float32)
    pos = mn + u * span
    pos[:, 1] = mn[1] + (0.45 + 0.45 * u[:, 1]) * span[1]
    # varied energies so the potential pick has real signal
    scale = (0.5 + 1.5 * rng.uniform(size=(n, 1))).astype(np.float32)
    ext = float(np.linalg.norm(span))
    energy = scale * np.array([[14.0, 13.5, 12.0]], np.float32) * ext
    return pos, energy


def measure(width, height, frames, lights=0):
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from rfw_tpu.render.wavefront import (
        RenderConfig, mat_feature_mask, render_sample, tex_kinds_mask,
    )

    sdev, dmats, atlas, dlights, view = build_scene(width, height)
    if lights:
        from rfw_tpu.backend.lights import (
            AreaLightsView, DirectionalLightsView, PointLightsView,
            SpotLightsView,
        )
        from rfw_tpu.render.lights_pack import DeviceLights, pack_lights

        mn = np.asarray(sdev.tlas_min[0])
        mx = np.asarray(sdev.tlas_max[0])
        pos, energy = _grid_point_lights(mn, mx, lights)
        pts = PointLightsView(position=pos, energy=energy,
                              changed=np.ones(lights, bool))
        sun = DirectionalLightsView(
            direction=np.array([[0.4, -0.8, 0.3]], np.float32),
            energy=np.array([[3.0, 2.9, 2.6]], np.float32),
            changed=np.ones(1, bool))
        dl = pack_lights(pts, SpotLightsView.empty(), sun,
                         AreaLightsView.empty())
        dlights = DeviceLights(*[jnp.asarray(x) for x in dl])
    cfg = RenderConfig(max_bounces=1, clamp=20.0, sky_intensity=0.35,
                       sampler="random",  # independent realizations
                       tex_mask=tex_kinds_mask(dmats.tex),
                       mat_features=mat_feature_mask(dmats),
                       has_area_lights=bool(np.asarray(dlights.n_area)[0] > 0))
    key = jax.random.PRNGKey(17)
    lum = []
    secs = []
    for s in range(frames):
        t0 = time.perf_counter()
        r = render_sample(sdev, dmats, atlas, dlights, view,
                          jax.random.fold_in(key, s), width, height, cfg)
        # honest clock: device-side scalar reduce (see CLAUDE.md)
        np.asarray(jnp.sum(r.radiance))
        secs.append(time.perf_counter() - t0)
        lum.append(np.asarray(
            0.2126 * r.radiance[:, 0] + 0.7152 * r.radiance[:, 1]
            + 0.0722 * r.radiance[:, 2]))
    lum = np.stack(lum)  # (frames, R)
    var = lum.var(axis=0, ddof=1)
    # first frame pays the compile; steady state = min of the rest
    t_frame = min(secs[1:]) if len(secs) > 1 else secs[0]
    return (float(var.mean()), float(np.median(var)), float(lum.mean()),
            float(t_frame))


def _fork(mode, pm, args, lights=0):
    e = dict(os.environ, RFW_POTENTIAL_MAX=str(pm))
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--mode", mode,
         "--width", str(args.width), "--height", str(args.height),
         "--frames", str(args.frames), "--lights", str(lights)],
        env=e, capture_output=True, text=True)
    if p.returncode:
        print("\n".join(p.stderr.splitlines()[-5:]), file=sys.stderr)
        return {}
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--lights", type=int, default=0,
                    help="replace scene lights with N grid point lights")
    ap.add_argument("--sweep", action="store_true",
                    help="potential-vs-power crossover over light counts")
    ap.add_argument("--counts", default="4,16,32,64")
    ap.add_argument("--mode", choices=["potential", "power"], default=None)
    args = ap.parse_args()

    if args.mode:
        m, med, mean, t = measure(args.width, args.height, args.frames,
                                  args.lights)
        print(json.dumps({"mode": args.mode, "var_mean": m,
                          "var_median": med, "lum_mean": mean,
                          "sec_frame": round(t, 4)}))
        return

    if args.sweep:
        rows = []
        for n in [int(x) for x in args.counts.split(",")]:
            pot = _fork("potential", 4096, args, lights=n)
            pwr = _fork("power", 0, args, lights=n)
            if not (pot and pwr):
                continue
            vr = pot["var_mean"] / max(pwr["var_mean"], 1e-12)
            tr = pot["sec_frame"] / max(pwr["sec_frame"], 1e-9)
            row = {"lights": n, "var_ratio": round(vr, 4),
                   "time_ratio": round(tr, 4),
                   "efficiency_ratio": round(vr * tr, 4),
                   "potential": pot, "power": pwr}
            rows.append(row)
            print(json.dumps({k: row[k] for k in
                              ("lights", "var_ratio", "time_ratio",
                               "efficiency_ratio")}))
        print(json.dumps({"sweep": rows}))
        return

    out = {}
    for mode, env in (("potential", "16"), ("power", "0")):
        out[mode] = _fork(mode, env, args, lights=args.lights)
    if out.get("potential") and out.get("power"):
        out["var_ratio_mean"] = round(
            out["potential"]["var_mean"] / max(out["power"]["var_mean"],
                                               1e-12), 4)
        out["var_ratio_median"] = round(
            out["potential"]["var_median"] / max(out["power"]["var_median"],
                                                 1e-12), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
