"""Equal-spp variance of the NEE estimator: potential-weighted pick vs
the global power CDF (RFW_POTENTIAL_MAX=0 disables the potential path).

Renders N independent 1-spp frames of the bench scene (multi-light: two
spots + sun) and reports mean per-pixel sample variance of luminance. The
potential pick must cut variance on a scene where light visibility varies
across the frame (VERDICT round-2 item 6 'done' gate).

Usage: python tools/bench_nee.py [--width 512 --height 288 --frames 8]
(one process per mode — the flag is read at import time; the driver below
forks itself with the env set.)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def measure(width, height, frames):
    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from rfw_tpu.render.wavefront import (
        RenderConfig, mat_feature_mask, render_sample, tex_kinds_mask,
    )

    sdev, dmats, atlas, dlights, view = build_scene(width, height)
    cfg = RenderConfig(max_bounces=1, clamp=20.0, sky_intensity=0.35,
                       sampler="random",  # independent realizations
                       tex_mask=tex_kinds_mask(dmats.tex),
                       mat_features=mat_feature_mask(dmats),
                       has_area_lights=bool(np.asarray(dlights.n_area)[0] > 0))
    key = jax.random.PRNGKey(17)
    lum = []
    for s in range(frames):
        r = render_sample(sdev, dmats, atlas, dlights, view,
                          jax.random.fold_in(key, s), width, height, cfg)
        lum.append(np.asarray(
            0.2126 * r.radiance[:, 0] + 0.7152 * r.radiance[:, 1]
            + 0.0722 * r.radiance[:, 2]))
    lum = np.stack(lum)  # (frames, R)
    var = lum.var(axis=0, ddof=1)
    return float(var.mean()), float(np.median(var)), float(lum.mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--mode", choices=["potential", "power"], default=None)
    args = ap.parse_args()

    if args.mode:
        m, med, mean = measure(args.width, args.height, args.frames)
        print(json.dumps({"mode": args.mode, "var_mean": m,
                          "var_median": med, "lum_mean": mean}))
        return

    out = {}
    for mode, env in (("potential", "16"), ("power", "0")):
        e = dict(os.environ, RFW_POTENTIAL_MAX=env)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", mode,
             "--width", str(args.width), "--height", str(args.height),
             "--frames", str(args.frames)],
            env=e, capture_output=True, text=True)
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
        print(p.stderr.splitlines()[-3:] if p.returncode else "",
              file=sys.stderr)
        out[mode] = json.loads(line)
    if "potential" in out and "power" in out:
        out["var_ratio_mean"] = round(
            out["potential"]["var_mean"] / max(out["power"]["var_mean"],
                                               1e-12), 4)
        out["var_ratio_median"] = round(
            out["potential"]["var_median"] / max(out["power"]["var_median"],
                                                 1e-12), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
