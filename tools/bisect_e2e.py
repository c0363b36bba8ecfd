"""Config-bisection timing of render_sample: exact end-to-end deltas.

profile_e2e's isolated-stage table approximates the fused program (XLA
fuses across stages, compaction scales the shading front); this tool
instead times the WHOLE jitted render_sample under a grid of static
configs, so each pairwise delta is an exact cost of the toggled block:

  anchor   - bench-identical config (1 bounce + NEE, sobol, compaction)
  b0       - max_bounces=0: the v0-only program; anchor - b0 = the exact
             bounce-vertex block (sort + bounce trace + NEE shade + film)
  uniform  - sampler="uniform": anchor - uniform = exact sobol marginal
             (threefry draws replace the per-slot sobol scrambles)

Honest clock per CLAUDE.md: np.asarray(jnp.sum(radiance)). Each config
is a fresh compile the first time (minutes over the axon tunnel) and a
cache hit after; keep the grid small.

Usage: python tools/bisect_e2e.py [--width 1920 --height 1080 --reps 3]
       [--configs anchor,b0,uniform]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--configs", default="anchor,b0,uniform")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_scene
    from rfw_tpu.render.wavefront import (
        RenderConfig, mat_feature_mask, render_sample, tex_kinds_mask,
    )

    W, H = args.width, args.height
    sdev, dmats, atlas, dlights, view = build_scene(W, H)
    key = jax.random.PRNGKey(11)

    base = dict(
        clamp=20.0, sky_intensity=0.35, sampler="sobol",
        tex_mask=tex_kinds_mask(dmats.tex),
        mat_features=mat_feature_mask(dmats),
        has_area_lights=bool(np.asarray(dlights.n_area)[0] > 0),
        aovs=False,
    )
    grid = {
        "anchor": RenderConfig(max_bounces=1, **base),
        "b0": RenderConfig(max_bounces=0, **base),
        "uniform": RenderConfig(
            max_bounces=1, **{**base, "sampler": "random"}),
    }

    results = {}
    for name in args.configs.split(","):
        cfg = grid[name]
        def run(s):
            r = render_sample(
                sdev, dmats, atlas, dlights, view,
                jax.random.fold_in(key, s), W, H, cfg,
                sample_index=jnp.uint32(s))
            return jnp.sum(r.radiance)

        t0 = time.perf_counter()
        np.asarray(run(0))  # compile + warm
        compile_s = time.perf_counter() - t0
        best = np.inf
        for s in range(1, args.reps + 1):
            t0 = time.perf_counter()
            np.asarray(run(s))  # fresh sample_index: no host-copy cache
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best * 1e3, 1)
        print(f"{name:10s} {best*1e3:9.1f} ms  (first-call {compile_s:.0f}s)",
              file=sys.stderr)

    if "anchor" in results and "b0" in results:
        results["delta_bounce_block"] = round(
            results["anchor"] - results["b0"], 1)
    if "anchor" in results and "uniform" in results:
        results["delta_sobol"] = round(
            results["anchor"] - results["uniform"], 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
