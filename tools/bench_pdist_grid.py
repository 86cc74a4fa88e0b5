"""Measure the KNN-family eval pass-1 variants on TPU:

  A. min-distance Pallas kernel over every sampled point (the previous
     default, ops/knn_pallas.py min_dist_pallas)
  B. per-frame packed distance grid + trilerp gather
     (ops/knn_pallas.py build_pdist_payload at several resolutions),
     plus the per-frame build cost itself.

Protocol mirrors bench.py / BASELINE.md's SDF-PDF flagship table:
16,384 rays x 64 samples, SMPL-scale 6912-vertex cloud, survivor
capacity picked by the compact_count probe per variant (the widened
conservative keep of the grid can land on a higher rung — that cost is
part of the honest comparison). Warmup + distinct inputs + scalar
checksum fetch per CLAUDE.md TPU timing rules.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_pdist_grid.py
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

N_RAYS = int(os.environ.get("BENCH_N_RAYS", 16384))
N_SAMPLES = 64
WARMUP = 5
REPS = 10
GRID_RES = tuple(
    int(r) for r in os.environ.get("BENCH_GRID_RES", "64,96,128").split(",")
)


def main():
    from animatable_nerf_tpu import jaxenv

    jax = jaxenv.setup()
    import jax.numpy as jnp

    import sys

    from animatable_nerf_tpu.models import SDFPDF
    from animatable_nerf_tpu.models.common import eval_capacity
    from animatable_nerf_tpu.render import RenderSettings, render_rays
    from animatable_nerf_tpu.ops.knn_pallas import build_pdist_payload

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __graft_entry__ as ge

    rng = np.random.RandomState(0)
    frame_np = ge._synthetic_frame(rng, grid_shape=(64, 64, 24))
    frame = {k: jnp.asarray(v) for k, v in frame_np.items()}
    rays = {
        k: jnp.asarray(v)
        for k, v in ge._rays(rng, N_RAYS, bounds=frame_np["pbounds"]).items()
    }
    settings = RenderSettings(n_samples=N_SAMPLES, perturb=False)

    base = SDFPDF(num_latents=60)
    z = jnp.ones((N_RAYS, N_SAMPLES))
    params = jax.jit(
        lambda: base.init(
            jax.random.PRNGKey(0), jnp.zeros((*z.shape, 3)), rays["ray_d"],
            z, frame, train=False,
        )
    )()

    ray_variants = []
    for i in range(WARMUP + REPS):
        v = dict(rays)
        v["ray_o"] = rays["ray_o"] + jnp.float32(1e-4 * (i + 1))
        ray_variants.append(v)

    def ladder_frac(fr):
        """Probe compact_count at the config capacity for frame `fr`,
        return the QUANTIZED capacity fraction that fits it with 15%
        headroom (engine ladder semantics: 4096-point quanta landed at
        the measured need instead of /8 /4 /2 rungs — render time is
        ~linear in capacity)."""
        probe = jax.jit(
            lambda p, r: render_rays(
                base, p, r, fr, settings, train=False
            )["compact_count"]
        )
        count = int(np.asarray(probe(params, rays))[0])
        need = int(count * 1.15) + 1
        pts = N_RAYS * N_SAMPLES
        cap_max = eval_capacity(pts, base.eval_keep_frac)
        cap_q = min(-(-need // 4096) * 4096, cap_max)
        frac = (cap_q + 256) / pts if cap_q < cap_max else base.eval_keep_frac
        return frac, count

    def time_render(fr, frac):
        m = base.clone(eval_keep_frac=frac)

        @jax.jit
        def render(p, r):
            out = render_rays(m, p, r, fr, settings, train=False)
            return out["rgb_map"], jnp.sum(out["rgb_map"])

        for i in range(WARMUP):
            float(render(params, ray_variants[i])[1])
        times = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(render(params, ray_variants[WARMUP + i])[1])
            times.append(time.perf_counter() - t0)
        return float(np.median(times)), np.asarray(render(params, rays)[0])

    results = {}

    frac_a, count_a = ladder_frac(frame)
    dt_a, rgb_a = time_render(frame, frac_a)
    results["min_dist_pass1"] = {
        "median_ms": round(dt_a * 1e3, 2),
        "rays_per_sec": round(N_RAYS / dt_a, 1),
        "keep_frac": frac_a,
        "pass1_keep": count_a,
    }
    print(json.dumps({"variant": "min_dist_pass1", **results["min_dist_pass1"]}))

    for res in GRID_RES:
        build = jax.jit(functools.partial(build_pdist_payload, res=res))
        # time the per-frame build (distinct inputs per rep)
        for i in range(WARMUP):
            p_, m_, b_ = build(frame["pvertices"] + jnp.float32(1e-5 * i))
            float(m_)
        bts = []
        for i in range(REPS):
            t0 = time.perf_counter()
            p_, m_, b_ = build(frame["pvertices"] + jnp.float32(1e-5 * (i + 9)))
            float(jnp.sum(p_.astype(jnp.float32))), float(m_)
            bts.append(time.perf_counter() - t0)
        packed, margin, bnds = build(frame["pvertices"])
        gframe = {**frame, "pdist_packed": packed, "pdist_margin": margin,
                  "pdist_bounds": bnds}
        frac_g, count_g = ladder_frac(gframe)
        dt_g, rgb_g = time_render(gframe, frac_g)
        delta = float(np.max(np.abs(rgb_g - rgb_a)))
        results[f"grid_{res}"] = {
            "median_ms": round(dt_g * 1e3, 2),
            "rays_per_sec": round(N_RAYS / dt_g, 1),
            "build_ms": round(float(np.median(bts)) * 1e3, 2),
            "keep_frac": frac_g,
            "pass1_keep": count_g,
            "margin_cm": round(float(margin) * 100, 2),
            "max_rgb_delta_vs_min_dist": round(delta, 6),
        }
        print(json.dumps({"variant": f"grid_{res}", **results[f"grid_{res}"]}))

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
