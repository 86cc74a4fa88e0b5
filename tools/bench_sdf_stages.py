"""Stage-level breakdown of the compacted SDF-PDF eval render.

Times isolated jitted pieces at the COMPACTED capacity scale (the
survivor stream the production render runs its MLPs on) plus the full
render, to steer VERDICT-r1 item 2 (SDF family must not be 8x behind
the grid family). Protocol as tools/bench_pdist_grid.py: 16,384 rays x
64 samples, SMPL-scale 6912-vertex cloud, distinct inputs + scalar
checksum per rep; params are always jit ARGUMENTS (closing over them
embeds them as HLO constants in the remote-compile relay — CLAUDE.md).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_sdf_stages.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

N_RAYS = int(os.environ.get("BENCH_N_RAYS", 16384))
N_SAMPLES = 64
KEEP_FRAC = float(os.environ.get("BENCH_KEEP_FRAC", 0.125))
WARMUP = 5
REPS = 10


def main():
    from animatable_nerf_tpu import jaxenv

    jax = jaxenv.setup()
    import jax.numpy as jnp

    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __graft_entry__ as ge

    from animatable_nerf_tpu.models import SDFPDF
    from animatable_nerf_tpu.models.common import eval_capacity
    from animatable_nerf_tpu.render import RenderSettings, render_rays
    from animatable_nerf_tpu.ops.knn_pallas import (
        build_pdist_payload, knn_blend_pallas, min_dist_pallas,
    )

    rng = np.random.RandomState(0)
    frame_np = ge._synthetic_frame(rng, grid_shape=(64, 64, 24))
    frame = {k: jnp.asarray(v) for k, v in frame_np.items()}
    rays = {
        k: jnp.asarray(v)
        for k, v in ge._rays(rng, N_RAYS, bounds=frame_np["pbounds"]).items()
    }
    settings = RenderSettings(n_samples=N_SAMPLES, perturb=False)
    packed, margin, bnds = jax.jit(
        lambda v: build_pdist_payload(v, res=64)
    )(frame["pvertices"])
    gframe = {**frame, "pdist_packed": packed, "pdist_margin": margin,
              "pdist_bounds": bnds}

    model = SDFPDF(num_latents=60, eval_keep_frac=KEEP_FRAC)
    z = jnp.ones((N_RAYS, N_SAMPLES))
    params = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((*z.shape, 3)), rays["ray_d"],
            z, frame, train=False,
        )
    )()

    cap = eval_capacity(N_RAYS * N_SAMPLES, KEEP_FRAC)
    n_all = N_RAYS * N_SAMPLES
    pts_cap = jnp.asarray(rng.randn(cap, 3).astype(np.float32) * 0.3)
    pts_all = jnp.asarray(rng.randn(n_all, 3).astype(np.float32) * 0.3)
    feat_cap = jnp.asarray(rng.randn(cap, 256).astype(np.float32) * 0.1)
    print(json.dumps({"cap": cap, "n_all": n_all}), flush=True)

    def timeit(name, fn, first_arg, *rest):
        """jit(fn)(first_arg + jitter, params, *rest) with checksum."""
        f = jax.jit(fn)
        vs = [first_arg + jnp.float32(1e-5 * (i + 1))
              for i in range(WARMUP + REPS)]
        for i in range(WARMUP):
            float(jnp.sum(jax.tree_util.tree_leaves(
                f(vs[i], params, *rest))[0]))
        ts = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(jnp.sum(jax.tree_util.tree_leaves(
                f(vs[WARMUP + i], params, *rest))[0]))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts)) * 1e3
        print(json.dumps({"stage": name, "median_ms": round(dt, 2)}),
              flush=True)
        return dt

    # full renders (params/rays as jit args; vary ray_o per rep)
    def full_grid(ro, p, r):
        rr = dict(r)
        rr["ray_o"] = ro
        return render_rays(model, p, rr, gframe, settings, train=False)[
            "rgb_map"]

    def full_mind(ro, p, r):
        rr = dict(r)
        rr["ray_o"] = ro
        return render_rays(model, p, rr, frame, settings, train=False)[
            "rgb_map"]

    timeit("full_render_grid_pass1", full_grid, rays["ray_o"], rays)
    timeit("full_render_mindist_pass1", full_mind, rays["ray_o"], rays)

    # pass-1 variants over ALL sampled points (params unused but passed
    # for the shared harness)
    timeit("pass1_min_dist_all",
           lambda pts, p: min_dist_pallas(pts, frame["pvertices"]), pts_all)

    from animatable_nerf_tpu.models.common import grid_pdist_keep

    timeit("pass1_grid_keep_all",
           lambda pts, p: grid_pdist_keep(pts, gframe, 0.1).astype(
               jnp.float32), pts_all)

    # pass-2 fused KNN on the compacted stream
    timeit("pass2_knn_cap",
           lambda pts, p: knn_blend_pallas(
               pts, frame["pvertices"], frame["weights"])[0], pts_cap)

    # SDF trunk: forward only vs value+grad (autograd normals)
    timeit("sdf_trunk_fwd_cap",
           lambda pts, p: model.apply(
               p, pts, method=lambda m, x: m.sdf_network(x)), pts_cap)
    timeit("sdf_trunk_valgrad_cap",
           lambda pts, p: model.apply(
               p, pts, method=lambda m, x: m._sdf_and_grad(x))[2], pts_cap)

    # color net on the compacted stream
    timeit("color_net_cap",
           lambda pts, p: model.apply(
               p, pts,
               method=lambda m, x: m.color_network(
                   x, x, x, feat_cap, jnp.asarray(0))), pts_cap)

    # displacement field
    timeit("resd_field_cap",
           lambda pts, p: model.apply(
               p, pts,
               method=lambda m, x: m.resd_field(x, frame["poses"])), pts_cap)

    # LBS warp (KNN excluded: uses a fixed one-hot bw)
    from animatable_nerf_tpu.core import (
        pose_points_to_tpose_points, tpose_points_to_pose_points,
    )

    bw_fixed = jnp.tile(
        jnp.eye(24, dtype=jnp.float32)[0][None], (cap, 1)
    )

    def warp(pts, p):
        t = pose_points_to_tpose_points(pts, bw_fixed, frame["A"])
        return tpose_points_to_pose_points(t, bw_fixed, frame["big_A"])

    timeit("lbs_warp_cap", warp, pts_cap)

    # compaction machinery alone: grid keep + payload sort at full size
    from animatable_nerf_tpu.models.common import compact_payload

    def compact(pts, p):
        keep = grid_pdist_keep(pts, gframe, 0.1)
        sidx, sv, (c_p,), n, ovf = compact_payload(keep, [pts], cap)
        return c_p

    timeit("pass1_plus_compaction_all", compact, pts_all)


if __name__ == "__main__":
    main()
