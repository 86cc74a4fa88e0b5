"""Floor-free micro-bench of the SDF eval stages: each op runs R times
INSIDE one dispatch (lax.scan with a serialized data dependency), so the
~25 ms tunnel dispatch floor amortizes away and per-op time is
(dispatch_time - floor) / R.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_sdf_micro.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CAP = int(os.environ.get("BENCH_CAP", 131072))
N_ALL = int(os.environ.get("BENCH_N_ALL", 1048576))
R = int(os.environ.get("BENCH_R", 8))
WARMUP = 4
REPS = 8


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
    from animatable_nerf_tpu.ops.knn_pallas import (
        build_pdist_payload, knn_blend_pallas,
    )

    rng = np.random.RandomState(0)
    # build the frame on the host CPU device: _synthetic_frame's rigid
    # transform chain otherwise dispatches op-by-op through the remote
    # TPU tunnel (~26 ms per tiny op — minutes of setup)
    with jax.default_device(jax.devices("cpu")[0]):
        frame_np = jax.tree_util.tree_map(
            np.asarray, ge._synthetic_frame(rng, grid_shape=(16, 16, 16))
        )
    frame = {k: jnp.asarray(v) for k, v in frame_np.items()}
    packed, margin, bnds = jax.jit(
        lambda v: build_pdist_payload(v, res=64)
    )(frame["pvertices"])
    gframe = {**frame, "pdist_packed": packed, "pdist_margin": margin,
              "pdist_bounds": bnds}

    model = SDFPDF(num_latents=60)
    z = jnp.ones((64, 64))
    dummy_rays = jnp.ones((64, 3))
    params = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((*z.shape, 3)), dummy_rays, z,
            frame, train=False,
        )
    )()

    pts_cap = jnp.asarray(rng.randn(CAP, 3).astype(np.float32) * 0.3)
    pts_all = jnp.asarray(rng.randn(N_ALL, 3).astype(np.float32) * 0.3)

    def bench(name, op, pts0):
        """op: (pts, params) -> (N, >=3)-ish array whose first 3 columns
        perturb the next iteration's points (serial dependency)."""

        def body(pts, _):
            out = op(pts, params)
            pts = pts + 1e-6 * out[:, :3].astype(jnp.float32)
            return pts, ()

        @jax.jit
        def run(pts, p):
            out, _ = jax.lax.scan(body, pts, None, length=R)
            return jnp.sum(out)

        vs = [pts0 + jnp.float32(1e-5 * (i + 1)) for i in range(WARMUP + REPS)]
        for i in range(WARMUP):
            float(run(vs[i], params))
        ts = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(run(vs[WARMUP + i], params))
            ts.append(time.perf_counter() - t0)
        total = float(np.median(ts)) * 1e3
        print(json.dumps({
            "stage": name, "per_op_ms": round(total / R, 3),
            "dispatch_ms": round(total, 2), "reps_inside": R,
        }), flush=True)

    # baseline: the scan machinery itself
    bench("noop_addition", lambda pts, p: pts, pts_cap)

    bench("pass2_knn_cap",
          lambda pts, p: knn_blend_pallas(
              pts, frame["pvertices"], frame["weights"])[0], pts_cap)

    bench("sdf_trunk_fwd_cap",
          lambda pts, p: model.apply(
              p, pts, method=lambda m, x: m.sdf_network(x)), pts_cap)

    bench("sdf_trunk_valgrad_cap",
          lambda pts, p: model.apply(
              p, pts, method=lambda m, x: m._sdf_and_grad(x))[2], pts_cap)

    feat = jnp.zeros((CAP, 256), jnp.float32)
    bench("color_net_cap",
          lambda pts, p: model.apply(
              p, pts,
              method=lambda m, x: m.color_network(
                  x, x, x, feat, jnp.asarray(0))), pts_cap)

    from animatable_nerf_tpu.core import (
        pose_points_to_tpose_points, tpose_points_to_pose_points,
        pose_dirs_to_tpose_dirs, tpose_dirs_to_pose_dirs,
    )

    bw = jnp.tile(jnp.eye(24, dtype=jnp.float32)[0][None], (CAP, 1))

    def warp_full(pts, p):
        t = pose_points_to_tpose_points(pts, bw, frame["A"])
        big = tpose_points_to_pose_points(t, bw, frame["big_A"])
        d1 = pose_dirs_to_tpose_dirs(pts, bw, frame["A"])
        d2 = tpose_dirs_to_pose_dirs(d1, bw, frame["big_A"])
        return big + 1e-3 * d2

    bench("lbs_warp_pts_plus_dirs_cap", warp_full, pts_cap)

    from animatable_nerf_tpu.models.common import (
        grid_pdist_keep, compact_payload,
    )

    def pass1(pts, p):
        keep = grid_pdist_keep(pts, gframe, 0.1)
        return jnp.where(keep[:, None], pts, 0.0)

    bench("pass1_grid_keep_all", pass1, pts_all)

    def pass1_compact(pts, p):
        keep = grid_pdist_keep(pts, gframe, 0.1)
        sidx, sv, (c_p,), n, ovf = compact_payload(keep, [pts], CAP)
        return jnp.pad(c_p, ((0, N_ALL - CAP), (0, 0)))

    bench("pass1_plus_compaction_all", pass1_compact, pts_all)

    # LAST: scan-of-SkipMLP at this size has crashed the remote TPU
    # compiler (SIGILL in TpuInstructionFusion) — keep it from blocking
    # the stages above
    try:
        bench("resd_field_cap",
              lambda pts, p: model.apply(
                  p, pts,
                  method=lambda m, x: m.resd_field(x, frame["poses"])),
              pts_cap)
    except Exception as e:  # pragma: no cover
        print(json.dumps({"stage": "resd_field_cap",
                          "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
