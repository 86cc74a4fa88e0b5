"""Bench the cell-list KNN kernel vs the flat sweep on the SMPL-scale
cloud with a realistic (shell-distributed) survivor stream.

Floor-free timing: R reps inside one dispatch via a serial-dependency
lax.scan (see tools/bench_sdf_micro.py). Build cost is timed separately
(it amortizes per frame across all views/tiles/rungs).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_knn_celled.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

N = int(os.environ.get("BENCH_N", 131072))
R = int(os.environ.get("BENCH_R", 8))
WARMUP, REPS = 3, 6


def main():
    from animatable_nerf_tpu import jaxenv

    jax = jaxenv.setup()
    import jax.numpy as jnp
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __graft_entry__ as ge
    from animatable_nerf_tpu.ops.knn_pallas import (
        build_cell_knn, knn_blend_celled, knn_blend_pallas,
    )

    rng = np.random.RandomState(0)
    with jax.default_device(jax.devices("cpu")[0]):
        frame = jax.tree_util.tree_map(
            np.asarray, ge._synthetic_frame(rng, grid_shape=(16, 16, 16))
        )
    verts_np = np.asarray(frame["pvertices"], np.float32)
    M = verts_np.shape[0]
    w = rng.rand(M, 24).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    # survivor-like stream: points in the 0.1 shell around the cloud
    base = verts_np[rng.randint(0, M, N)]
    q_np = base + rng.randn(N, 3).astype(np.float32) * 0.05
    verts = jnp.asarray(verts_np)
    vals = jnp.asarray(w)
    q0 = jnp.asarray(q_np)

    def bench(name, op):
        def body(pts, _):
            out, wd = op(pts)
            return pts + 1e-6 * out[:, :3], (jnp.sum(wd),)

        @jax.jit
        def run(pts):
            out, (s,) = jax.lax.scan(body, pts, None, length=R)
            return jnp.sum(out) + jnp.sum(s)

        vs = [q0 + jnp.float32(1e-5 * (i + 1)) for i in range(WARMUP + REPS)]
        for i in range(WARMUP):
            float(run(vs[i]))
        ts = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(run(vs[WARMUP + i]))
            ts.append(time.perf_counter() - t0)
        total = float(np.median(ts)) * 1e3
        print(json.dumps({"op": name, "per_op_ms": round(total / R, 3)}),
              flush=True)

    bench("flat", lambda pts: knn_blend_pallas(pts, verts, vals))

    for res, cap, slot_cap in [
        ((10, 14, 8), 2048, 512),
        ((12, 12, 12), 2048, 512),
        ((8, 10, 6), 3072, 384),
    ]:
        build = jax.jit(
            lambda v, w_: build_cell_knn(v, w_, res=res, cap=cap,
                                         slot_cap=slot_cap)
        )
        t0 = time.perf_counter()
        payload, ovf = build(verts, vals)
        jax.block_until_ready(payload)
        _ = time.perf_counter() - t0  # compile+run; rerun for steady
        t0 = time.perf_counter()
        payload, ovf = build(verts + 1e-6, vals)
        ovf = bool(ovf)
        build_ms = (time.perf_counter() - t0) * 1e3
        print(json.dumps({"build": f"res{res}_cap{cap}_S{slot_cap}",
                          "overflow": ovf,
                          "build_ms": round(build_ms, 1)}), flush=True)
        if ovf:
            continue
        cv, cw = payload["cknn_verts"], payload["cknn_vals"]
        lut, bnd = payload["cknn_lut"], payload["cknn_bounds"]
        for tile in (32, 64, 128):
            bench(
                f"celled_res{res}_cap{cap}_t{tile}",
                lambda pts, cv=cv, cw=cw, lut=lut, bnd=bnd, tile=tile:
                    knn_blend_celled(pts, cv, cw, lut, bnd, tile=tile),
            )
        # spot-check exactness on this stream (survivor subset)
        gv, gd = knn_blend_celled(q0, cv, cw, lut, bnd)
        fv, fd = knn_blend_pallas(q0, verts, vals)
        keep = np.asarray(fd[:, 0]) < 0.1
        dv = float(jnp.max(jnp.abs(gv - fv) * jnp.asarray(keep)[:, None]))
        print(json.dumps({"check": f"res{res}", "keep_frac":
                          round(float(keep.mean()), 3),
                          "max_dvals_on_survivors": dv}), flush=True)


if __name__ == "__main__":
    main()
