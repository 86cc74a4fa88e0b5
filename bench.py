"""Benchmark: eval-render throughput (rays/sec/chip) on the flagship
AniNeRF model.

Protocol: ONE fused XLA program renders 262144 rays x 64 samples —
one full 512x512 eval frame, the aninerf_313 resolution (16.8M point
queries; each point runs the blend-weight MLP, LBS warp,
canonical-bw MLP and the NeRF trunk + heads — the same work the
reference does per point in tpose_nerf_network.py:139-215, minus its
2048-ray Python chunk loop). The program is the PRODUCTION eval path
(render_image: lax.map over 8192-ray tiles with per-tile survivor
compaction — the same program Engine.render_item runs): measured
1.59M vs 1.00M rays/s against the flat single-compaction formulation,
because per-tile sorts are O(n log^2 tile) instead of O(n log^2 n) and
tile working sets stay near VMEM. Steady-state median over repeated
executions after a warmup.

Baseline: the reference has no checked-in numbers (BASELINE.md); the
driver-set target is >= 3x an A100 running the PyTorch reference.
REFERENCE_A100_RAYS_PER_SEC below is an engineering estimate for the
reference's chunked eval loop on A100 (2048-ray launches, unfused
Conv1d stacks, ~0.1s/chunk); vs_baseline is measured rays/sec divided
by 3x that estimate, i.e. vs_baseline >= 1.0 means the 3x-A100 target
is met. Replace with a measured number when the licensed datasets and
an A100 are available.

Prints ONE JSON line.

`BENCH_MODEL=sdf_pdf|nerf_pdf|neus_pdf` switches the measured model to
the corresponding KNN-family extension (same whole-frame tiled
protocol; pass-1 runs on the engine's per-frame packed distance grid
exactly as Engine.render_item attaches it). Default is the AniNeRF
path — the driver contract is unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_A100_RAYS_PER_SEC = 20_000.0
TARGET_FACTOR = 3.0
# one full 512x512 eval frame (aninerf_313: 1024^2 at ratio 0.5).
# BENCH_RAYS=1048576 measures a TRUE 1024^2 frame (the driver's
# north-star sec/frame metric) instead of extrapolating 4x.
N_RAYS = int(os.environ.get("BENCH_RAYS", 262144))
N_SAMPLES = 64
EVAL_TILE = 8192  # measured optimum (164.9 ms vs 262.7 flat, 200.6 @32k)
WARMUP = 5
REPS = 10
# frames per dispatch for the steady-state (chip-time) protocol: every
# dispatch through this sandbox's remote-execution relay pays a ~26 ms
# host/tunnel floor that a chip-local deployment does not (CLAUDE.md;
# the calibration is re-measured below as t1 - (tK - t1)/(K - 1)).
# Rendering K frames with DISTINCT rays inside one dispatch and taking
# the marginal per-frame time (tK - t1)/(K - 1) cancels the constant
# per-dispatch overhead exactly — the steady-state pipelined-rendering
# rate of the chip itself. Both numbers are reported: since round 4
# the steady-state marginal time is the headline `median_ms` (and the
# rays/s numerator), and the r1-r3-comparable single-dispatch median
# moved to `median_ms_single_dispatch`. Clamped to >= 2 (the marginal
# formula needs two frame counts).
FRAMES_PER_DISPATCH = max(
    int(os.environ.get("BENCH_FRAMES_PER_DISPATCH", 5)), 2
)


def _time_fn(fn, args_list, warmup=1, reps=2):
    """Median seconds over reps with distinct args per call (relay
    caches bit-identical calls); scalar host fetch forces execution."""
    import time as _t

    import numpy as _np

    for i in range(warmup):
        float(fn(*args_list[i]))
    ts = []
    for i in range(reps):
        t0 = _t.perf_counter()
        float(fn(*args_list[warmup + i]))
        ts.append(_t.perf_counter() - t0)
    return float(_np.median(ts))


def _measure_roofline(jax, jnp, np):
    """Micro-programs at the production render's stage shapes; each
    reports achieved rate vs the relevant ceiling. K work-copies per
    dispatch cancel the relay floor exactly like the main protocol.
    All large operands live on device; per-call inputs are scalars
    (uploading hundreds of MB of fresh random inputs through the
    remote relay would swamp the measurement — learned the hard way)."""
    K = 3
    pts = N_RAYS * N_SAMPLES          # 16.8M sampled points at 512^2
    n_tiles = N_RAYS // EVAL_TILE
    tile_pts = EVAL_TILE * N_SAMPLES
    rng = np.random.RandomState(0)

    def marginal(jit_fn, base, k_of):
        """(tK - t1)/(K - 1); distinct scalar seeds defeat the relay's
        result cache, k_of(k) selects the k-work-copy program."""
        tk = _time_fn(jit_fn, [(base, jnp.int32(i), k_of(K))
                               for i in range(3)])
        t1 = _time_fn(jit_fn, [(base, jnp.int32(100 + i), k_of(1))
                               for i in range(3)])
        return max((tk - t1) / (K - 1), 1e-9)

    # --- stage 1: pass-1 style gather — one 16-byte bf16 row (8 lanes)
    # per point from a packed corner table (core/grid.py layout)
    table = jax.device_put(
        jnp.asarray(rng.rand(1 << 20, 8), jnp.bfloat16)
    )
    idx0 = jax.device_put(
        jnp.asarray(rng.randint(0, 1 << 20, size=pts, dtype=np.int32))
    )

    def gather_prog(base, seed, k):
        tbl, idx = base
        total = jnp.float32(0.0)
        for j in range(int(k)):
            shifted = (idx + seed * (j + 1)) & ((1 << 20) - 1)
            total += jnp.sum(tbl[shifted].astype(jnp.float32))
        return total

    t_gather = marginal(
        jax.jit(gather_prog, static_argnums=2), (table, idx0), lambda k: k
    )
    gather_rows_per_s = pts / t_gather

    # --- stage 2: per-tile one-bit-key stable argsort (compaction key)
    bits0 = jax.device_put(
        jnp.asarray(rng.rand(n_tiles, tile_pts) < 0.1)
    )

    def sort_prog(base, seed, k):
        def tile(b):
            order = jnp.argsort(~b, stable=True)
            return order[:4096].astype(jnp.int32).sum()

        total = jnp.int32(0)
        for j in range(int(k)):
            rolled = jnp.roll(base, seed * (j + 1), axis=1)
            total += jnp.sum(jax.lax.map(tile, rolled))
        return total

    t_sort = marginal(
        jax.jit(sort_prog, static_argnums=2), bits0, lambda k: k
    )
    sort_keys_per_s = pts / t_sort

    # --- stage 3: the 256-wide MLP trunk chain (8 layers, f32 operands
    # through the default bf16-pass MXU path — the production trunks'
    # regime) at a 128k-row batch (MXU-pipeline-saturating; the render
    # runs the same chain at the survivor capacity)
    cap = 131072
    Ws = jax.device_put(jnp.asarray(
        rng.randn(8, 256, 256).astype(np.float32) * 0.06
    ))
    x0 = jax.device_put(jnp.asarray(
        rng.rand(cap, 256).astype(np.float32)
    ))

    def mlp_prog(base, seed, k):
        ws, x = base
        total = jnp.float32(0.0)
        for j in range(int(k)):
            h = x * (1.0 + 1e-6 * seed * (j + 1))
            for i in range(8):
                h = jnp.maximum(h @ ws[i], 0.0)
            total += jnp.sum(h)
        return total

    t_mlp = marginal(
        jax.jit(mlp_prog, static_argnums=2), (Ws, x0), lambda k: k
    )
    mlp_flops = cap * 8 * 2 * 256 * 256
    mlp_tflops = mlp_flops / t_mlp / 1e12

    return {
        "protocol": (
            f"live micro-programs at production stage shapes; marginal "
            f"time of {K}-variant dispatches (relay floor cancelled)"
        ),
        "pass1_gather": {
            "rows": pts,
            "row_bytes": 16,
            "ms": round(t_gather * 1e3, 2),
            "achieved_rows_per_s": round(gather_rows_per_s / 1e6, 1),
            "unit": "Mrows/s",
            "ceiling": (
                "XLA TPU gather serializes per row (~4.4 ns/row "
                "measured r4); HBM-BW ceiling (819 GB/s / 16 B = "
                "51,000 Mrows/s) is NOT reachable for gathers"
            ),
        },
        "compaction_sort": {
            "keys": pts,
            "ms": round(t_sort * 1e3, 2),
            "achieved_keys_per_s": round(sort_keys_per_s / 1e6, 1),
            "unit": "Mkeys/s",
            "ceiling": (
                "one-bit-key stable argsort, O(n log^2 tile) bitonic "
                "on TPU; hier rank-search alternative measured SLOWER "
                "(69.6 vs 41.4 ms, BASELINE.md r4)"
            ),
        },
        "mlp_trunk": {
            "points": cap,
            "layers": 8,
            "width": 256,
            "ms": round(t_mlp * 1e3, 2),
            "achieved_tflops": round(mlp_tflops, 1),
            "peak_tflops_bf16_pass": 197,
            "frac_of_peak": round(mlp_tflops / 197, 3),
            "note": (
                "f32 operands via the default bf16-pass MXU path; "
                "256-wide trunks underfill the 128x128 MXU pipeline "
                "relative to large-matmul peak"
            ),
        },
    }


def _families_sidecar():
    """Per-family whole-frame numbers measured via BENCH_MODEL runs
    (tools/quality_runs; committed as BENCH_FAMILIES.json at the repo
    root) — attached so the driver artifact carries every family, not
    just the default AniNeRF (VERDICT-r4 item 5b)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_FAMILIES.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def main():
    from animatable_nerf_tpu import jaxenv

    jax = jaxenv.setup()
    import jax.numpy as jnp

    from animatable_nerf_tpu.models import AniNeRF
    from animatable_nerf_tpu.render import RenderSettings
    from animatable_nerf_tpu.render.renderer import render_image
    import __graft_entry__ as ge

    rng = np.random.RandomState(0)
    frame_np = ge._synthetic_frame(rng, grid_shape=(64, 64, 24))
    frame = {k: jnp.asarray(v) for k, v in frame_np.items()}
    # eval-protocol rays: aimed at the body box, near/far from the
    # ray-AABB slab test (the reference renders exactly the mask_at_box
    # rays with slab near/far)
    rays = {
        k: jnp.asarray(v)
        for k, v in ge._rays(rng, N_RAYS, bounds=frame_np["pbounds"]).items()
    }

    bench_model = os.environ.get("BENCH_MODEL", "aninerf")
    if bench_model in ("sdf_pdf", "nerf_pdf", "neus_pdf"):
        from animatable_nerf_tpu.models import SDFPDF, NeRFPDF, NeuSPDF
        from animatable_nerf_tpu.ops.knn_pallas import build_pdist_payload

        cls = {
            "sdf_pdf": SDFPDF, "nerf_pdf": NeRFPDF, "neus_pdf": NeuSPDF,
        }[bench_model]
        model = cls(num_latents=60)
        # bf16 MLP compute for the resd/sdf/color trunks (params, KNN,
        # geometry, weight norms, compositing stay f32; normals are
        # jax.grad through the bf16 trunk). Quality-guarded below.
        # Production-reachable: `compute_dtype bfloat16` (config key or
        # CLI opt) selects the same dtype through models/registry
        # .make_model — pinned by test_compute_dtype_config_reaches_model.
        model_fast = cls(num_latents=60, dtype=jnp.bfloat16)
        # engine-attached per-frame packed distance grid (pass-1 runs a
        # 16-byte trilerp gather instead of a 6912-vertex sweep; see
        # Engine._device_frame)
        packed, margin, bnds = jax.jit(
            lambda v: build_pdist_payload(v, res=96)
        )(frame["pvertices"])  # engine default (Engine.__init__ knn_grid_res)
        frame = {**frame, "pdist_packed": packed, "pdist_margin": margin,
                 "pdist_bounds": bnds}
    else:
        model = AniNeRF(num_train_frames=60)
        # eval hot path: bf16 MLP trunks (params stay f32; geometry,
        # filtering, compositing stay f32). Quality-guarded below against
        # the f32 render.
        model_fast = AniNeRF(num_train_frames=60, dtype=jnp.bfloat16)
    settings = RenderSettings(
        n_samples=N_SAMPLES, perturb=False, eval_tile=EVAL_TILE
    )
    z = jnp.ones((N_RAYS, N_SAMPLES))
    params = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((*z.shape, 3)), rays["ray_d"], z,
            frame, train=False,
        )
    )()

    # Adaptive survivor capacity (mirrors Engine.render_item's ladder):
    # probe the true WORST-TILE survivor count at the config capacity
    # (render_image's compact_count is the per-tile max; the bench rays
    # are uniformly aimed, so tiles are balanced like the engine's
    # stride interleave), then run the timed renders at the smallest
    # per-tile capacity that holds it with 15% headroom — dead capacity
    # slots pay full MLP/compaction cost.
    from animatable_nerf_tpu.models.common import eval_capacity

    def _probe_counts(p, r):
        out = render_image(model, p, r, frame, settings)
        return (
            out["compact_count"],
            out.get("compact_count_exact", out["compact_count"]),
        )

    probe = jax.jit(_probe_counts)
    count, count_exact = (int(np.asarray(c)) for c in probe(params, rays))
    need = int(count * 1.15) + 1
    # the stage-2 re-compaction (models/pdf.py) must hold the exact
    # post-filter count in stage2_ratio * capacity (engine _pick_level)
    ratio = float(getattr(model, "stage2_ratio", 0.0) or 0.0)
    if ratio > 0:
        need = max(need, int((int(count_exact * 1.15) + 1) / ratio) + 1)
    # quantized-capacity rung (engine ladder semantics): the measured
    # worst-tile need rounded up to a 4096-point quantum
    pts_per_tile = EVAL_TILE * N_SAMPLES
    cap_max = eval_capacity(pts_per_tile, model.eval_keep_frac)
    cap_q = min(-(-need // 4096) * 4096, cap_max)
    keep_frac = (
        (cap_q + 256) / pts_per_tile if cap_q < cap_max
        else model.eval_keep_frac
    )
    model = model.clone(eval_keep_frac=keep_frac)
    model_fast = model_fast.clone(eval_keep_frac=keep_frac)

    def make_render(m):
        @jax.jit
        def render(params, rays):
            out = render_image(m, params, rays, frame, settings)
            # scalar checksum: fetching it to host forces full execution
            # (block_until_ready alone can return early on the remote
            # execution path)
            return out["rgb_map"], out["acc_map"], jnp.sum(out["rgb_map"])

        return render

    def make_render_scan(m):
        """K whole frames with DISTINCT rays per dispatch (steady-state
        chip-time protocol, see FRAMES_PER_DISPATCH)."""

        @jax.jit
        def render_k(params, stacked_rays):
            def frame_body(r):
                out = render_image(m, params, r, frame, settings)
                return jnp.sum(out["rgb_map"]) + jnp.sum(out["acc_map"])

            return jnp.sum(jax.lax.map(frame_body, stacked_rays))

        return render_k

    # distinct inputs per repetition: the remote execution path caches
    # results of bit-identical (executable, args) calls, which would turn
    # repeat timings into no-ops
    ray_variants = []
    for i in range(WARMUP + REPS):
        v = dict(rays)
        v["ray_o"] = rays["ray_o"] + jnp.float32(1e-4 * (i + 1))
        ray_variants.append(v)

    def time_render(render):
        for i in range(WARMUP):
            float(render(params, ray_variants[i])[2])
        times = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(render(params, ray_variants[WARMUP + i])[2])
            times.append(time.perf_counter() - t0)
        return float(np.median(times)), render(params, rays)

    render_f32 = make_render(model)
    dt_f32, out_f32 = time_render(render_f32)
    if model_fast is not model:
        dt_fast, out_fast = time_render(make_render(model_fast))
    else:
        dt_fast, out_fast = dt_f32, out_f32

    # quality guard: bf16 trunk must not visibly move the render; pick
    # whichever quality-passing variant is faster
    rgb_delta = float(jnp.max(jnp.abs(out_fast[0] - out_f32[0])))
    use_fast = rgb_delta < 0.02 and dt_fast < dt_f32
    dt = dt_fast if use_fast else dt_f32

    # steady-state chip time: K distinct frames per dispatch; the
    # marginal per-frame time (tK - t1)/(K - 1) cancels the constant
    # per-dispatch relay overhead (see FRAMES_PER_DISPATCH)
    timed_model = model_fast if use_fast else model
    render_k = make_render_scan(timed_model)
    render_1 = make_render_scan(timed_model)  # same program, K=1 stack
    K = FRAMES_PER_DISPATCH

    def stack(variants):
        return {
            k: jnp.stack([v[k] for v in variants]) for k in variants[0]
        }

    ks, k1 = [], []
    for i in range(WARMUP + REPS):
        base = WARMUP + REPS + i * (K + 1)
        vs = []
        for j in range(K + 1):
            v = dict(rays)
            v["ray_o"] = rays["ray_o"] + jnp.float32(1e-4 * (base + j + 1))
            vs.append(v)
        ks.append(stack(vs[:K]))
        k1.append(stack(vs[K:]))
    for i in range(WARMUP):
        float(render_k(params, ks[i]))
        float(render_1(params, k1[i]))
    tk, t1 = [], []
    for i in range(REPS):
        t0 = time.perf_counter()
        float(render_k(params, ks[WARMUP + i]))
        tk.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(render_1(params, k1[WARMUP + i]))
        t1.append(time.perf_counter() - t0)
    tk_med = float(np.median(tk))
    t1_med = float(np.median(t1))
    chip_dt = max((tk_med - t1_med) / (K - 1), 1e-9)
    dispatch_floor_ms = max(t1_med - chip_dt, 0.0) * 1e3

    rays_per_sec = N_RAYS / chip_dt
    # seconds to render a full 1024x1024 frame (all pixels in-box)
    sec_per_frame = 1024 * 1024 / rays_per_sec
    baseline = TARGET_FACTOR * REFERENCE_A100_RAYS_PER_SEC

    # ---- roofline block (VERDICT-r4 item 5b): live micro-programs at
    # the production shapes, so "the render sits at the hardware floor"
    # is a checkable number, not prose. Three dominant stages
    # (BASELINE.md round-4 stage table: pass-1 gather 41.5 ms, sort
    # 34.2 ms, MLP trunks 38.8 ms of the 129 ms frame):
    #   gather: 16-byte bf16 corner rows, one per sampled point — the
    #     per-row serialization floor (~4.4 ns/row), NOT HBM bandwidth,
    #     is the binding ceiling (819 GB/s would be ~51e9 rows/s).
    #   sort: per-tile one-bit-key stable argsort (compaction).
    #   mlp: the 256-wide trunk matmul chain at survivor capacity.
    roofline = _measure_roofline(jax, jnp, np)

    print(
        json.dumps(
            {
                "metric": "eval_render_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / baseline, 3),
                "detail": {
                    "model": bench_model,
                    "n_rays": N_RAYS,
                    "n_samples": N_SAMPLES,
                    "eval_tile": EVAL_TILE,
                    "median_ms": round(chip_dt * 1e3, 2),
                    "median_ms_single_dispatch": round(dt * 1e3, 2),
                    "median_ms_f32": round(dt_f32 * 1e3, 2),
                    "frames_per_dispatch": K,
                    "dispatch_floor_ms": round(dispatch_floor_ms, 2),
                    "protocol": (
                        "steady-state: marginal per-frame time of a "
                        f"{K}-frame-per-dispatch scan (distinct rays per "
                        "frame); cancels the sandbox relay's constant "
                        "per-dispatch overhead, which a chip-local "
                        "deployment does not pay"
                    ),
                    "compute_dtype": "bfloat16" if use_fast else "float32",
                    "bf16_max_rgb_delta": round(rgb_delta, 5),
                    "keep_frac": keep_frac,
                    "survivors": count,
                    "sec_per_1024sq_frame": round(sec_per_frame, 3),
                    "device": str(jax.devices()[0]),
                    "baseline_rays_per_sec": baseline,
                    "baseline_basis": "3x estimated A100 reference throughput",
                    "roofline": roofline,
                    "families_measured": _families_sidecar(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
