"""Micro-benchmark: pass-1 distance-trilerp cost vs gather row dtype.

The eval pass-1 (models/aninerf.py _compact_inputs) gathers one
corner-packed row of the distance channel per sampled point; BASELINE.md
measured the row-byte reduction f32->bf16 as a real win. This probes the
next rung: u8-quantized rows (8 bytes/row vs 16) and a min-corner
single-value row (2 bytes), to decide if either is worth shipping.

Run from the repo root:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_gather_rows.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    from animatable_nerf_tpu import jaxenv

    jax = jaxenv.setup()
    import jax.numpy as jnp

    from animatable_nerf_tpu.core.grid import (
        pack_corner_volume,
        pts_sample_blend_weights_packed,
    )
    import __graft_entry__ as ge

    N = 262144 * 64  # whole-frame point count
    rng = np.random.RandomState(0)
    frame = ge._synthetic_frame(rng, grid_shape=(64, 64, 24))
    dist_vol = jnp.asarray(frame["pbw"][..., 24:25])
    bounds = jnp.asarray(frame["pbounds"])
    th = 0.05

    pts_np = rng.uniform(
        frame["pbounds"][0], frame["pbounds"][1], size=(N, 3)
    ).astype(np.float32)

    packed_f32 = np.asarray(pack_corner_volume(dist_vol))
    packed_bf16 = packed_f32.astype(jnp.bfloat16)
    # u8 quantization: clamp at 2*th (pass 1 only needs fidelity near the
    # shell), scale certified at dequant time
    cap_v = 2.0 * th
    q = np.clip(packed_f32, 0.0, cap_v) / cap_v
    packed_u8 = np.round(q * 255.0).astype(np.uint8)
    # min-corner volume: one value per cell
    minc = packed_f32.min(axis=-1, keepdims=True).astype(jnp.bfloat16)

    def run_variant(name, vol, n_channels, decode):
        vol = jnp.asarray(vol)

        @jax.jit
        def f(pts):
            out = pts_sample_blend_weights_packed(
                pts, vol, bounds, n_channels=n_channels
            )
            keep = decode(out[..., 0])
            return jnp.sum(keep.astype(jnp.int32))

        variants = [
            jnp.asarray(pts_np + np.float32(1e-4 * i)) for i in range(8)
        ]
        for i in range(4):
            int(f(variants[i]))
        ts = []
        for i in range(8):
            t0 = time.perf_counter()
            int(f(variants[i]))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts)) * 1e3
        print(f"{name:28s} {med:8.2f} ms")
        return med

    run_variant(
        "f32 rows (32B)", packed_f32, 1, lambda d: d < th
    )
    run_variant(
        "bf16 rows (16B, current)", packed_bf16, 1, lambda d: d < th
    )
    run_variant(
        "u8 rows (8B)",
        packed_u8,
        1,
        # trilerp of u8 corners: dequantize AFTER interp (linear)
        lambda d: d * (cap_v / 255.0) < th + cap_v / 255.0,
    )
    # min-corner: nearest-cell single-value lookup (no trilerp weights)
    minc_j = jnp.asarray(minc)
    Dm, Hm, Wm, _ = minc_j.shape
    flat_minc = minc_j.reshape(-1)

    @jax.jit
    def f_minc(pts):
        p01 = (pts - bounds[0]) / (bounds[1] - bounds[0])
        sizes = jnp.array([Dm + 1, Hm + 1, Wm + 1], jnp.float32)
        idx = jnp.clip(p01 * (sizes - 1.0), 0.0, sizes - 1.0)
        i0 = jnp.minimum(
            jnp.floor(idx).astype(jnp.int32),
            jnp.array([Dm - 1, Hm - 1, Wm - 1], jnp.int32),
        )
        lin = (i0[:, 0] * Hm + i0[:, 1]) * Wm + i0[:, 2]
        d = jnp.take(flat_minc, lin, axis=0)
        return jnp.sum((d < th).astype(jnp.int32))

    variants = [jnp.asarray(pts_np + np.float32(1e-4 * i)) for i in range(8)]
    for i in range(4):
        int(f_minc(variants[i]))
    ts = []
    for i in range(8):
        t0 = time.perf_counter()
        int(f_minc(variants[i]))
        ts.append(time.perf_counter() - t0)
    print(f"{'min-corner bf16 (2B row)':28s} {float(np.median(ts)) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
