"""End-to-end A/B of the slab pre-filter eval path vs the flat
compacted path on the whole-frame bench scene (bench.py protocol:
warmup, per-rep distinct inputs, scalar checksum fetch).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_slab_e2e.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

N_RAYS = 262144
N_SAMPLES = 64
WARMUP = 5
REPS = 10


def main():
    from animatable_nerf_tpu import jaxenv

    jax = jaxenv.setup()
    import jax.numpy as jnp

    from animatable_nerf_tpu.models import AniNeRF
    from animatable_nerf_tpu.models.common import eval_capacity
    from animatable_nerf_tpu.render import RenderSettings, render_rays
    import __graft_entry__ as ge

    rng = np.random.RandomState(0)
    frame_np = ge._synthetic_frame(rng, grid_shape=(64, 64, 24))
    frame = {k: jnp.asarray(v) for k, v in frame_np.items()}
    rays = {
        k: jnp.asarray(v)
        for k, v in ge._rays(rng, N_RAYS, bounds=frame_np["pbounds"]).items()
    }
    settings = RenderSettings(n_samples=N_SAMPLES, perturb=False)
    z = jnp.ones((N_RAYS, N_SAMPLES))

    base = AniNeRF(num_train_frames=60)
    params = jax.jit(
        lambda: base.init(
            jax.random.PRNGKey(0), jnp.zeros((*z.shape, 3)), rays["ray_d"], z,
            frame, train=False,
        )
    )()

    probe = jax.jit(
        lambda p, r: render_rays(
            base, p, r, frame, settings, train=False
        )["compact_count"]
    )
    count = int(np.asarray(probe(params, rays))[0])
    need = int(count * 1.15) + 1
    keep_frac = base.eval_keep_frac
    for frac in (keep_frac / 8, keep_frac / 4, keep_frac / 2):
        if eval_capacity(N_RAYS * N_SAMPLES, frac) >= need:
            keep_frac = frac
            break
    print(f"survivors={count} keep_frac={keep_frac}", file=sys.stderr)

    ray_variants = []
    for i in range(WARMUP + REPS):
        v = dict(rays)
        v["ray_o"] = rays["ray_o"] + jnp.float32(1e-4 * (i + 1))
        ray_variants.append(v)

    def time_render(m):
        @jax.jit
        def render(params, rays):
            out = render_rays(m, params, rays, frame, settings, train=False)
            return out["rgb_map"], out["compact_overflow"], jnp.sum(out["rgb_map"])

        for i in range(WARMUP):
            float(render(params, ray_variants[i])[2])
        times = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(render(params, ray_variants[WARMUP + i])[2])
            times.append(time.perf_counter() - t0)
        out = render(params, rays)
        return float(np.median(times)), np.asarray(out[0]), bool(
            np.asarray(out[1]).any()
        )

    results = {}
    variants = {
        "flat": base.clone(eval_keep_frac=keep_frac),
        "slab8_sc2": base.clone(
            eval_keep_frac=keep_frac, slab_filter=8,
            slab_supercell=2, slab_box_capacity=4096,
        ),
        "slab4_sc2": base.clone(
            eval_keep_frac=keep_frac, slab_filter=4,
            slab_supercell=2, slab_box_capacity=4096,
        ),
        "slab16_sc2": base.clone(
            eval_keep_frac=keep_frac, slab_filter=16,
            slab_supercell=2, slab_box_capacity=4096,
        ),
    }
    ref_rgb = None
    for name, m in variants.items():
        dt, rgb, overflow = time_render(m)
        if ref_rgb is None:
            ref_rgb = rgb
        delta = float(np.max(np.abs(rgb - ref_rgb)))
        results[name] = dt
        print(
            f"{name:12s} {dt * 1e3:8.2f} ms  {N_RAYS / dt / 1e3:8.1f}k rays/s"
            f"  overflow={overflow}  max_rgb_delta={delta:.2e}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
