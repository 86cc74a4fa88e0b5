"""Staged timing of the slab-prefilter eval program vs the flat
compacted path, over increasing ray counts (compile + steady-state).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_slab_stage.py [max_rays]
"""

from __future__ import annotations

import sys
import time

import numpy as np

N_SAMPLES = 64


def main():
    from animatable_nerf_tpu import jaxenv

    jax = jaxenv.setup()
    import jax.numpy as jnp

    from animatable_nerf_tpu.models import AniNeRF
    from animatable_nerf_tpu.render import RenderSettings, render_rays
    import __graft_entry__ as ge

    max_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    rng = np.random.RandomState(0)
    frame_np = ge._synthetic_frame(rng, grid_shape=(64, 64, 24))
    frame = {k: jnp.asarray(v) for k, v in frame_np.items()}
    settings = RenderSettings(n_samples=N_SAMPLES, perturb=False)

    sizes = [n for n in (16384, 65536, 262144) if n <= max_rays]
    rays_all = ge._rays(rng, sizes[-1], bounds=frame_np["pbounds"])

    z = jnp.ones((1024, N_SAMPLES))
    model0 = AniNeRF(num_train_frames=60)
    params = jax.jit(
        lambda: model0.init(
            jax.random.PRNGKey(0), jnp.zeros((*z.shape, 3)),
            jnp.asarray(rays_all["ray_d"][:1024]), z, frame, train=False,
        )
    )()

    for n in sizes:
        rays = {
            k: jnp.asarray(np.asarray(v)[:n])
            for k, v in rays_all.items()
        }
        for name, m in (
            ("flat", AniNeRF(num_train_frames=60, eval_keep_frac=0.125)),
            ("slab", AniNeRF(num_train_frames=60, eval_keep_frac=0.125,
                             slab_filter=8)),
        ):
            @jax.jit
            def f(p, r, m=m):
                out = render_rays(m, p, r, frame, settings, train=False)
                return jnp.sum(out["rgb_map"]), out["compact_count"][0]

            t0 = time.perf_counter()
            s, cnt = f(params, rays)
            s = float(s)
            compile_s = time.perf_counter() - t0
            variants = []
            for i in range(10):
                v = dict(rays)
                v["ray_o"] = rays["ray_o"] + jnp.float32(1e-4 * (i + 1))
                variants.append(v)
            for i in range(5):
                float(f(params, variants[i])[0])
            ts = []
            for i in range(5):
                t1 = time.perf_counter()
                float(f(params, variants[5 + i])[0])
                ts.append(time.perf_counter() - t1)
            med = float(np.median(ts)) * 1e3
            print(
                f"n={n:7d} {name}: compile {compile_s:6.1f}s  "
                f"median {med:8.2f} ms  {n / med * 1e3 / 1e3:8.1f}k rays/s  "
                f"count {int(cnt)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
