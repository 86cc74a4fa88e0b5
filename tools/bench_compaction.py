"""Micro-bench: sort-based vs hierarchical rank-search compaction at
production shapes (VERDICT-r3 item 2). Runs both formulations inside
the same lax.map-over-32-tiles structure as render_image so the win
measured here is the win the whole-frame program sees.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_compaction.py
"""

from __future__ import annotations

import time

import numpy as np

N_RAYS = 262144
N_SAMPLES = 64
TILE = 8192
CAP = 57344  # the representative scene's quantized rung


def main():
    from animatable_nerf_tpu import jaxenv

    jax = jaxenv.setup()
    import jax.numpy as jnp

    from animatable_nerf_tpu.models.common import (
        _compact_indices_sort,
        _compact_indices_hier,
    )

    rng = np.random.RandomState(0)
    n_tiles = N_RAYS // TILE
    pts = TILE * N_SAMPLES
    # ~9.3% survivors, the representative in-shell fraction
    keep = jnp.asarray(rng.rand(n_tiles, pts) < 0.093)

    def run(fn):
        def tile_body(k):
            idx, n_kept = fn(k, CAP)
            return jnp.sum(idx) + n_kept

        def whole(keep, salt):
            # salt keeps repeat calls from result-caching
            k = keep ^ (jax.lax.broadcasted_iota(
                jnp.int32, keep.shape, 1) == salt)
            return jnp.sum(jax.lax.map(tile_body, k))

        f = jax.jit(whole)
        for i in range(5):
            float(f(keep, jnp.int32(i)))
        ts = []
        for i in range(10):
            t0 = time.perf_counter()
            float(f(keep, jnp.int32(100 + i)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    t_sort = run(_compact_indices_sort)
    t_hier = run(_compact_indices_hier)
    print(f"sort: {t_sort:8.2f} ms   hier: {t_hier:8.2f} ms   "
          f"({t_sort / t_hier:.2f}x)")


if __name__ == "__main__":
    main()
