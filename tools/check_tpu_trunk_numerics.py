"""TPU trunk-miscompile canary: flat vs row-chunked field networks.

Session-7 incident: the remote-compiled XLA:TPU executable for
GeometricFieldNetwork (the weight-normalized softplus trunk shared by
the SDF/NeRF-PDF families) returns garbage for flat row counts in a
band around ~0.5M rows (measured broken at 524,287-589,824; exact at
<= 393,216 and at 1,048,576), while the SAME program compiled for CPU
is exact and the TPU eager (op-by-op) path is exact. The dense
whole-frame eval tile (8192 rays x 64 samples = 524,288 rows) sits in
the band — production impact was silently wrong dense-rung renders.

The framework mitigation is fixed-row chunking (models/common.py
`apply_chunked_rows`, lax.map at 131,072 rows) on the dense-path field
heads. This tool re-maps the band on the current backend so a libtpu /
relay update can be re-certified:

    PYTHONPATH=/root/.axon_site:/root/repo python tools/check_tpu_trunk_numerics.py
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZES = (131072, 262144, 393216, 458752, 524288, 589824, 786432, 1048576)


def main():
    from animatable_nerf_tpu import jaxenv

    jax = jaxenv.setup()
    import jax.numpy as jnp

    from animatable_nerf_tpu.fields.fields import GeometricFieldNetwork
    from animatable_nerf_tpu.fields import TPoseNeRF
    from animatable_nerf_tpu.models.common import apply_chunked_rows

    print(f"backend: {jax.default_backend()}")
    r = np.random.RandomState(1)

    # --- GeometricFieldNetwork (SDF/NeRF-PDF trunk, weight-norm softplus)
    net = GeometricFieldNetwork()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((16, 3)))
    flat = jax.jit(net.apply)
    chunked = jax.jit(
        lambda p, x: apply_chunked_rows(lambda y: net.apply(p, y), x)
    )
    print("== GeometricFieldNetwork ==")
    for n in SIZES:
        x = jnp.asarray((r.randn(n, 3) * 0.3).astype(np.float32))
        d = float(jnp.max(jnp.abs(flat(params, x) - chunked(params, x))))
        print(f"  N={n}: flat-vs-chunked maxdiff {d:.6f} "
              f"{'BROKEN' if d > 1e-2 else 'ok'}")

    # --- TPoseNeRF trunk (AniNeRF canonical field)
    net2 = TPoseNeRF(num_latents=2)
    xd = jnp.zeros((16, 3))
    vd = jnp.zeros((16, 3))
    params2 = net2.init(jax.random.PRNGKey(0), xd, vd, jnp.zeros((), jnp.int32))

    def apply2(p, x, v):
        return net2.apply(p, x, v, jnp.zeros((), jnp.int32))

    flat2 = jax.jit(apply2)
    chunked2 = jax.jit(
        lambda p, x, v: apply_chunked_rows(
            lambda xx, vv: apply2(p, xx, vv), x, v
        )
    )
    print("== TPoseNeRF ==")
    for n in SIZES:
        x = jnp.asarray((r.randn(n, 3) * 0.3).astype(np.float32))
        v = jnp.asarray(r.randn(n, 3).astype(np.float32))
        fa = flat2(params2, x, v)
        ca = chunked2(params2, x, v)
        d = max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(jax.tree_util.tree_leaves(fa),
                            jax.tree_util.tree_leaves(ca))
        )
        print(f"  N={n}: flat-vs-chunked maxdiff {d:.6f} "
              f"{'BROKEN' if d > 1e-2 else 'ok'}")


if __name__ == "__main__":
    main()
