"""Probe the slab pre-filter's pass-0 statistics on the bench scene:
occupied-supercell box count (vs capacity), segment keep fraction, and
candidate-point fraction — to size _SLAB_SEG_FACTOR / slab_box_capacity
before any end-to-end A/B.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_slab_rates.py
"""

from __future__ import annotations

import sys

import numpy as np

N_RAYS = 262144
N_SAMPLES = 64
SEG = 8


def main():
    from animatable_nerf_tpu import jaxenv

    jax = jaxenv.setup()
    import jax.numpy as jnp

    from animatable_nerf_tpu.core.lbs import (
        world_dirs_to_pose_dirs,
        world_points_to_pose_points,
    )
    from animatable_nerf_tpu.core.sampling import stratified_z_vals
    from animatable_nerf_tpu.models.common import (
        occupied_supercell_boxes,
        slab_segment_keep,
        slab_span,
    )
    import __graft_entry__ as ge

    rng = np.random.RandomState(0)
    frame_np = ge._synthetic_frame(rng, grid_shape=(64, 64, 24))
    frame = {k: jnp.asarray(v) for k, v in frame_np.items()}
    rays = ge._rays(rng, N_RAYS, bounds=frame_np["pbounds"])
    ray_o = jnp.asarray(rays["ray_o"])
    ray_d = jnp.asarray(rays["ray_d"])
    near = jnp.asarray(rays["near"])
    far = jnp.asarray(rays["far"])
    z = stratified_z_vals(near, far, N_SAMPLES, key=None, perturb=False)

    norm_th = 0.05

    for supercell, capacity in ((4, 1024), (4, 2048), (2, 4096), (2, 8192)):
        lo, hi, box_overflow = occupied_supercell_boxes(
            frame["pbw"][..., 24], frame["pbounds"], norm_th,
            supercell, capacity,
        )
        n_boxes = int(np.asarray(jnp.sum(jnp.all(lo <= hi, axis=-1))))
        pose_o = world_points_to_pose_points(ray_o, frame["R"], frame["Th"])
        pose_d = world_dirs_to_pose_dirs(ray_d, frame["R"])
        span_lo, span_hi = slab_span(pose_o, pose_d, lo, hi)
        keep = slab_segment_keep(span_lo, span_hi, z, SEG)
        frac = float(np.asarray(jnp.mean(keep.astype(jnp.float32))))
        print(
            f"supercell={supercell} cap={capacity}: boxes={n_boxes} "
            f"overflow={bool(np.asarray(box_overflow)[0])} "
            f"seg_keep={frac:.3f}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
