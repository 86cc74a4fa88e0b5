"""Probe: candidate-set sizes for a slab-test segment pre-filter.

A sample passes the exact pass-2 filter only if its trilerped distance
is < norm_th. Trilerp within a cell is multilinear, so its min over the
cell is attained at a corner: a cell can contain a passing point iff
min(corner values) < th — an EXACT conservative cell set (no Lipschitz
margin). Coarsen cells into supercells; a sample can pass only if it
lies inside an occupied supercell, i.e. its ray parameter z falls in
that box's slab interval [enter, exit].

Candidate segment sets probed (seg consecutive samples per segment):
  A. per-ray span: segment overlaps [min enter, max exit] over hit boxes
  B. per-box stabbing: segment overlaps ANY occupied box's interval

This prints exact survivor fractions, candidate fractions for A/B at
supercell sizes 2/4, and occupied-box counts (device slab cost ~ R x B).

Runs on CPU: JAX_PLATFORMS=cpu python tools/bench_ray_carve_probe.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

N_RAYS = 262144
N_SAMPLES = 64
SEG = 8
NORM_TH = 0.05


def occupied_boxes(vol, th, s):
    """World-free: supercell boxes in grid corner-index units."""
    cell_min = np.minimum(vol[:-1], vol[1:])
    cell_min = np.minimum(cell_min[:, :-1], cell_min[:, 1:])
    cell_min = np.minimum(cell_min[:, :, :-1], cell_min[:, :, 1:])
    occ = cell_min < th
    nd, nh, nw = [int(np.ceil(n / s)) for n in occ.shape]
    pad = [(0, nd * s - occ.shape[0]), (0, nh * s - occ.shape[1]),
           (0, nw * s - occ.shape[2])]
    occp = np.pad(occ, pad)
    sup = occp.reshape(nd, s, nh, s, nw, s).any((1, 3, 5))
    idx = np.argwhere(sup)
    lo = (idx * s).astype(np.float32)
    hi = np.minimum((idx + 1) * s, np.array(occ.shape)).astype(np.float32)
    return lo, hi, sup.size


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS at import time; force
    # CPU explicitly (see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import __graft_entry__ as ge

    rng = np.random.RandomState(0)
    frame = ge._synthetic_frame(rng, grid_shape=(64, 64, 24))
    rays = ge._rays(rng, N_RAYS, bounds=frame["pbounds"])
    vol = frame["pbw"][..., 24]
    bounds = frame["pbounds"]

    from animatable_nerf_tpu.core.grid import (
        pack_corner_volume, pts_sample_blend_weights_packed,
    )

    t = np.linspace(0.0, 1.0, N_SAMPLES, dtype=np.float32)
    z = rays["near"][:, None] * (1 - t) + rays["far"][:, None] * t

    @jax.jit
    def exact_mask():
        pts = (
            rays["ray_o"][:, None] + rays["ray_d"][:, None] * z[..., None]
        ).reshape(-1, 3)
        packed = pack_corner_volume(jnp.asarray(vol)[..., None])
        d = pts_sample_blend_weights_packed(
            pts, packed, jnp.asarray(bounds), n_channels=1
        )[..., 0]
        return (d < NORM_TH).reshape(N_RAYS, N_SAMPLES)

    survive = np.asarray(exact_mask())
    seg_exact = survive.reshape(N_RAYS, N_SAMPLES // SEG, SEG).any(-1)
    print(
        f"exact: {survive.mean():.4f} samples, {seg_exact.mean():.4f} "
        f"segments (seg={SEG}), {survive.any(-1).mean():.4f} rays"
    )

    sizes = np.array(vol.shape, np.float32) - 1.0
    scale = (np.asarray(bounds[1]) - np.asarray(bounds[0])) / sizes
    z_seg = z.reshape(N_RAYS, N_SAMPLES // SEG, SEG)
    za, zb = z_seg[..., 0], z_seg[..., -1]

    for s in (2, 4):
        lo_g, hi_g, total = occupied_boxes(vol, NORM_TH, s)
        lo = bounds[0] + lo_g * scale
        hi = bounds[0] + hi_g * scale

        @jax.jit
        def spans(lo=jnp.asarray(lo), hi=jnp.asarray(hi)):
            o, d = jnp.asarray(rays["ray_o"]), jnp.asarray(rays["ray_d"])
            inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)

            def body(acc, box):
                blo, bhi = box
                t0 = (blo[None] - o) * inv
                t1 = (bhi[None] - o) * inv
                enter = jnp.minimum(t0, t1).max(-1)
                exit_ = jnp.maximum(t0, t1).min(-1)
                hit = exit_ >= enter
                enter = jnp.where(hit, enter, jnp.inf)
                exit_ = jnp.where(hit, exit_, -jnp.inf)
                span_lo, span_hi, segm = acc
                # per-box segment stabbing (variant B)
                segm = segm | (
                    (enter[:, None] <= jnp.asarray(zb))
                    & (exit_[:, None] >= jnp.asarray(za))
                )
                return (
                    jnp.minimum(span_lo, enter),
                    jnp.maximum(span_hi, exit_),
                    segm,
                ), None

            init = (
                jnp.full((N_RAYS,), jnp.inf),
                jnp.full((N_RAYS,), -jnp.inf),
                jnp.zeros((N_RAYS, N_SAMPLES // SEG), bool),
            )
            (span_lo, span_hi, segm), _ = jax.lax.scan(
                body, init, (lo, hi)
            )
            # variant A: segment overlaps the per-ray union span
            sega = (span_lo[:, None] <= jnp.asarray(zb)) & (
                span_hi[:, None] >= jnp.asarray(za)
            )
            return sega, segm

        sega, segb = map(np.asarray, spans())
        missed_a = (seg_exact & ~sega).sum()
        missed_b = (seg_exact & ~segb).sum()
        print(
            f"s={s}: boxes {len(lo_g)}/{total} | "
            f"A(ray-span) cand {sega.mean():.4f} miss {missed_a} | "
            f"B(per-box) cand {segb.mean():.4f} miss {missed_b}"
        )


if __name__ == "__main__":
    main()
