"""Composite training losses.

Reference: lib/train/trainers/tpose_trainer.py:21-73 and
lib/train/trainers/crit.py. Every selection the reference performs by
boolean indexing is a masked mean here — numerically identical when the
mask matches the reference's selected set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.numerics import safe_norm


def masked_mean(x, mask):
    """Mean of x over mask==True elements (0 if mask is empty).

    Broadcasting: if x has trailing dims beyond mask's, the mask selects
    rows and the mean runs over all elements of the selected rows —
    matching e.g. `smooth_l1_loss(pbw[sel], tbw[sel])`.
    """
    mask = mask.astype(x.dtype)
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    count = jnp.sum(jnp.broadcast_to(mask, x.shape))
    # where() instead of x*mask: a non-finite x at a masked-OUT element
    # must not leak into the sum (nan*0 = nan) — defense in depth on top
    # of the models' substitute_masked input sanitization
    sel = jnp.where(jnp.broadcast_to(mask, x.shape) > 0, x, 0.0)
    return jnp.sum(sel) / jnp.maximum(count, 1.0)


def smooth_l1(x, y):
    """Elementwise smooth-L1 (torch default beta=1)."""
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def bce_with_logits(logits, labels):
    """Numerically stable binary cross entropy with logits."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def sdf_mask_alpha(iter_step, alpha_max: float = 0.0):
    """The doubling alpha schedule (crit.py:5-16): 50 * 2^(#milestones
    passed at 10k/20k/30k/40k/50k).

    `alpha_max` > 0 caps the ramp (config `sdf_mask_alpha_max`,
    DEFAULT OFF = exact reference schedule). The knob exists as a
    schedule-shaping tool for short budgets; note the round-4 capped
    control run (BASELINE.md round-4, item 6) measured that capping
    does NOT stabilize the late-schedule PSNR oscillation — that
    instability is intrinsic to the hard-silhouette + eikonal regime
    at the 1024-ray B=1 budget, and the working mitigation is
    best-checkpoint selection via the recorded val PSNR curve."""
    milestones = jnp.asarray([10000, 20000, 30000, 40000, 50000])
    n = jnp.sum(iter_step > milestones)
    alpha = 50.0 * (2.0**n)
    if alpha_max and alpha_max > 0:
        alpha = jnp.minimum(alpha, alpha_max)
    return alpha


def compute_losses(ret: dict, batch: dict, iter_step,
                   mask_alpha_max: float = 0.0):
    """Composite loss. Consumes the renderer output `ret` and the ray
    batch (rgb, mask_at_box, plus the renderer's msk_* tensors).

    Returns (loss, scalar_stats).
    """
    stats = {}
    loss = 0.0

    if "resd" in ret:
        # 0.01 * mean ||resd|| over evaluated points (tpose_trainer.py:26-29).
        # safe_norm: a zero-init residual field has ||resd|| = 0 exactly,
        # where the norm's derivative is inf (core/numerics.py)
        resd_norm = safe_norm(ret["resd"], axis=-1)
        offset_loss = masked_mean(resd_norm, ret["resd_mask"])
        stats["offset_loss"] = offset_loss
        loss += 0.01 * offset_loss

    if "gradients" in ret:
        gnorm = safe_norm(ret["gradients"], axis=-1)
        grad_loss = masked_mean((gnorm - 1.0) ** 2, ret["grad_mask"])
        stats["grad_loss"] = grad_loss
        loss += 0.01 * grad_loss

    if "observed_gradients" in ret:
        ognorm = safe_norm(ret["observed_gradients"], axis=-1)
        ograd_loss = masked_mean((ognorm - 1.0) ** 2, ret["observed_grad_mask"])
        stats["ograd_loss"] = ograd_loss
        loss += 0.01 * ograd_loss

    if "pbw" in ret and "tbw" in ret:
        bw = smooth_l1(ret["pbw"], ret["tbw"])
        bw_loss = masked_mean(bw, ret["bw_mask"])
        stats["bw_loss"] = bw_loss
        loss += bw_loss

    if "msk_sdf" in ret:
        # silhouette BCE with the alpha schedule (crit.py:5-19);
        # mask_alpha_max optionally caps the ramp (see sdf_mask_alpha)
        alpha = sdf_mask_alpha(iter_step, alpha_max=mask_alpha_max)
        logits = -alpha * ret["msk_sdf"]
        labels = ret["msk_in"].astype(logits.dtype)  # 1 inside, 0 free
        sel = ret["msk_free"] | ret["msk_in"]
        mask_loss = masked_mean(bce_with_logits(logits, labels), sel) / alpha
        stats["mask_loss"] = mask_loss
        loss += mask_loss

    # image MSE on mask_at_box rays (tpose_trainer.py:60-63)
    sel = batch["mask_at_box"]
    if "mask" in batch:
        sel = sel & batch["mask"]
    err = (ret["rgb_map"] - batch["rgb"]) ** 2
    img_loss = masked_mean(err, sel)
    stats["img_loss"] = img_loss
    loss += img_loss

    if "compact_overflow" in ret:
        # fraction of frames whose train-time survivor compaction
        # overflowed (loss silently subsampled) — monitor and raise
        # train_keep_frac if nonzero
        stats["compact_overflow"] = jnp.sum(
            ret["compact_overflow"].astype(jnp.float32)
        )
    if "compact_overflow_stage2" in ret:
        # stage-2-only overflow (exact survivors exceed the exact
        # train_keep_frac capacity but fit the widened pass-1 one): the
        # trainer auto-disables train stage-2 when this fires
        stats["compact_overflow_stage2"] = jnp.sum(
            ret["compact_overflow_stage2"].astype(jnp.float32)
        )

    stats["loss"] = loss
    return loss, stats


def elastic_crit(resd_jacobian):
    """Elastic regularizer: squared log-singular-values of the
    displacement-field Jacobian (crit.py:22-30; present in the reference
    but unused by its shipped trainers). jac: (..., 3, 3) -> scalar."""
    s = jnp.linalg.svd(resd_jacobian, compute_uv=False)
    log_s = jnp.log(jnp.clip(s, 1e-6, None))
    return jnp.mean(jnp.sum(log_s**2, axis=-1))


def normal_crit(surf_normal_pred, surf_normal_gt, viewdir, surf_mask):
    """Surface-normal supervision (crit.py:33-50, unused by the shipped
    trainers): masked, view-weighted normal difference with the
    reference's y/z sign flip. All (N, 3) + (N,) bool mask."""
    w = jnp.clip(jnp.sum(-surf_normal_pred * viewdir, axis=1), 0.0, 1.0) ** 2
    norm = jnp.maximum(jnp.linalg.norm(surf_normal_gt, axis=1), 1e-8)
    gt = surf_normal_gt / norm[..., None]
    pred = surf_normal_pred * jnp.array([1.0, -1.0, -1.0])
    diff = safe_norm(pred - gt, axis=1)
    return masked_mean(w * diff, surf_mask)
