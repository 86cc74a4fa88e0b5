"""Trainer for the image-space baselines (NHR / NT).

Reference counterparts: lib/train/trainers/nhr.py and nt.py — full-image
forward + VGG19 perceptual loss (lib/losses/nhr_perceptual_loss.py).

When `train.vgg_weights` points at a converted VGG19 head
(tools/convert_vgg_weights.py), the loss is the exact reference
objective: mask-multiplied rgb stacked with the mask channel, L1 between
VGG19 relu1_2/relu2_2 features plus image L1 (nhr.py:25-31). Without
weights (none are bundled — they derive from ImageNet models) the
fallback is masked MSE + L1 + a multi-scale gradient term, which plays
the same role of sharpening high-frequency detail — deviation
documented.

The whole iteration is one jitted program; full-image convs dominate so
there is no ray batching.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .optim import make_optimizer

BASELINE_FRAME_KEYS = (
    "img", "msk", "K", "RT", "mask_at_box", "A", "big_A", "R", "Th",
    "tpose", "tbw", "tbounds", "wbounds", "latent_index", "uv", "uv_msk",
)


class BaselineState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _image_pyramid_l1(pred, gt, levels: int = 3):
    """Multi-scale L1: average-pool both images and L1 at each level —
    the perceptual-loss stand-in (captures low/mid-frequency structure)."""
    loss = jnp.mean(jnp.abs(pred - gt))
    p, g = pred[None], gt[None]
    for _ in range(levels - 1):
        p = jax.lax.reduce_window(
            p, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
        g = jax.lax.reduce_window(
            g, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
        loss = loss + jnp.mean(jnp.abs(p - g))
    return loss / levels


class BaselineTrainer:
    """Full-image trainer for NHR/NT flax modules whose __call__ takes a
    frame dict and returns {'rgb_map' (H,W,3), 'mask' (H,W)}."""

    def __init__(self, cfg, model):
        self.cfg = cfg
        self.model = model
        self.tx, self.sched = make_optimizer(cfg)
        # exact reference objective when converted VGG19 weights are
        # supplied (train.vgg_weights); {} selects the documented
        # stand-in. Passed as a jit ARGUMENT (never close over big
        # arrays on the TPU path — remote-compile embeds constants).
        vgg_path = cfg.train.get("vgg_weights", "")
        if vgg_path:
            from .perceptual import load_vgg_npz

            self._vgg = load_vgg_npz(vgg_path)
        else:
            self._vgg = {}
        self._step_fn = jax.jit(self._train_step)

    def _frame(self, item):
        return {
            k: jnp.asarray(np.asarray(item[k]))
            for k in BASELINE_FRAME_KEYS
            if k in item
        }

    def init_state(self, key, item) -> BaselineState:
        frame = self._frame(item)
        params = self.model.init(key, frame, train=True)
        return BaselineState(
            params=params,
            opt_state=self.tx.init(params),
            step=jnp.asarray(0),
        )

    def _loss(self, params, frame, vgg):
        out = self.model.apply(params, frame, train=True)
        pred = out["rgb_map"]
        gt = frame["img"]
        m = frame["msk"][..., None]
        img_loss = jnp.mean((pred - gt) ** 2)
        if self._vgg:
            # reference objective (nhr.py:25-31 / nt.py): mask-multiply
            # rgb and gt, stack the predicted mask channel against the
            # gt mask, VGG19 feature L1 + image L1
            from .perceptual import perceptual_loss

            mskf = (frame["msk"] > 0).astype(jnp.float32)[..., None]
            rgb = pred * mskf
            img = gt * mskf
            pm = out["mask"][..., None] if "mask" in out else mskf
            x = jnp.concatenate([rgb, pm], axis=-1)[None]
            target = jnp.concatenate([img, mskf], axis=-1)[None]
            feat_loss, l1_loss = perceptual_loss(vgg, x, target)
            loss = feat_loss + l1_loss
            extra = {"vgg_loss": feat_loss, "l1_loss": l1_loss}
        else:
            pyr = _image_pyramid_l1(pred, gt)
            mask_loss = 0.0
            if "mask" in out:
                mask_loss = jnp.mean(
                    (out["mask"] - (frame["msk"] > 0).astype(jnp.float32))
                    ** 2
                )
            loss = img_loss + 0.1 * pyr + 0.1 * mask_loss
            extra = {"pyr_loss": pyr, "mask_loss": mask_loss}
        stats = {
            "loss": loss,
            "img_loss": img_loss,
            **extra,
            # masked MSE over the masked PIXEL COUNT (a mean over all
            # pixels would inflate PSNR on sparse subjects)
            "psnr": -10.0 * jnp.log(
                jnp.maximum(
                    jnp.sum(((pred - gt) * m) ** 2)
                    / jnp.maximum(jnp.sum(m) * 3.0, 1.0),
                    1e-10,
                )
            ) / jnp.log(10.0),
        }
        return loss, stats

    def _train_step(self, state: BaselineState, frame, vgg):
        import optax

        (loss, stats), grads = jax.value_and_grad(
            self._loss, has_aux=True
        )(state.params, frame, vgg)
        updates, opt_state = self.tx.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            BaselineState(params, opt_state, state.step + 1),
            stats,
        )

    def train_step(self, state, item, key=None):
        return self._step_fn(state, self._frame(item), self._vgg)
