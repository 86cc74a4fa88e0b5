"""Trainer tests: single-step vs fused multi-step (lax.scan) dispatch.

The reference runs one forward/backward/step per Python iteration
(lib/train/trainers/trainer.py:50-71). Here K steps can be fused into
one XLA program (Trainer.train_steps); these tests pin that the fused
path computes the same optimization trajectory as K single-step
dispatches, and that the epoch loop consumes every item under
steps_per_dispatch > 1 (including tails).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from __graft_entry__ import _rays, _synthetic_frame
from animatable_nerf_tpu.config import default_config
from animatable_nerf_tpu.models import AniNeRF
from animatable_nerf_tpu.train import Trainer
from animatable_nerf_tpu.train.trainer import collate_rays, stack_batch


def _tiny_cfg(k_steps=1):
    cfg = default_config()
    cfg.N_rand = 32
    cfg.N_samples = 8
    cfg.num_train_frame = 4
    cfg.train.steps_per_dispatch = k_steps
    return cfg


def _item(rng, cfg):
    item = _synthetic_frame(rng, grid_shape=(8, 8, 8))
    item.update(_rays(rng, cfg.N_rand))
    return item


def _make(cfg, n_items, seed=0):
    rng = np.random.RandomState(seed)
    model = AniNeRF(num_train_frames=cfg.num_train_frame)
    trainer = Trainer(cfg, model)
    items = [collate_rays(_item(rng, cfg), cfg.N_rand) for _ in range(n_items)]
    state = trainer.init_state(jax.random.PRNGKey(0), stack_batch(items[:1]))
    return trainer, state, items


def test_multi_step_matches_sequential():
    """train_steps(K) == K sequential _train_step calls with the same
    per-step keys (scan body IS the single-step fn)."""
    cfg = _tiny_cfg()
    trainer, state, items = _make(cfg, 4)
    batches = [stack_batch([it]) for it in items]
    stacked = {
        k: np.stack([b[k] for b in batches]) for k in batches[0]
    }
    key = jax.random.PRNGKey(7)

    multi_state, multi_stats = trainer.train_steps(state, stacked, key)

    seq_state = state
    keys = jax.random.split(key, 4)
    seq_losses = []
    for i in range(4):
        seq_state, stats = trainer.train_step(seq_state, batches[i], keys[i])
        seq_losses.append(float(stats["loss"]))

    np.testing.assert_allclose(
        np.asarray(multi_stats["loss"]), np.asarray(seq_losses),
        rtol=1e-4, atol=1e-5,
    )
    assert int(multi_state.step) == int(seq_state.step) == 4
    flat_m = jax.tree_util.tree_leaves(multi_state.params)
    flat_s = jax.tree_util.tree_leaves(seq_state.params)
    for m, s in zip(flat_m, flat_s):
        np.testing.assert_allclose(
            np.asarray(m), np.asarray(s), rtol=2e-4, atol=1e-5
        )


class _FakeLoader:
    def __init__(self, items):
        self.items = items

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        return iter(self.items)


@pytest.mark.parametrize("n_items,k_steps", [(5, 2), (3, 4)])
def test_epoch_loop_steps_per_dispatch(tmp_path, n_items, k_steps):
    """Every loader item is consumed: full K-dispatches plus a
    single-step tail; recorder sees one step per item."""
    from animatable_nerf_tpu.train.recorder import Recorder

    cfg = _tiny_cfg(k_steps)
    trainer, state, _ = _make(cfg, 1)
    rng = np.random.RandomState(3)
    raw_items = [_item(rng, cfg) for _ in range(n_items)]
    recorder = Recorder(str(tmp_path / "rec"), resume=False)
    state, _ = trainer.train_epoch(
        state, _FakeLoader(raw_items), recorder, jax.random.PRNGKey(1),
        epoch=0, max_iter=n_items, log_interval=100, record_interval=100,
    )
    assert int(state.step) == n_items
    assert recorder.step == n_items
    assert np.isfinite(recorder.scalars["loss"].median)
