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


class _FrameDS:
    """Minimal dataset facade for build_frame_store (frame-major items)."""

    num_cams = 2

    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_frame_store_matches_embedded_frames():
    """A step fed from the device store == a step with frame metadata
    embedded in the batch (same rays, same key)."""
    from animatable_nerf_tpu.train.trainer import build_frame_store

    cfg = _tiny_cfg()
    rng = np.random.RandomState(11)
    # 3 frames x 2 cams; tbw/tbounds/big_A etc. constant across frames
    frames = [_synthetic_frame(rng, grid_shape=(8, 8, 8)) for _ in range(3)]
    const = frames[0]
    for f in frames:
        for k in ("tbw", "tbounds", "big_A", "weights", "tvertices"):
            f[k] = const[k]
    ds_items = []
    for fi, f in enumerate(frames):
        for cam in range(2):
            item = dict(f)
            item.update(_rays(rng, cfg.N_rand))
            item["frame_index"] = fi + 10
            ds_items.append(item)
    ds = _FrameDS(ds_items)

    model = AniNeRF(num_train_frames=cfg.num_train_frame)
    trainer = Trainer(cfg, model)
    probe = stack_batch([collate_rays(ds_items[0], cfg.N_rand)])
    state = trainer.init_state(jax.random.PRNGKey(0), probe)

    store = build_frame_store(ds)
    # constants dedup: the shared keys must land in "static"
    assert "tbw" in store["static"] and "pbw" in store["per_frame"]
    assert store["per_frame"]["pbw"].shape[0] == 3

    item = ds_items[3]  # frame 1, cam 1
    key = jax.random.PRNGKey(9)
    b_full = stack_batch([collate_rays(item, cfg.N_rand)])
    s_full, stats_full = trainer.train_step(state, b_full, key)
    slot = store["slot_of"][int(item["frame_index"])]
    b_store = stack_batch([collate_rays(item, cfg.N_rand, frame_slot=slot)])
    s_store, stats_store = trainer.train_step(state, b_store, key, store=store)

    np.testing.assert_allclose(
        float(stats_full["loss"]), float(stats_store["loss"]),
        rtol=1e-5, atol=1e-6,
    )
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_store.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_preemption_guard_signal_and_epoch_stop():
    """PreemptionGuard: the first SIGTERM flips should_stop and restores
    the default handler; a guarded train_epoch exits at the next
    dispatch boundary without consuming the loader."""
    import os
    import signal

    from animatable_nerf_tpu.train.trainer import PreemptionGuard
    from animatable_nerf_tpu.train.recorder import Recorder

    guard = PreemptionGuard(signums=(signal.SIGUSR1,))
    assert not guard.should_stop
    os.kill(os.getpid(), signal.SIGUSR1)
    # delivery is synchronous in the main thread at the next bytecode
    assert guard.should_stop
    # handler restored: a second signal would take the default path
    assert signal.getsignal(signal.SIGUSR1) is not guard._handle

    cfg = _tiny_cfg()
    trainer, state, items = _make(cfg, 3)
    consumed = []

    class _Loader:
        def set_epoch(self, e):
            pass

        def __iter__(self):
            for it in items:
                consumed.append(1)
                yield it

    rec = Recorder(None, is_main=False)
    state2, _ = trainer.train_epoch(
        state, _Loader(), rec, jax.random.PRNGKey(0), 0, 10, guard=guard
    )
    assert consumed == [1]  # stopped at the first dispatch boundary
    assert state2 is state  # no step ran


def test_run_train_preempted_saves_latest(tmp_path):
    """A preempted run_train saves a resumable latest checkpoint and
    returns instead of finishing its epochs."""
    import os as _os

    from animatable_nerf_tpu import engine
    from animatable_nerf_tpu.config import load_config
    from animatable_nerf_tpu.data import generate_synthetic_dataset
    from animatable_nerf_tpu.train.trainer import PreemptionGuard

    root = str(tmp_path / "human")
    generate_synthetic_dataset(root, n_frames=1, n_views=1, image_size=48,
                               n_verts=200, n_blobs=32)
    opts = [
        "train_dataset.data_root", root,
        "train_dataset.ann_file", _os.path.join(root, "annots.npy"),
        "test_dataset.data_root", root,
        "test_dataset.ann_file", _os.path.join(root, "annots.npy"),
        "training_view", "[0]", "num_train_frame", "1",
        "H", "48", "W", "48", "N_rand", "32", "N_samples", "8",
        "ep_iter", "2", "log_interval", "100",
        "exp_name", "test_preempt",
        "record_dir", str(tmp_path / "rec"),
        "trained_model_dir", str(tmp_path / "model"),
        "result_dir", str(tmp_path / "res"),
        "resume", "False",
    ]
    cfg = load_config("configs/synthetic.yaml", opts=opts)

    guard = PreemptionGuard(signums=())
    guard.should_stop = True  # pre-tripped: preempted before epoch 1
    engine.run_train(cfg, epochs=5, guard=guard)
    assert _os.path.exists(
        _os.path.join(cfg.trained_model_dir, "latest.flax")
    )


def test_frame_store_budget_fallback():
    from animatable_nerf_tpu.train.trainer import build_frame_store

    cfg = _tiny_cfg()
    rng = np.random.RandomState(12)
    item = _item(rng, cfg)
    item["frame_index"] = 0
    ds = _FrameDS([item, item])
    assert build_frame_store(ds, max_mb=1e-6) is None


def test_frame_store_bakes_pdist_grids():
    """build_frame_store(pdist_res=...) bakes per-frame packed distance
    grids; assemble_from_store threads them into the batch; the grid
    values agree with a direct build for the gathered frame."""
    import functools

    from animatable_nerf_tpu.ops.knn_pallas import build_pdist_payload
    from animatable_nerf_tpu.train.trainer import (
        build_frame_store, assemble_from_store, _store_args,
    )

    cfg = _tiny_cfg()
    rng = np.random.RandomState(13)
    items = []
    frames = []
    for fi in range(2):
        item = _item(rng, cfg)
        item["frame_index"] = fi
        item["pvertices"] = (rng.randn(60, 3) * 0.3).astype(np.float32)
        frames.append(item)
        items.extend([item, dict(item)])  # num_cams = 2 views per frame
    ds = _FrameDS(items)
    store = build_frame_store(ds, pdist_res=8)
    assert "pdist_packed" in store["per_frame"]
    assert store["per_frame"]["pdist_packed"].shape == (2, 7, 7, 7, 8)

    batch = stack_batch(
        [collate_rays(frames[1], cfg.N_rand, frame_slot=1)]
    )
    full = assemble_from_store(
        {k: jnp.asarray(v) for k, v in batch.items()}, _store_args(store)
    )
    ref_packed, ref_margin, ref_bounds = jax.jit(
        functools.partial(build_pdist_payload, res=8)
    )(jnp.asarray(frames[1]["pvertices"]))
    np.testing.assert_array_equal(
        np.asarray(full["pdist_packed"][0], np.float32),
        np.asarray(ref_packed, np.float32),
    )
    np.testing.assert_allclose(
        np.asarray(full["pdist_bounds"][0]), np.asarray(ref_bounds),
        rtol=1e-6,
    )


def test_sdf_pdf_train_step_sharded():
    """Flagship SDF-PDF model: fused multi-step training over an
    8-device mesh (frame-axis DP, eikonal double-grad inside scan)."""
    from animatable_nerf_tpu.models import SDFPDF
    from animatable_nerf_tpu.parallel import make_mesh, shard_batch

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    cfg = _tiny_cfg(k_steps=2)
    cfg.N_rand = 16
    rng = np.random.RandomState(5)
    model = SDFPDF(num_latents=cfg.num_train_frame)
    trainer = Trainer(cfg, model)
    items = [collate_rays(_item(rng, cfg), cfg.N_rand) for _ in range(16)]
    state = trainer.init_state(jax.random.PRNGKey(0), stack_batch(items[:1]))
    mesh = make_mesh(8)
    batches = {
        k: np.stack([stack_batch(items[s * 8:(s + 1) * 8])[k]
                     for s in range(2)])
        for k in items[0]
    }
    batches = shard_batch(batches, mesh, leading_steps=True)
    state, stats = trainer.train_steps(state, batches, jax.random.PRNGKey(2))
    losses = np.asarray(stats["loss"])
    assert losses.shape == (2,) and np.isfinite(losses).all()
    assert int(state.step) == 16

    # compacted + grid pass-1 variant through the same sharded fused step
    import functools

    from animatable_nerf_tpu.ops.knn_pallas import build_pdist_payload

    build = jax.jit(functools.partial(build_pdist_payload, res=8))
    gitems = []
    for it in items:
        packed, margin, bounds = build(jnp.asarray(it["pvertices"]))
        gitems.append({**it, "pdist_packed": np.asarray(packed),
                       "pdist_margin": np.asarray(margin),
                       "pdist_bounds": np.asarray(bounds)})
    model_g = SDFPDF(num_latents=cfg.num_train_frame, train_keep_frac=1.0)
    trainer_g = Trainer(cfg, model_g)
    state_g = trainer_g.init_state(
        jax.random.PRNGKey(0), stack_batch(gitems[:1])
    )
    gbatches = {
        k: np.stack([stack_batch(gitems[s * 8:(s + 1) * 8])[k]
                     for s in range(2)])
        for k in gitems[0]
    }
    gbatches = shard_batch(gbatches, mesh, leading_steps=True)
    state_g, stats_g = trainer_g.train_steps(
        state_g, gbatches, jax.random.PRNGKey(2)
    )
    g_losses = np.asarray(stats_g["loss"])
    assert g_losses.shape == (2,) and np.isfinite(g_losses).all()
    assert float(np.asarray(stats_g["compact_overflow"]).max()) == 0.0


def test_animation_trainer_inherited_epoch(tmp_path):
    """Stage-2 trainer through the INHERITED Trainer.train_epoch: frame
    store + steps_per_dispatch fusion, every item consumed, novel_pose_bw
    is the only subtree that moves (frozen base network)."""
    from animatable_nerf_tpu.train.animation import AnimationTrainer
    from animatable_nerf_tpu.train.recorder import Recorder
    from animatable_nerf_tpu.train.trainer import build_frame_store

    cfg = _tiny_cfg(k_steps=2)
    cfg.n_anim_samples = 64
    rng = np.random.RandomState(21)
    frames = [_synthetic_frame(rng, grid_shape=(8, 8, 8)) for _ in range(3)]
    items = []
    for fi, f in enumerate(frames):
        item = dict(f)
        item.update(_rays(rng, cfg.N_rand))
        item["frame_index"] = fi
        item["bw_latent_index"] = np.asarray(fi % 2, np.int32)
        items.append(item)

    model = AniNeRF(num_train_frames=cfg.num_train_frame, num_eval_frames=2)
    trainer = AnimationTrainer(cfg, model)
    probe = stack_batch([collate_rays(items[0], cfg.N_rand)])
    state = trainer.init_state(jax.random.PRNGKey(0), probe)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)

    ds = _FrameDS(items)
    ds.num_cams = 1  # one view per frame in this fixture
    store = build_frame_store(ds)
    assert store is not None and len(store["slot_of"]) == 3

    recorder = Recorder(str(tmp_path / "rec"), resume=False)
    state, _ = trainer.train_epoch(
        state, _FakeLoader(items * 2), recorder, jax.random.PRNGKey(1),
        epoch=0, max_iter=6, log_interval=100, record_interval=100,
        store=store,
    )
    assert int(state.step) == 6
    assert recorder.step == 6
    assert np.isfinite(recorder.scalars["loss"].median)

    # frozen base network: only novel_pose_bw params moved
    def flat(tree, prefix=""):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                out.update(flat(v, prefix + "/" + k))
            return out
        return {prefix: tree}

    before, after = flat(p0), flat(
        jax.tree_util.tree_map(np.asarray, state.params)
    )
    moved = {k for k in before
             if not np.allclose(before[k], after[k], atol=0)}
    assert moved, "stage-2 trained nothing"
    assert all("novel_pose_bw" in k for k in moved), sorted(moved - {
        k for k in moved if "novel_pose_bw" in k})


def test_train_compaction_matches_dense():
    """AniNeRF train_keep_frac: loss AND parameter gradients from the
    compacted training forward equal the dense masked path while
    survivors fit the capacity; a too-small capacity raises the
    compact_overflow stat instead of failing silently."""
    cfg = _tiny_cfg()
    cfg.norm_th = 0.4  # random 8^3 grids: keep a healthy survivor set
    rng = np.random.RandomState(31)
    item = collate_rays(_item(rng, cfg), cfg.N_rand)
    batch = stack_batch([item])
    key = jax.random.PRNGKey(5)

    def run(frac):
        model = AniNeRF(
            num_train_frames=cfg.num_train_frame, norm_th=cfg.norm_th,
            train_keep_frac=frac,
        )
        trainer = Trainer(cfg, model)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        new_state, stats = trainer.train_step(state, batch, key)
        return state, new_state, stats

    s0_d, s1_d, st_d = run(0.0)
    s0_c, s1_c, st_c = run(0.9)  # capacity >= survivors

    # identical init (same seed/arch) is a precondition of the comparison
    for a, b in zip(jax.tree_util.tree_leaves(s0_d.params),
                    jax.tree_util.tree_leaves(s0_c.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    assert float(st_c.get("compact_overflow", 0.0)) == 0.0
    np.testing.assert_allclose(
        float(st_c["loss"]), float(st_d["loss"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(st_c["bw_loss"]), float(st_d["bw_loss"]), rtol=1e-5, atol=1e-6
    )
    # equal post-step params == equal gradients through Adam
    for a, b in zip(jax.tree_util.tree_leaves(s1_d.params),
                    jax.tree_util.tree_leaves(s1_c.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )

    # overflow detection: capacity below the survivor count must flag,
    # not crash (eval_capacity floors at 512 slots, so use enough points).
    # Force EVERY point in-shell (distance channel zeroed) so overflow at
    # 12.5% capacity is certain regardless of the synthetic scene's
    # survivor fraction.
    cfg.N_rand = 512  # 512 rays x 8 samples = 4096 pts
    item_of = _item(rng, cfg)
    item_of["pbw"] = np.asarray(item_of["pbw"])
    item_of["pbw"][..., 24] = 0.0
    item_big = collate_rays(item_of, cfg.N_rand)
    batch_big = stack_batch([item_big])
    model = AniNeRF(num_train_frames=cfg.num_train_frame,
                    norm_th=cfg.norm_th, train_keep_frac=0.125)
    trainer = Trainer(cfg, model)
    state = trainer.init_state(jax.random.PRNGKey(0), batch_big)
    _, st_tiny = trainer.train_step(state, batch_big, key)
    assert float(st_tiny["compact_overflow"]) == 1.0


@pytest.mark.parametrize("cls_name", ["NeRFPDF", "SDFPDF", "NeuSPDF"])
def test_pdf_train_compaction_matches_dense(cls_name):
    """PDF-family train_keep_frac: loss and gradients (via post-Adam
    params) equal the dense masked path when survivors fit capacity."""
    from animatable_nerf_tpu import models

    cls = getattr(models, cls_name)
    cfg = _tiny_cfg()
    cfg.N_rand = 16
    rng = np.random.RandomState(41)
    item = collate_rays(_item(rng, cfg), cfg.N_rand)
    batch = stack_batch([item])
    key = jax.random.PRNGKey(6)

    def run(frac):
        model = cls(num_latents=cfg.num_train_frame, train_keep_frac=frac)
        trainer = Trainer(cfg, model)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        new_state, stats = trainer.train_step(state, batch, key)
        return new_state, stats

    s1_d, st_d = run(0.0)
    s1_c, st_c = run(1.0)  # capacity >= all points >= survivors

    assert float(st_c.get("compact_overflow", 1.0)) == 0.0
    np.testing.assert_allclose(
        float(st_c["loss"]), float(st_d["loss"]), rtol=1e-5, atol=1e-6
    )
    for k in ("img_loss", "offset_loss"):
        np.testing.assert_allclose(
            float(st_c[k]), float(st_d[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
    if cls_name == "SDFPDF":
        for k in ("grad_loss", "ograd_loss", "mask_loss"):
            np.testing.assert_allclose(
                float(st_c[k]), float(st_d[k]), rtol=1e-5, atol=1e-6,
                err_msg=k,
            )
    for a, b in zip(jax.tree_util.tree_leaves(s1_d.params),
                    jax.tree_util.tree_leaves(s1_c.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-6
        )


@pytest.mark.parametrize("cls_name", ["NeRFPDF", "SDFPDF", "NeuSPDF",
                                      "AlignedLBW"])
def test_train_compaction_grid_pass1_matches_dense(cls_name):
    """With the per-frame packed distance grid in the batch (the frame
    store's pdist_res path), the train-time compacted pass 1 keeps a
    conservative superset and the exact filter is re-applied — loss and
    post-Adam params must still equal the dense masked path."""
    import functools

    from animatable_nerf_tpu import models
    from animatable_nerf_tpu.ops.knn_pallas import build_pdist_payload

    cls = getattr(models, cls_name)
    cfg = _tiny_cfg()
    cfg.N_rand = 16
    rng = np.random.RandomState(41)
    item = collate_rays(_item(rng, cfg), cfg.N_rand)
    packed, margin, bounds = jax.jit(
        functools.partial(build_pdist_payload, res=12)
    )(jnp.asarray(item["pvertices"]))
    gitem = {**item, "pdist_packed": np.asarray(packed),
             "pdist_margin": np.asarray(margin),
             "pdist_bounds": np.asarray(bounds)}
    key = jax.random.PRNGKey(6)

    def run(frac, it):
        kw = {"norm_th": 0.4} if cls_name == "AlignedLBW" else {}
        model = cls(num_latents=cfg.num_train_frame, train_keep_frac=frac,
                    **kw)
        trainer = Trainer(cfg, model)
        batch = stack_batch([it])
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        return trainer.train_step(state, batch, key)

    s1_d, st_d = run(0.0, item)
    s1_g, st_g = run(1.0, gitem)

    assert float(st_g.get("compact_overflow", 1.0)) == 0.0
    np.testing.assert_allclose(
        float(st_g["loss"]), float(st_d["loss"]), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(jax.tree_util.tree_leaves(s1_d.params),
                    jax.tree_util.tree_leaves(s1_g.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-6
        )


@pytest.mark.parametrize("cls_name", ["AlignedLBW", "AlignedSMPL",
                                      "AlignedLBWPDF"])
def test_aligned_train_compaction_matches_dense(cls_name):
    """Aligned-family train_keep_frac: loss and post-Adam params equal
    the dense masked path (covers the bw-consistency pair on the
    compacted stream and the alpha-derived selection mask)."""
    from animatable_nerf_tpu import models

    cls = getattr(models, cls_name)
    cfg = _tiny_cfg()
    cfg.N_rand = 16
    rng = np.random.RandomState(51)
    item = collate_rays(_item(rng, cfg), cfg.N_rand)
    batch = stack_batch([item])
    key = jax.random.PRNGKey(8)

    def run(frac):
        model = cls(num_latents=cfg.num_train_frame, norm_th=0.4,
                    train_keep_frac=frac)
        trainer = Trainer(cfg, model)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        new_state, stats = trainer.train_step(state, batch, key)
        return new_state, stats

    s1_d, st_d = run(0.0)
    s1_c, st_c = run(1.0)

    assert float(st_c.get("compact_overflow", 1.0)) == 0.0
    np.testing.assert_allclose(
        float(st_c["loss"]), float(st_d["loss"]), rtol=1e-5, atol=1e-6
    )
    if "bw_loss" in st_d:
        np.testing.assert_allclose(
            float(st_c["bw_loss"]), float(st_d["bw_loss"]),
            rtol=1e-5, atol=1e-6,
        )
    for a, b in zip(jax.tree_util.tree_leaves(s1_d.params),
                    jax.tree_util.tree_leaves(s1_c.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_shard_map_dp_matches_vmapped_step():
    """The explicit-SPMD shard_map DP step computes the same update as
    the vmapped auto-sharded step: same per-frame keys, pmean'd grads ==
    mean-loss grads; fused K-step variant matches too."""
    from animatable_nerf_tpu.parallel import make_mesh, shard_batch

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    cfg = _tiny_cfg()
    # healthy survivor set: with the realistic (true-distance) synthetic
    # frames, the default 5cm shell keeps ~no points of the coarse 8^3
    # test grids — a degenerate forced-argmin regime whose near-singular
    # gradients amplify vmap-vs-shard_map ULP differences far past any
    # reasonable tolerance
    cfg.norm_th = 0.3
    # SGD: Adam's normalized updates amplify the LSB differences between
    # pmean (tree reduction) and jnp.mean, hiding the real comparison
    cfg.train.optim = "sgd"
    rng = np.random.RandomState(61)
    model = AniNeRF(num_train_frames=cfg.num_train_frame)
    mesh = make_mesh(8)
    tr_v = Trainer(cfg, model)          # vmapped reference path
    tr_s = Trainer(cfg, model, mesh=mesh)
    items = [collate_rays(_item(rng, cfg), cfg.N_rand) for _ in range(16)]
    batch = stack_batch(items[:8])
    state = tr_v.init_state(jax.random.PRNGKey(0), stack_batch(items[:1]))
    key = jax.random.PRNGKey(4)

    s_v, st_v = tr_v.train_step(state, batch, key)
    s_s, st_s = tr_s.train_step(state, shard_batch(batch, mesh), key)
    assert tr_s._use_sharded(8)
    np.testing.assert_allclose(
        float(st_s["loss"]), float(st_v["loss"]), rtol=1e-5, atol=1e-6
    )
    assert int(s_s.step) == int(s_v.step) == 8
    for a, b in zip(jax.tree_util.tree_leaves(s_v.params),
                    jax.tree_util.tree_leaves(s_s.params)):
        np.testing.assert_allclose(
            # atol 1e-5: the dp pmean's reduction order differs from the
            # vmapped mean's; for near-zero scalar params with tiny
            # gradients Adam's rsqrt amplifies the few-ULP difference
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )

    # fused multi-step: (K=2, B=8) leaves
    batches = {
        k: np.stack([stack_batch(items[s * 8:(s + 1) * 8])[k]
                     for s in range(2)])
        for k in items[0]
    }
    mv, mv_stats = tr_v.train_steps(state, batches, key)
    ms, ms_stats = tr_s.train_steps(
        state, shard_batch(batches, mesh, leading_steps=True), key
    )
    np.testing.assert_allclose(
        np.asarray(ms_stats["loss"]), np.asarray(mv_stats["loss"]),
        rtol=1e-5, atol=1e-6,
    )
    for a, b in zip(jax.tree_util.tree_leaves(mv.params),
                    jax.tree_util.tree_leaves(ms.params)):
        np.testing.assert_allclose(
            # 16 sequential optimizer steps compound the pmean-vs-mean
            # reduction-order ULPs into ~1e-4 param drift (per-step
            # equality is pinned tightly above; a semantic error like
            # sum-vs-mean would diverge at the ~1e-3 update scale)
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


@pytest.mark.parametrize("cls_name", ["NeRFPDF", "SDFPDF"])
def test_train_stage2_shrinks_and_matches_dense(cls_name):
    """Train-time stage-2 compaction (models/pdf.py _train_stage2): at a
    scale where the stage-2 capacity REALLY shrinks below the widened
    pass-1 one, loss and post-Adam params must equal the dense masked
    path; a train_keep_frac below the exact survivor fraction must
    surface compact_overflow."""
    import functools

    from animatable_nerf_tpu import models
    from animatable_nerf_tpu.models.common import eval_capacity
    from animatable_nerf_tpu.ops.knn_pallas import build_pdist_payload
    from animatable_nerf_tpu.core import sample_blend_closest_points
    from animatable_nerf_tpu.core.sampling import (
        stratified_z_vals, z_vals_to_pts,
    )

    cls = getattr(models, cls_name)
    cfg = _tiny_cfg()
    cfg.N_rand = 2048
    rng = np.random.RandomState(47)
    item = collate_rays(_item(rng, cfg), cfg.N_rand)
    # aim the rays at vertices with a tight bracket so the exact
    # survivor density is body-like (~7%) — the random-direction rays
    # leave too few survivors to clear the 512-point capacity quantum
    verts = np.asarray(item["pvertices"])
    tgt = verts[rng.randint(0, len(verts), cfg.N_rand)]
    o = np.tile([[0, 0, -2.0]], (cfg.N_rand, 1)).astype(np.float32)
    d = tgt - o
    dist = np.linalg.norm(d, axis=-1, keepdims=True)
    item["ray_o"] = o
    item["ray_d"] = (d / dist).astype(np.float32)
    item["near"] = (dist[:, 0] - 0.3).astype(np.float32)
    item["far"] = (dist[:, 0] + 0.3).astype(np.float32)
    packed, margin, bounds = jax.jit(
        functools.partial(build_pdist_payload, res=12)
    )(jnp.asarray(item["pvertices"]))
    gitem = {**item, "pdist_packed": np.asarray(packed),
             "pdist_margin": np.asarray(margin),
             "pdist_bounds": np.asarray(bounds)}
    key = jax.random.PRNGKey(6)

    # exact survivor count on the deterministic training sample grid is
    # key-dependent (perturb), so bound it loosely with the unperturbed
    # grid and verify via the overflow flag instead of exact counts
    z = stratified_z_vals(
        jnp.asarray(item["near"]), jnp.asarray(item["far"]), cfg.N_samples
    )
    pts = np.asarray(
        z_vals_to_pts(jnp.asarray(item["ray_o"]), jnp.asarray(item["ray_d"]), z)
    ).reshape(-1, 3)
    _, pn = sample_blend_closest_points(
        jnp.asarray(pts), jnp.asarray(item["pvertices"]),
        jnp.asarray(item["weights"]),
    )
    n_exact = int((np.asarray(pn)[..., 0] < 0.1).sum())
    n_pts = cfg.N_rand * cfg.N_samples
    # frac whose stage-2 capacity fits the exact set with ~10% headroom
    # but sits BELOW the widened pass-1 capacity (a real shrink; the
    # aimed-ray scene is dense, so 2x headroom would cap out)
    frac = ((int(n_exact * 1.1) // 512 + 1) * 512) / n_pts
    cap_a = eval_capacity(n_pts, min(frac * 1.3, 1.0))
    cap_b = eval_capacity(n_pts, min(frac, 1.0))
    assert cap_b < cap_a, (
        f"no shrink at this scale (exact={n_exact}, capB={cap_b}, "
        f"capA={cap_a}) — grow N_rand"
    )

    def run(keep_frac, it, s2):
        model = cls(
            num_latents=cfg.num_train_frame, train_keep_frac=keep_frac,
            stage2_ratio=s2,
        )
        trainer = Trainer(cfg, model)
        batch = stack_batch([it])
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        return trainer.train_step(state, batch, key)

    s_d, st_d = run(0.0, item, 0.85)
    s_g, st_g = run(frac, gitem, 0.85)
    assert float(np.asarray(st_g.get("compact_overflow", 1.0)).max()) == 0.0
    np.testing.assert_allclose(
        float(st_g["loss"]), float(st_d["loss"]), rtol=1e-5, atol=1e-6
    )
    # the two paths reduce identical per-point grads in different
    # orders; Adam's m/sqrt(v) normalizer amplifies the f32 noise of a
    # near-zero gradient to O(lr) on ISOLATED params. Require near-total
    # elementwise agreement plus a small absolute bound everywhere — a
    # selection bug moves many params by a lot, not one by epsilon.
    for a, b in zip(jax.tree_util.tree_leaves(s_d.params),
                    jax.tree_util.tree_leaves(s_g.params)):
        a, b = np.asarray(a), np.asarray(b)
        close = np.isclose(a, b, rtol=2e-4, atol=1e-5)
        assert close.mean() > 0.9999, f"{1 - close.mean():.2e} mismatched"
        assert np.abs(a - b).max() < 5e-5

    # a keep_frac far below the exact fraction must overflow loudly
    tiny = max(n_exact // 2 // 512, 1) * 512 / n_pts
    if eval_capacity(n_pts, tiny) < n_exact:
        _s, st_t = run(tiny, gitem, 0.85)
        assert float(np.asarray(st_t["compact_overflow"]).max()) > 0.0

    # stage-2-ONLY overflow (ADVICE r3): exact capacity just below the
    # exact survivor count while the widened pass-1 capacity still holds
    # the conservative set — compact_overflow_stage2 fires, and the
    # trainer's disable_train_stage2 fallback recovers the exact widened
    # path (same loss as dense)
    from animatable_nerf_tpu.models.common import grid_pdist_keep

    n_cons = int(np.asarray(jnp.sum(grid_pdist_keep(
        jnp.asarray(pts),
        {k: jnp.asarray(gitem[k]) for k in
         ("pdist_packed", "pdist_margin", "pdist_bounds")},
        0.1,
    ))))
    frac2 = max((n_exact - 1) // 512 * 512, 512) / n_pts
    if (eval_capacity(n_pts, frac2) < n_exact
            and eval_capacity(n_pts, min(frac2 * 1.3, 1.0)) >= n_cons):
        model2 = cls(
            num_latents=cfg.num_train_frame, train_keep_frac=frac2,
            stage2_ratio=0.85,
        )
        tr2 = Trainer(cfg, model2)
        batch2 = stack_batch([gitem])
        state2 = tr2.init_state(jax.random.PRNGKey(0), batch2)
        _s2, st_s2 = tr2.train_step(state2, batch2, key)
        assert float(np.asarray(st_s2["compact_overflow_stage2"]).max()) > 0
        tr2.disable_train_stage2()
        assert float(tr2.model.stage2_ratio) == 0.0
        _s3, st_s3 = tr2.train_step(state2, batch2, key)
        assert float(np.asarray(st_s3["compact_overflow"]).max()) == 0.0
        np.testing.assert_allclose(
            float(st_s3["loss"]), float(st_d["loss"]), rtol=1e-5, atol=1e-6
        )
        tr2.disable_train_stage2()  # idempotent


def test_bf16_train_trajectory_tracks_f32():
    """Train-side bf16 trunks (compute_dtype bfloat16 reaching the
    model through make_model, VERDICT-r3 item 8): the loss TRAJECTORY
    must track the f32 one — bf16 rounds inside the trunks only (params,
    optimizer, geometry, compositing stay f32), so per-step losses drift
    by rounding, not by dynamics. The guard bounds the relative drift
    over 8 optimizer steps on the same batch stream; a wiring mistake
    (e.g. a head silently upcasting gradients into garbage) blows it up
    immediately."""
    import jax.numpy as jnp

    cfg = _tiny_cfg()
    rng = np.random.RandomState(0)
    items = [collate_rays(_item(rng, cfg), cfg.N_rand) for _ in range(4)]
    traj = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = AniNeRF(num_train_frames=cfg.num_train_frame, dtype=dtype)
        trainer = Trainer(cfg, model)
        state = trainer.init_state(
            jax.random.PRNGKey(0), stack_batch(items[:1])
        )
        losses = []
        for i in range(8):
            state, stats = trainer.train_step(
                state, stack_batch([items[i % len(items)]]),
                jax.random.PRNGKey(i),
            )
            losses.append(float(stats["loss"]))
        traj[name] = np.asarray(losses)
    rel = np.abs(traj["bf16"] - traj["f32"]) / np.maximum(
        np.abs(traj["f32"]), 1e-6
    )
    assert rel.max() < 0.05, (traj["f32"], traj["bf16"])
    # and the drift must be a real bf16 signal, not a dead code path
    # producing identical numbers through an f32-only route
    assert np.any(traj["bf16"] != traj["f32"])
