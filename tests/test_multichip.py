"""Multi-chip coverage beyond the AniNeRF-centric round-1 set
(VERDICT r1 item 4): sharded eval for every KNN family, the stage-2
animation step under shard_map, NeuS sharded, and uneven ray/frame
counts. All on the forced 8-device CPU mesh (conftest.py)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as ge

from animatable_nerf_tpu import models
from animatable_nerf_tpu.parallel import make_mesh, shard_batch
from animatable_nerf_tpu.parallel.eval_sharding import render_image_sharded
from animatable_nerf_tpu.render import RenderSettings
from animatable_nerf_tpu.render.renderer import render_image, pad_rays

N_RAYS = 173  # deliberately prime: uneven shard/tile coverage
S = 8


def _setup(model, n_rays=N_RAYS, grid=(8, 8, 8)):
    rng = np.random.RandomState(0)
    frame = {
        k: jnp.asarray(v)
        for k, v in ge._synthetic_frame(rng, grid_shape=grid).items()
    }
    rays = {k: jnp.asarray(v) for k, v in ge._rays(rng, n_rays).items()}
    z = jnp.ones((n_rays, S))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((*z.shape, 3)), rays["ray_d"], z,
        frame, train=False,
    )
    return frame, rays, params


def _assert_sharded_matches_single(model, settings=None):
    """render_image_sharded over 8 devices == single-device render_image
    on the same padded rays (rays are embarrassingly parallel)."""
    settings = settings or RenderSettings(
        n_samples=S, perturb=False, eval_tile=32
    )
    frame, rays, params = _setup(model)
    mesh = make_mesh(8)
    out_s, n_valid = render_image_sharded(
        model, params, rays, frame, settings, mesh
    )
    assert n_valid == N_RAYS
    padded, _ = pad_rays(rays, out_s["rgb_map"].shape[0])
    out_p = jax.jit(
        lambda p, r: render_image(model, p, r, frame, settings)
    )(params, padded)
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(
            np.asarray(out_s[k]), np.asarray(out_p[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )
    rgb = np.asarray(out_s["rgb_map"])[:n_valid]
    assert np.isfinite(rgb).all()


class TestShardedKNNFamilies:
    """The KNN-family renders dispatch through the Pallas-kernel/XLA-twin
    switch (ops/knn_pallas.py) — under shard_map on CPU the twin runs
    per device shard; output must equal the unsharded render."""

    def test_sdf_pdf_sharded_eval(self):
        _assert_sharded_matches_single(models.SDFPDF(num_latents=2))

    def test_nerf_pdf_sharded_eval(self):
        _assert_sharded_matches_single(models.NeRFPDF(num_latents=2))

    def test_neus_sharded_eval(self):
        _assert_sharded_matches_single(models.NeuSPDF(num_latents=2))

    def test_aligned_lbw_sharded_eval(self):
        _assert_sharded_matches_single(
            models.AlignedLBW(num_latents=2, norm_th=0.3)
        )


class TestShardedStage2:
    def test_animation_step_sharded_matches_vmapped(self):
        """The stage-2 (novel-pose bw) train step through the inherited
        shard_map DP path must equal the vmapped step bit-for-bit
        (same per-frame keys, mean grads over 'dp')."""
        from animatable_nerf_tpu.config import default_config
        from animatable_nerf_tpu.train.animation import AnimationTrainer
        from animatable_nerf_tpu.train.trainer import stack_batch, collate_rays

        cfg = default_config()
        cfg.N_rand = 32
        cfg.N_samples = S
        cfg.num_train_frame = 4
        cfg.num_eval_frame = 8
        cfg.n_anim_samples = 64
        cfg.aninerf_animation = True
        # SGD: Adam's normalized updates amplify the pmean-vs-mean
        # reduction-order ULPs (same rationale as
        # test_shard_map_dp_matches_vmapped_step)
        cfg.train.optim = "sgd"

        rng = np.random.RandomState(1)
        items = []
        for i in range(8):
            item = ge._synthetic_frame(rng, grid_shape=(8, 8, 8))
            item.update(ge._rays(rng, cfg.N_rand))
            item["bw_latent_index"] = np.asarray(i, np.int32)
            items.append(item)
        batch = stack_batch([collate_rays(dict(it), cfg.N_rand)
                             for it in items])
        # collate_rays drops frame-only keys; re-stack the full frames
        batch = stack_batch(items)

        model = models.AniNeRF(num_train_frames=cfg.num_train_frame,
                               num_eval_frames=cfg.num_eval_frame)
        mesh = make_mesh(8)
        t_sharded = AnimationTrainer(cfg, model, mesh=mesh)
        t_plain = AnimationTrainer(cfg, model)

        state_s = t_sharded.init_state(jax.random.PRNGKey(0), batch)
        state_p = t_plain.init_state(jax.random.PRNGKey(0), batch)
        key = jax.random.PRNGKey(7)
        sharded = shard_batch(batch, mesh)
        new_s, stats_s = t_sharded.train_step(state_s, sharded, key)
        assert t_sharded._use_sharded(8), "shard_map path not taken"
        new_p, stats_p = t_plain.train_step(state_p, batch, key)

        assert np.isfinite(float(stats_s["loss"]))
        np.testing.assert_allclose(
            float(stats_s["loss"]), float(stats_p["loss"]),
            rtol=1e-5, atol=1e-7,
        )
        # params after one masked-optimizer update agree
        leaves_s = jax.tree_util.tree_leaves(new_s.params)
        leaves_p = jax.tree_util.tree_leaves(new_p.params)
        for a, b in zip(leaves_s, leaves_p):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_animation_step_freezes_base_network(self):
        """Only novel_pose_bw moves through the sharded stage-2 step."""
        from animatable_nerf_tpu.config import default_config
        from animatable_nerf_tpu.train.animation import AnimationTrainer
        from animatable_nerf_tpu.train.trainer import stack_batch

        cfg = default_config()
        cfg.N_rand = 32
        cfg.N_samples = S
        cfg.num_train_frame = 2
        cfg.num_eval_frame = 8
        cfg.n_anim_samples = 64

        rng = np.random.RandomState(2)
        items = []
        for i in range(8):
            item = ge._synthetic_frame(rng, grid_shape=(8, 8, 8))
            item.update(ge._rays(rng, cfg.N_rand))
            item["bw_latent_index"] = np.asarray(i, np.int32)
            items.append(item)
        batch = stack_batch(items)
        model = models.AniNeRF(num_train_frames=cfg.num_train_frame,
                               num_eval_frames=cfg.num_eval_frame)
        mesh = make_mesh(8)
        tr = AnimationTrainer(cfg, model, mesh=mesh)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        new, _ = tr.train_step(
            state, shard_batch(batch, mesh), jax.random.PRNGKey(3)
        )
        p0, p1 = state.params["params"], new.params["params"]
        moved = np.max(np.abs(
            np.asarray(p1["novel_pose_bw"]["mlp"]["lin0"]["kernel"])
            - np.asarray(p0["novel_pose_bw"]["mlp"]["lin0"]["kernel"])
        ))
        frozen = np.max(np.abs(
            np.asarray(p1["tpose_human"]["lin0"]["kernel"])
            - np.asarray(p0["tpose_human"]["lin0"]["kernel"])
        ))
        assert moved > 0
        assert frozen == 0


class TestUnevenSharding:
    def test_six_frames_on_eight_devices_vmapped(self):
        """A frame count that does not divide the mesh must still train
        (falls back to the vmapped auto-sharded step; _use_sharded is
        False for B != dp)."""
        from animatable_nerf_tpu.config import default_config
        from animatable_nerf_tpu.train import Trainer
        from animatable_nerf_tpu.train.trainer import stack_batch

        cfg = default_config()
        cfg.N_rand = 32
        cfg.N_samples = S
        cfg.num_train_frame = 6

        rng = np.random.RandomState(3)
        items = []
        for i in range(6):
            item = ge._synthetic_frame(rng, grid_shape=(8, 8, 8))
            item.update(ge._rays(rng, cfg.N_rand))
            items.append(item)
        batch = stack_batch(items)
        model = models.AniNeRF(num_train_frames=cfg.num_train_frame)
        mesh = make_mesh(8)
        tr = Trainer(cfg, model, mesh=mesh)
        assert not tr._use_sharded(6)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        new, stats = tr.train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(stats["loss"]))

    def test_uneven_rays_over_tiles_and_devices(self):
        """A ray count that divides neither the tile nor the mesh: the
        pad/mask machinery must keep the valid prefix exact (SDF-PDF,
        the family with the most mask plumbing)."""
        model = models.SDFPDF(num_latents=2)
        settings = RenderSettings(n_samples=S, perturb=False, eval_tile=32)
        frame, rays, params = _setup(model, n_rays=407)
        mesh = make_mesh(8)
        out_s, n_valid = render_image_sharded(
            model, params, rays, frame, settings, mesh
        )
        assert n_valid == 407
        # single-device oracle on the same padded count
        padded, _ = pad_rays(rays, out_s["rgb_map"].shape[0])
        out_p = jax.jit(
            lambda p, r: render_image(model, p, r, frame, settings)
        )(params, padded)
        np.testing.assert_allclose(
            np.asarray(out_s["rgb_map"])[:407],
            np.asarray(out_p["rgb_map"])[:407],
            rtol=1e-5, atol=1e-6,
        )


class TestMultiHostSeams:
    """VERDICT-r2 item 8: the process-topology seams, tested WITHOUT a
    real multi-process launch by faking jax.process_index/process_count.
    Reference semantics: lib/datasets/samplers.py:75-131 (per-rank
    disjoint covering shards) and train_net.py:47-58 / recorder.py:42-43
    (rank-0-only checkpoint/record IO)."""

    def test_loader_shards_disjoint_and_cover(self):
        from animatable_nerf_tpu.data.loader import Loader

        class _DS:
            def __len__(self):
                return 23  # prime: uneven shards

        for n_shards in (2, 4, 8):
            shards = []
            for sid in range(n_shards):
                ld = Loader(_DS(), shuffle=True, max_iter=-1,
                            num_shards=n_shards, shard_id=sid)
                ld.set_epoch(3)
                shards.append(list(ld._indices()))
            flat = [i for s in shards for i in s]
            # disjoint AND covering
            assert len(flat) == len(set(flat)) == 23
            # epoch-seeded shuffle: same epoch -> same partition
            ld2 = Loader(_DS(), shuffle=True, max_iter=-1,
                         num_shards=n_shards, shard_id=0)
            ld2.set_epoch(3)
            assert list(ld2._indices()) == shards[0]
            # different epoch -> different permutation (same coverage)
            ld2.set_epoch(4)
            assert list(ld2._indices()) != shards[0]

    def test_loader_iteration_based_shards_stay_local(self):
        from animatable_nerf_tpu.data.loader import Loader

        class _DS:
            def __len__(self):
                return 10

        ld0 = Loader(_DS(), shuffle=False, max_iter=12, num_shards=2,
                     shard_id=0)
        ld1 = Loader(_DS(), shuffle=False, max_iter=12, num_shards=2,
                     shard_id=1)
        i0, i1 = set(ld0._indices()), set(ld1._indices())
        assert len(ld0._indices()) == len(ld1._indices()) == 12
        assert i0.isdisjoint(i1)

    @pytest.mark.parametrize("rank", [0, 1])
    def test_run_train_rank_gating(self, rank, tmp_path, monkeypatch):
        """Non-zero ranks must write NO checkpoints, records or results;
        rank 0 writes both (engine.py:961 is_main gating)."""
        from animatable_nerf_tpu import engine as eng
        from animatable_nerf_tpu.config import default_config
        from animatable_nerf_tpu.data import generate_synthetic_dataset

        droot = str(tmp_path / "human")
        generate_synthetic_dataset(droot, n_frames=2, n_views=2,
                                   image_size=48, n_verts=200, n_blobs=32)
        monkeypatch.setattr(jax, "process_index", lambda: rank)
        monkeypatch.setattr(jax, "process_count", lambda: 2)

        cfg = default_config()
        cfg.train_dataset.update(
            data_root=droot, human="synthetic",
            ann_file=os.path.join(droot, "annots.npy"),
        )
        cfg.test_dataset.update(
            data_root=droot, human="synthetic",
            ann_file=os.path.join(droot, "annots.npy"),
        )
        cfg.update(
            exp_name=f"seam_rank{rank}",
            network_module="aninerf",
            training_view=[0], test_view=[1],
            num_train_frame=2, num_eval_frame=1,
            N_rand=32, N_samples=4, ep_iter=2, eval_ep=1000000,
            save_ep=1, save_latest_ep=1, resume=False,
            trained_model_dir=str(tmp_path / "trained" / f"r{rank}"),
            record_dir=str(tmp_path / "record" / f"r{rank}"),
            result_dir=str(tmp_path / "result" / f"r{rank}"),
        )
        cfg["train"]["epoch"] = 1
        cfg["train"]["num_workers"] = 2
        eng.run_train(cfg)
        ckpts = (
            os.listdir(cfg.trained_model_dir)
            if os.path.isdir(cfg.trained_model_dir) else []
        )
        records = (
            os.listdir(cfg.record_dir)
            if os.path.isdir(cfg.record_dir) else []
        )
        if rank == 0:
            assert ckpts, "rank 0 must checkpoint"
            assert records, "rank 0 must record"
        else:
            assert not ckpts, f"rank 1 wrote checkpoints: {ckpts}"
            assert not records, f"rank 1 wrote records: {records}"

    def test_frame_store_covers_every_shards_frames(self, tmp_path):
        """The device-resident frame store must hold a slot for every
        frame ANY rank's loader can emit (the store is replicated; the
        loader shards items)."""
        from animatable_nerf_tpu.config import default_config
        from animatable_nerf_tpu.data import (
            TPoseDataset, generate_synthetic_dataset,
        )
        from animatable_nerf_tpu.data.loader import Loader
        from animatable_nerf_tpu.train.trainer import build_frame_store

        droot = str(tmp_path / "human")
        generate_synthetic_dataset(droot, n_frames=3, n_views=2,
                                   image_size=48, n_verts=200, n_blobs=32)
        cfg = default_config()
        cfg.train_dataset.update(
            data_root=droot, human="synthetic",
            ann_file=os.path.join(droot, "annots.npy"),
        )
        cfg.test_dataset.update(
            data_root=droot, human="synthetic",
            ann_file=os.path.join(droot, "annots.npy"),
        )
        cfg.update(training_view=[0, 1], num_train_frame=3, N_rand=16)
        ds = TPoseDataset(cfg, "train")
        store = build_frame_store(ds)
        assert store is not None
        for sid in range(2):
            ld = Loader(ds, shuffle=True, num_shards=2, shard_id=sid,
                        max_iter=-1)
            for idx in ld._indices():
                fid = ds.frame_index_of(ds.ims[idx])[1]
                assert fid in store["slot_of"], (sid, idx, fid)
