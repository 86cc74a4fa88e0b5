"""Data-layer tests: synthetic generator -> dataset loaders -> collation."""

import os

import numpy as np
import pytest

from animatable_nerf_tpu.config import default_config
from animatable_nerf_tpu.data import (
    TPoseDataset,
    TPosePDFDataset,
    generate_synthetic_dataset,
    Loader,
    FrameSampler,
)
from animatable_nerf_tpu.data.utils import pad_volume_to
from animatable_nerf_tpu.train.trainer import collate_rays, stack_batch


@pytest.fixture(scope="module")
def droot(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth") / "human")
    generate_synthetic_dataset(root, n_frames=3, n_views=3, image_size=64,
                               n_verts=400, n_blobs=64)
    return root


def make_cfg(droot, **kw):
    cfg = default_config()
    cfg.train_dataset.update(data_root=droot, human="synth", ann_file=os.path.join(droot, "annots.npy"))
    cfg.test_dataset.update(data_root=droot, human="synth", ann_file=os.path.join(droot, "annots.npy"))
    cfg.training_view = [0, 1]
    cfg.num_train_frame = 3
    cfg.N_rand = 128
    cfg.ratio = 1.0
    cfg.merge_from_list([k for pair in kw.items() for k in (pair[0], repr(pair[1]))]) if False else None
    for k, v in kw.items():
        cfg[k] = v
    return cfg


def test_generator_layout(droot):
    for p in [
        "annots.npy", "lbs/joints.npy", "lbs/parents.npy", "lbs/weights.npy",
        "lbs/tvertices.npy", "lbs/tbw.npy", "lbs/bweights/0.npy",
        "lbs/bigpose_vertices.npy", "params/0.npy", "vertices/0.npy",
        "Camera_B0/0000.jpg", "mask_cihp/Camera_B0/0000.png",
    ]:
        assert os.path.exists(os.path.join(droot, p)), p


def test_tpose_dataset_train_item(droot):
    cfg = make_cfg(droot)
    ds = TPoseDataset(cfg, "train")
    assert len(ds) == 6  # 3 frames x 2 views
    item = ds[0]
    assert item["ray_o"].shape[0] >= cfg.N_rand
    assert item["pbw"].shape == (*ds.max_pbw_shape, 25)
    assert item["A"].shape == (24, 4, 4)
    assert item["rgb"].dtype == np.float32
    # rays hit the box by construction
    assert item["near"].shape == item["far"].shape
    assert (item["far"] >= item["near"]).all()


def test_tpose_dataset_test_item(droot):
    cfg = make_cfg(droot)
    ds = TPoseDataset(cfg, "test")
    item = ds[0]
    # test split: all rays in box, mask_at_box is the full-image mask
    assert item["mask_at_box"].shape[0] == item["H"] * item["W"]
    assert item["ray_o"].shape[0] == item["mask_at_box"].sum()


def test_pdf_dataset_item(droot):
    cfg = make_cfg(droot, use_bigpose=True)
    ds = TPosePDFDataset(cfg, "train")
    item = ds[0]
    assert item["weights"].shape[1] == 24
    assert item["pvertices"].shape == item["weights"].shape[:1] + (3,)
    assert item["poses"].shape == (72,)


def test_pad_volume_preserves_sampling(droot):
    import jax.numpy as jnp

    from animatable_nerf_tpu.core import pts_sample_blend_weights

    rng = np.random.RandomState(0)
    vol = rng.rand(9, 7, 8, 25).astype(np.float32)
    bounds = np.array([[0, 0, 0], [1.0, 2.0, 1.5]], np.float32)
    vol2, bounds2 = pad_volume_to(vol, bounds, (12, 9, 11))
    pts = rng.uniform(-0.2, 2.2, (50, 3)).astype(np.float32)
    a = pts_sample_blend_weights(jnp.asarray(pts), jnp.asarray(vol), jnp.asarray(bounds))
    b = pts_sample_blend_weights(jnp.asarray(pts), jnp.asarray(vol2), jnp.asarray(bounds2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_collate_and_stack(droot):
    cfg = make_cfg(droot)
    ds = TPoseDataset(cfg, "train")
    items = [collate_rays(ds[i], cfg.N_rand) for i in range(2)]
    batch = stack_batch(items)
    assert batch["ray_o"].shape == (2, cfg.N_rand, 3)
    assert batch["pbw"].shape[0] == 2
    assert batch["mask"].dtype == bool


def test_loader_iteration_and_sharding(droot):
    cfg = make_cfg(droot)
    ds = TPoseDataset(cfg, "train")
    loader = Loader(ds, shuffle=True, max_iter=5)
    items = list(loader)
    assert len(items) == 5
    # shards partition the index set
    l0 = Loader(ds, shuffle=False, num_shards=2, shard_id=0)
    l1 = Loader(ds, shuffle=False, num_shards=2, shard_id=1)
    assert len(l0) + len(l1) == len(ds)


def test_frame_sampler(droot):
    cfg = make_cfg(droot)
    ds = TPoseDataset(cfg, "test")
    fs = FrameSampler(ds, interval=2)
    inds = list(fs)
    assert len(inds) == 2 * ds.num_cams  # frames 0 and 2


def test_loader_deterministic_order(droot):
    cfg = make_cfg(droot)
    ds = TPoseDataset(cfg, "train")
    l1 = Loader(ds, shuffle=True, seed=7, max_iter=4)
    l2 = Loader(ds, shuffle=True, seed=7, max_iter=4)
    a = [it["frame_index"] for it in l1]
    b = [it["frame_index"] for it in l2]
    assert a == b


def test_engine_device_frame_cache(droot):
    """Consecutive eval views of one frame reuse the on-device frame
    payload (engine.py Engine._device_frame) instead of re-uploading
    the bw volumes per item."""
    from animatable_nerf_tpu.engine import Engine, make_dataset

    cfg = make_cfg(droot, N_samples=4, training_view=[0])
    eng = Engine(cfg)
    ds = make_dataset(cfg, "test")
    a, b, c = ds[0], ds[1], ds[2]
    assert a["frame_index"] == b["frame_index"]
    assert a["cam_ind"] != b["cam_ind"]
    fa = eng._device_frame(a)
    fb = eng._device_frame(b)
    assert fa is fb  # cache hit: same device dict, no re-upload
    assert c["frame_index"] != b["frame_index"]
    fc = eng._device_frame(c)
    assert fc is not fb  # new frame refreshes the cache
    np.testing.assert_allclose(np.asarray(fc["A"]), np.asarray(c["A"]))


@pytest.mark.parametrize("cls", [TPoseDataset, TPosePDFDataset])
def test_frame_meta_matches_item_and_preserves_rng(droot, cls):
    """frame_meta returns the same per-frame metadata as __getitem__
    WITHOUT consuming the ray-sampling RNG (build_frame_store must not
    perturb fix_random trajectories)."""
    from animatable_nerf_tpu.train.trainer import FRAME_STORE_KEYS

    kw = {"use_bigpose": True} if cls is TPosePDFDataset else {}
    cfg = make_cfg(droot, **kw)
    ds = cls(cfg, "train")
    ds._rng = np.random.RandomState(123)
    state_before = ds._rng.get_state()
    meta = ds.frame_meta(2)
    state_after = ds._rng.get_state()
    assert str(state_before[1].tolist()) == str(state_after[1].tolist())

    item = ds[2]  # consumes RNG; metadata itself is deterministic
    assert meta["frame_index"] == item["frame_index"]
    for k in FRAME_STORE_KEYS:
        if k in item:
            assert k in meta, k
            np.testing.assert_array_equal(
                np.asarray(meta[k]), np.asarray(item[k]), err_msg=k
            )


def test_build_frame_store_uses_frame_meta(droot):
    """The store built from frame_meta == the store from full items, and
    the dataset RNG chain is untouched by store construction."""
    from animatable_nerf_tpu.train.trainer import build_frame_store

    cfg = make_cfg(droot)
    ds = TPoseDataset(cfg, "train")
    ds._rng = np.random.RandomState(0)
    ref_ray_o = ds[0]["ray_o"]  # RNG draw #1 on a fresh chain

    ds._rng = np.random.RandomState(0)
    store = build_frame_store(ds)
    assert store is not None and len(store["slot_of"]) == 3
    got_ray_o = ds[0]["ray_o"]  # still draw #1 if the store was RNG-free
    np.testing.assert_array_equal(got_ray_o, ref_ray_o)

    # equality with a store built through the full-item path
    class _NoMeta:
        def __init__(self, ds):
            self._ds = ds
            self.num_cams = ds.num_cams

        def __len__(self):
            return len(self._ds)

        def __getitem__(self, i):
            return self._ds[i]

    store_full = build_frame_store(_NoMeta(ds))
    for group in ("static", "per_frame"):
        assert store[group].keys() == store_full[group].keys()
        for k in store[group]:
            np.testing.assert_array_equal(
                np.asarray(store[group][k]), np.asarray(store_full[group][k]),
                err_msg=k,
            )


def test_engine_capacity_ladder_and_interleave(droot):
    """Engine.render_item's adaptive eval-capacity ladder: the laddered
    render equals the dense rung exactly even when the starting rung
    overflows (escalation, no silent sample drops), the interleave
    permutation round-trips, and the measured survivor count steers the
    next frame onto a compacted rung below the config capacity."""
    import jax
    from animatable_nerf_tpu.engine import (
        Engine, make_dataset, eval_rays, interleave_rays,
    )

    cfg = make_cfg(droot, N_samples=8, training_view=[0])
    cfg.norm_th = 0.25          # synthetic blobs' filter shell
    cfg.eval_keep_frac = 0.02   # every compacted rung overflows
    eng = Engine(cfg)
    assert eng._ladder[-1] == 0.0 and len(eng._ladder) >= 2

    ds = make_dataset(cfg, "test")
    item = ds[0]
    params = eng.init_params(jax.random.PRNGKey(0), dataset=ds)

    rays, _ = eval_rays(item, eng.settings.eval_tile)
    permuted, inv = interleave_rays(rays, eng.settings.eval_tile)
    if inv is not None:
        np.testing.assert_array_equal(
            np.asarray(permuted["near"])[inv], np.asarray(rays["near"])
        )

    out, n_valid = eng.render_item(params, item)
    frame = eng._device_frame(item)
    dense = eng._eval_program(0.0, False)(params, rays, frame)
    np.testing.assert_allclose(
        out["rgb_map"], np.asarray(dense["rgb_map"])[:n_valid],
        rtol=1e-5, atol=2e-5,
    )

    # generous capacity: the measured count picks a compacted rung
    # BELOW the configured one for the next frame
    cfg2 = make_cfg(droot, N_samples=8, training_view=[0])
    cfg2.norm_th = 0.25
    cfg2.eval_keep_frac = 0.9
    eng2 = Engine(cfg2)
    out2, n_valid2 = eng2.render_item(params, item)
    assert eng2._eval_level < len(eng2._ladder) - 1  # not the dense rung
    np.testing.assert_allclose(
        out2["rgb_map"], out["rgb_map"], rtol=1e-5, atol=2e-5
    )


def test_engine_sharded_ladder(droot):
    """The sharded eval path runs the same adaptive capacity ladder as
    the single-chip path (cached jitted shard_map programs per rung) and
    matches the unsharded dense rung; frames smaller than one tile per
    device fall back to the single-chip path."""
    import jax
    from animatable_nerf_tpu.engine import Engine, make_dataset, eval_rays

    cfg = make_cfg(droot, N_samples=8, training_view=[0])
    cfg.norm_th = 0.25
    cfg.eval_keep_frac = 0.9
    cfg.eval_tile = 128  # 8 devices x 128 = 1024 <= the 4096-ray frame
    eng = Engine(cfg)
    assert eng._mesh is not None
    ds = make_dataset(cfg, "test")
    item = ds[0]
    params = eng.init_params(jax.random.PRNGKey(0), dataset=ds)

    out, n_valid = eng.render_item(params, item)
    # the ladder measured a count and settled on a compacted rung
    assert eng._eval_level < len(eng._ladder) - 1

    frame = eng._device_frame(item)
    rays, _ = eval_rays(item, cfg.eval_tile)
    dense = eng._eval_program(0.0, False)(params, rays, frame)
    np.testing.assert_allclose(
        out["rgb_map"], np.asarray(dense["rgb_map"])[:n_valid],
        rtol=1e-5, atol=2e-5,
    )

    # a frame smaller than tile * n_dev takes the unsharded path
    cfg2 = make_cfg(droot, N_samples=8, training_view=[0])
    cfg2.norm_th = 0.25
    cfg2.eval_keep_frac = 0.9
    eng2 = Engine(cfg2)  # default eval_tile 8192 >> 4096-ray frame
    out2, n2 = eng2.render_item(params, item)
    assert not any(
        isinstance(k, tuple) and k[-1] == "sharded" for k in eng2._eval_jits
    )
    np.testing.assert_allclose(
        out2["rgb_map"], out["rgb_map"][: len(out2["rgb_map"])],
        rtol=1e-5, atol=2e-5,
    )


def test_engine_pdf_grid_pass1_render(droot):
    """KNN-family engines attach the per-frame packed distance grid
    (knn_grid_res, engine._device_frame) and the grid-accelerated
    compacted render equals the dense rung; the grid payload is cached
    across views of the frame."""
    import jax
    from animatable_nerf_tpu.engine import Engine, make_dataset, eval_rays

    cfg = make_cfg(droot, N_samples=8, training_view=[0],
                   use_bigpose=True, eval_keep_frac=0.9)
    cfg.num_latent_code = 3  # make_cfg bypasses the -1 resolver
    cfg.network_module = "nerf_pdf"
    cfg.train_dataset_module = "tpose_pdf"
    cfg.test_dataset_module = "tpose_pdf"
    eng = Engine(cfg)
    assert eng._pdist_jit is not None
    ds = make_dataset(cfg, "test")
    item = ds[0]
    params = eng.init_params(jax.random.PRNGKey(0), dataset=ds)

    out, n_valid = eng.render_item(params, item)
    frame = eng._device_frame(item)
    assert "pdist_packed" in frame and "pdist_bounds" in frame

    rays, _ = eval_rays(item, eng.settings.eval_tile)
    dense = eng._eval_program(0.0, False)(params, rays, frame)
    np.testing.assert_allclose(
        out["rgb_map"], np.asarray(dense["rgb_map"])[:n_valid],
        rtol=1e-5, atol=2e-5,
    )

    # aninerf (grid-family) engines must NOT build the payload
    cfg2 = make_cfg(droot, N_samples=8, training_view=[0])
    assert Engine(cfg2)._pdist_jit is None


def test_image_size_batch_sampler():
    """Ported-for-parity ImageSizeBatchSampler (samplers.py:10-47):
    per-batch shared (h, w), divisor-32 round-up, origin strategy."""
    from animatable_nerf_tpu.data.loader import ImageSizeBatchSampler

    s = ImageSizeBatchSampler(range(7), batch_size=3, drop_last=False,
                              min_hw=(100, 100), max_hw=(200, 300), seed=0)
    batches = list(s)
    assert len(batches) == len(s) == 3
    assert [len(b) for b in batches] == [3, 3, 1]
    for b in batches:
        hws = {(h, w) for _, h, w in b}
        assert len(hws) == 1          # shared size within a batch
        (h, w), = hws
        assert h % 32 == 0 and w % 32 == 0
        assert 100 <= h <= 224 and 100 <= w <= 320
    assert [i for b in batches for i, _, _ in b] == list(range(7))

    s2 = ImageSizeBatchSampler(range(7), batch_size=3, drop_last=True,
                               strategy="origin")
    batches2 = list(s2)
    assert len(batches2) == len(s2) == 2
    assert all(h == -1 and w == -1 for b in batches2 for _, h, w in b)


def test_mesh_dataset_frame_sampler(droot):
    """Mesh datasets expose one item per frame and pin num_cams=1 (the
    reference's reset at aninerf_mesh_dataset.py:45), so FrameSampler's
    len(dataset)//num_cams stride visits every frame instead of
    collapsing the 3-frame set to n_frames=1."""
    from animatable_nerf_tpu.data.mesh_dataset import MeshDataset

    cfg = make_cfg(droot)
    ds = MeshDataset(cfg, "test")
    assert len(ds) == 3 and ds.num_cams == 1
    fs = FrameSampler(ds, interval=1)
    assert list(fs) == [0, 1, 2]
    item = ds[1]
    assert item["pts"].ndim == 4 and item["pts"].shape[-1] == 3


def test_write_gt_meshes(droot):
    """write_gt_meshes replays the generator RNG, writes OBJ GT meshes at
    the density isosurface, and rejects mismatched replay params."""
    from animatable_nerf_tpu.data.synthetic import (
        blob_density_np, write_gt_meshes, _make_vertices,
        REST_JOINTS, SMPL_PARENTS,
    )
    from animatable_nerf_tpu.evaluators.mesh import load_obj

    paths = write_gt_meshes(droot, n_verts=400, n_blobs=64, voxel=0.03,
                            frames=[0, 1])
    assert len(paths) == 2
    verts, faces = load_obj(paths[0])
    assert len(verts) > 100 and len(faces) > 100

    # vertices sit on the analytic isosurface (MC interpolation tol)
    rng = np.random.RandomState(0)
    tverts, _ = _make_vertices(REST_JOINTS.copy(), SMPL_PARENTS, 400, rng)
    blob_idx = rng.choice(400, size=64, replace=False)
    wverts = np.load(os.path.join(droot, "vertices", "0.npy"))
    dens = blob_density_np(verts, wverts[blob_idx].astype(np.float32))
    # density varies steeply across a cell; check the median is near the
    # level and the bulk is within one cell's worth of field change
    assert np.median(np.abs(dens - 5.0)) < 2.5

    with pytest.raises(ValueError):
        write_gt_meshes(droot, n_verts=300, n_blobs=64, frames=[0])


def test_mesh_evaluator_end_to_end_gt(droot, tmp_path):
    """MeshEvaluator picks up object/{frame:06d}.obj and reports ~zero
    chamfer/P2S for the GT mesh itself (mesh_evaluator.py protocol)."""
    from animatable_nerf_tpu.data.synthetic import write_gt_meshes
    from animatable_nerf_tpu.evaluators.mesh import MeshEvaluator, load_obj

    write_gt_meshes(droot, n_verts=400, n_blobs=64, voxel=0.03, frames=[1])
    ev = MeshEvaluator(str(tmp_path), data_root=droot, human="synth")
    v, f = load_obj(os.path.join(droot, "object", "000001.obj"))
    out = ev.evaluate(v, f, 1, rng=np.random.RandomState(0))
    res = ev.summarize()
    assert res["chamfer"] < 1e-3 and res["p2s"] < 1e-3


def test_pick_level_respects_stage2_capacity(droot):
    """Rung steering with the exact survivor count (ADVICE r3): when the
    model runs a stage-2 re-compaction, a rung must hold the exact count
    in stage2_capacity(cap) too — frames with exact/conservative keep >
    stage2_ratio otherwise escalate on overflow before settling."""
    import types

    from animatable_nerf_tpu.engine import Engine
    from animatable_nerf_tpu.models.common import (
        eval_capacity, stage2_capacity,
    )

    cfg = make_cfg(droot, N_samples=8, training_view=[0])
    eng = Engine(cfg)
    pts_per_tile = eng.settings.eval_tile * eng.settings.n_samples
    fracs = eng._ladder[:-1]
    assert len(fracs) >= 2

    # a conservative count that fits rung 0 exactly
    cap0 = eval_capacity(pts_per_tile, fracs[0])
    cons = int(cap0 / 1.15) - 2
    base = eng._pick_level(cons, len(eng._ladder) - 1)
    assert base == 0

    # no stage-2 on this model: the exact count is ignored
    assert eng._pick_level(cons, 0, worst_exact=cons) == 0

    # stage-2 model: an exact count above stage2_capacity(cap0) but
    # inside rung 1's stage-2 capacity forces rung 1
    eng.model = types.SimpleNamespace(stage2_ratio=0.85)
    s2cap0 = stage2_capacity(cap0, 0.85)
    exact = int(s2cap0 / 1.15) + 8
    assert int(exact * 1.15) + 1 > s2cap0  # really exceeds rung 0
    lvl = eng._pick_level(cons, len(eng._ladder) - 1, worst_exact=exact)
    assert lvl >= 1
    cap_l = eval_capacity(pts_per_tile, fracs[lvl])
    assert stage2_capacity(cap_l, 0.85) >= int(exact * 1.15) + 1

    # small exact count: rung 0 still wins
    assert eng._pick_level(cons, 0, worst_exact=cons // 2) == 0


def test_transforms_port_matches_reference_semantics():
    """data/transforms.py vs lib/datasets/transforms.py run in place:
    same composition (uint8/255 then ImageNet normalize), kpts ride
    along unchanged."""
    import ref_oracle

    ref_oracle.install()
    ref_mod = ref_oracle.load("lib.datasets.transforms")
    from animatable_nerf_tpu.data.transforms import make_transforms

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (8, 6, 3)).astype(np.float64)
    kpts = rng.rand(5, 2)
    ref_t = ref_mod.make_transforms(None, is_train=True)
    ours_t = make_transforms(None, is_train=True)
    ref_img, ref_kpts = ref_t(img.copy(), kpts)
    our_img, our_kpts = ours_t(img.copy(), kpts)
    np.testing.assert_allclose(our_img, ref_img, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(our_kpts, ref_kpts)
    # no-kpts call returns the bare image like the reference's
    assert isinstance(ours_t(img.copy()), np.ndarray)
