"""End-to-end run_visualize flows (run.py:73-102): novel-view spiral,
pose sequence, and posed-mesh extraction through the real config
overlays, datasets, renderers and writers."""

import os

import numpy as np
import pytest

from animatable_nerf_tpu import engine
from animatable_nerf_tpu.config import load_config
from animatable_nerf_tpu.data import generate_synthetic_dataset

CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "configs", "synthetic.yaml")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A tiny trained checkpoint + the option list that locates it."""
    root = str(tmp_path_factory.mktemp("synth_vis") / "human")
    generate_synthetic_dataset(root, n_frames=2, n_views=2, image_size=48,
                               n_verts=300, n_blobs=64)
    base = tmp_path_factory.mktemp("vis_out")
    opts = [
        "train_dataset.data_root", root,
        "train_dataset.ann_file", os.path.join(root, "annots.npy"),
        "test_dataset.data_root", root,
        "test_dataset.ann_file", os.path.join(root, "annots.npy"),
        "training_view", "[0]", "test_view", "[1]",
        "num_train_frame", "2",
        "H", "48", "W", "48", "N_rand", "64", "N_samples", "8",
        "ep_iter", "2", "log_interval", "100",
        "exp_name", "visflow",
        "record_dir", str(base / "rec"),
        "trained_model_dir", str(base / "model"),
        "result_dir", str(base / "res"),
        "resume", "False", "fix_random", "True",
    ]
    cfg = load_config(CFG, opts=list(opts))
    engine.run_train(cfg, epochs=1)
    return opts, base


def test_visualize_novel_view(trained, tmp_path, monkeypatch):
    opts, _ = trained
    cfg = load_config(CFG, opts=list(opts) + ["vis_novel_view", "True"])
    assert "novel_view" in cfg.test_dataset_module
    monkeypatch.chdir(tmp_path)  # writers use reference-relative dirs
    engine.run_visualize(cfg, max_items=1)
    out = tmp_path / "data" / "novel_view" / "visflow"
    pngs = [p for p in out.rglob("*.png")]
    assert pngs, "no novel-view frame written"


def test_visualize_pose_sequence(trained, tmp_path, monkeypatch):
    opts, _ = trained
    cfg = load_config(CFG, opts=list(opts) + ["vis_pose_sequence", "True"])
    assert "pose_sequence" in cfg.test_dataset_module
    monkeypatch.chdir(tmp_path)
    engine.run_visualize(cfg, max_items=1)
    out = tmp_path / "data" / "perform" / "visflow"
    pngs = [p for p in out.rglob("*.png")]
    assert pngs, "no pose-sequence frame written"


def test_visualize_posed_mesh(trained, tmp_path, monkeypatch):
    opts, _ = trained
    cfg = load_config(
        CFG, opts=list(opts) + ["vis_posed_mesh", "True",
                                "voxel_size", "[0.05, 0.05, 0.05]",
                                "mesh_th", "0.5"]
    )
    assert "mesh" in cfg.test_dataset_module
    monkeypatch.chdir(tmp_path)
    results = engine.run_visualize(cfg, max_items=1)
    assert isinstance(results, list) and len(results) == 1
    out = tmp_path / "data" / "animation" / "visflow"
    meshes = [p for p in out.rglob("*.ply")] + [p for p in out.rglob("*.npy")]
    assert meshes, "no mesh artifact written"

def test_animation_density_per_frame(trained, tmp_path, monkeypatch):
    """run_animation (run.py --type animation): density families extract
    per frame; one PLY per test frame lands in data/animation/<exp>."""
    opts, _ = trained
    cfg = load_config(
        CFG, opts=list(opts) + ["vis_posed_mesh", "True",
                                "voxel_size", "[0.05, 0.05, 0.05]",
                                "mesh_th", "0.5",
                                "test.frame_sampler_interval", "1"]
    )
    monkeypatch.chdir(tmp_path)
    counts = engine.run_animation(cfg, max_items=2)
    assert len(counts) == 2
    out = tmp_path / "data" / "animation" / "visflow"
    plys = sorted(out.rglob("*.ply"))
    assert len(plys) >= 2, "one mesh frame per test frame expected"


def test_animation_sdf_shared_topology(trained, tmp_path, monkeypatch):
    """SDF families extract the canonical mesh once and re-pose per
    frame: every animation frame shares the same vertex count."""
    import jax

    opts, _ = trained
    cfg = load_config(
        CFG, opts=list(opts) + [
            "vis_posed_mesh", "True",
            "network_module", "sdf_pdf",
            "test_dataset_module", "lib.datasets.anisdf_mesh_dataset",
            "voxel_size", "[0.05, 0.05, 0.05]",
            "test.frame_sampler_interval", "1",
            "exp_name", "animsdf",
        ]
    )
    monkeypatch.chdir(tmp_path)
    eng = engine.Engine(cfg)
    ds = engine.make_dataset(cfg, "test")
    # geometric (sphere) init: the untrained SDF already carries a
    # non-trivial zero level set, so no training is needed here
    params = eng.init_params(jax.random.PRNGKey(0), ds)
    counts = engine.run_animation(cfg, params=params, max_items=2)
    assert len(counts) == 2
    assert counts[0] == counts[1], "canonical topology must be shared"
    out = tmp_path / "data" / "animation" / "animsdf"
    plys = sorted(out.rglob("*.ply"))
    assert len(plys) >= 2


def test_sdf_repose_chunked_vertex_eval(trained, tmp_path, monkeypatch):
    """The flat-row-count miscompile guard (RenderSettings.
    dense_chunk_rows) also covers the SDF mesh repose path: per-vertex
    field programs run in fixed-size chunks, and the chunked evaluation
    must match the flat call."""
    import jax

    opts, _ = trained
    base = list(opts) + [
        "vis_posed_mesh", "True",
        "network_module", "sdf_pdf",
        "test_dataset_module", "lib.datasets.anisdf_mesh_dataset",
        "voxel_size", "[0.05, 0.05, 0.05]",
        "exp_name", "reposechunk",
    ]
    cfg = load_config(CFG, opts=base + ["dense_chunk_rows", "37"])
    eng = engine.Engine(cfg)
    ds = engine.make_dataset(cfg, "test")
    params = eng.init_params(jax.random.PRNGKey(0), ds)
    item = ds[0]
    verts, _ = eng.canonical_sdf_mesh(params, item)
    assert len(verts) > 37, "need multiple chunks to exercise the guard"
    posed_chunked = eng.repose_canonical_mesh(params, verts, item)

    eng_flat = engine.Engine(load_config(CFG, opts=base + ["dense_chunk_rows", "0"]))
    posed_flat = eng_flat.repose_canonical_mesh(params, verts, item)
    np.testing.assert_allclose(posed_chunked, posed_flat, atol=1e-6)


def test_raster_flow(trained, tmp_path, monkeypatch):
    """run_raster (run.py --type raster): posed meshes rasterized into a
    training-view camera via the native z-buffer; PNG + depth per frame."""
    pytest.importorskip("cv2")
    from animatable_nerf_tpu.native import mesh_native

    if mesh_native() is None:
        pytest.skip("native mesh library unavailable")
    opts, _ = trained
    cfg = load_config(
        CFG, opts=list(opts) + ["vis_posed_mesh", "True",
                                "voxel_size", "[0.05, 0.05, 0.05]",
                                "mesh_th", "0.5",
                                "test.frame_sampler_interval", "1"]
    )
    monkeypatch.chdir(tmp_path)
    frames = engine.run_raster(cfg, max_items=2)
    assert len(frames) == 2
    out = tmp_path / "data" / "raster" / "visflow"
    pngs = sorted(out.rglob("*.png"))
    depths = sorted(out.rglob("*_depth.npy"))
    assert len(pngs) == 2 and len(depths) == 2
    img = np.asarray(__import__("cv2").imread(str(pngs[0])))
    assert img.max() > 0, "rasterized preview is empty"
    d = np.load(depths[0])
    assert (d > 0).any(), "depth buffer is empty"
