"""The two bench-style run types (run.py --type dataset / network,
reference run.py:4-11 and :14-38): loader iteration smoke and the
forward-latency harness, end-to-end through the engine."""

import os

import pytest

from animatable_nerf_tpu import engine
from animatable_nerf_tpu.config import load_config
from animatable_nerf_tpu.data import generate_synthetic_dataset

CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "configs", "synthetic.yaml")


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_run") / "human")
    generate_synthetic_dataset(root, n_frames=2, n_views=2, image_size=32,
                               n_verts=200, n_blobs=32)
    base = tmp_path_factory.mktemp("run_out")
    opts = [
        "train_dataset.data_root", root,
        "train_dataset.ann_file", os.path.join(root, "annots.npy"),
        "test_dataset.data_root", root,
        "test_dataset.ann_file", os.path.join(root, "annots.npy"),
        "training_view", "[0]", "test_view", "[1]",
        "num_train_frame", "2",
        "H", "32", "W", "32", "N_rand", "32", "N_samples", "8",
        "eval_tile", "256",
        "test.frame_sampler_interval", "1",
        "ep_iter", "2", "log_interval", "100",
        "exp_name", "runtypes",
        "record_dir", str(base / "rec"),
        "trained_model_dir", str(base / "model"),
        "result_dir", str(base / "res"),
        "resume", "False",
    ]
    cfg = load_config(CFG, opts=list(opts))
    # run_network loads a trained checkpoint (reference run.py:17-20
    # load_network) — train a tiny one first
    engine.run_train(cfg, epochs=1)
    return cfg


def test_run_dataset_iterates(cfg):
    n = engine.run_dataset(cfg, max_items=4)
    assert n == 4


def test_run_network_times_forward(cfg, capsys):
    mean = engine.run_network(cfg, n_iters=2)
    assert mean > 0.0
    assert "mean forward" in capsys.readouterr().out


def test_run_network_profile_trace(cfg, tmp_path):
    """profile_dir captures a jax.profiler trace alongside the timing
    (SURVEY §5: the reference has wall-clock only)."""
    c = cfg.clone()
    c.profile_dir = str(tmp_path / "trace")
    engine.run_network(c, n_iters=2)
    found = []
    for r, _, fs in os.walk(c.profile_dir):
        found += [os.path.join(r, f) for f in fs]
    assert found, "no profiler trace files written"
