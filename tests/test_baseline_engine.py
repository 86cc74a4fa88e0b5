"""End-to-end NHR/NT baseline path through the engine: synthetic data
-> config -> train steps -> checkpoint -> evaluate."""

import os

import numpy as np
import jax
import pytest

from animatable_nerf_tpu.config import load_config
from animatable_nerf_tpu.data import generate_synthetic_dataset
from animatable_nerf_tpu import engine


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth") / "human")
    generate_synthetic_dataset(
        root, n_frames=2, n_views=2, image_size=48, n_verts=300, n_blobs=64
    )
    return root


def _cfg(synth_root, tmp_path, module, dataset_module, extra=()):
    opts = [
        "train_dataset.data_root", synth_root,
        "train_dataset.ann_file", os.path.join(synth_root, "annots.npy"),
        "test_dataset.data_root", synth_root,
        "test_dataset.ann_file", os.path.join(synth_root, "annots.npy"),
        "network_module", module,
        "train_dataset_module", dataset_module,
        "test_dataset_module", dataset_module,
        "training_view", "[0]",
        "test_view", "[1]",
        "num_train_frame", "2",
        "H", "48", "W", "48",
        "ep_iter", "2",
        "exp_name", f"test_{module}",
        "record_dir", str(tmp_path / "record"),
        "trained_model_dir", str(tmp_path / "model"),
        "result_dir", str(tmp_path / "result"),
        "resume", "False",
        *extra,
    ]
    return load_config("configs/synthetic.yaml", opts=list(opts))


class TestNHREngine:
    def test_train_and_evaluate(self, synth_root, tmp_path):
        cfg = _cfg(synth_root, tmp_path, "nhr", "nhr")
        state = engine.run_train(cfg, epochs=1)
        assert np.isfinite(
            float(jax.tree_util.tree_leaves(state.params)[0].sum())
        )
        assert os.path.exists(
            os.path.join(cfg.trained_model_dir, "latest")
        ) or os.listdir(cfg.trained_model_dir)
        cfg2 = cfg.clone()
        cfg2.eval = True
        out = engine.run_evaluate(cfg2, max_items=1, save_images=False)
        assert np.isfinite(out["psnr"])


class TestNTEngine:
    def test_train_and_evaluate(self, synth_root, tmp_path):
        cfg = _cfg(synth_root, tmp_path, "nt", "nt")
        state = engine.run_train(cfg, epochs=1)
        cfg2 = cfg.clone()
        cfg2.eval = True
        out = engine.run_evaluate(cfg2, max_items=1, save_images=False)
        assert np.isfinite(out["psnr"])


class TestNHRVGGLoss:
    def test_train_with_vgg_perceptual(self, synth_root, tmp_path):
        """train.vgg_weights switches BaselineTrainer to the exact
        reference objective (VGG19 feature L1 + image L1 on the
        rgb+mask stack — lib/train/trainers/nhr.py:25-31)."""
        from animatable_nerf_tpu.train.perceptual import random_vgg19_head

        npz = str(tmp_path / "vgg19_head.npz")
        np.savez(
            npz, **{k: np.asarray(v)
                    for k, v in random_vgg19_head(0).items()}
        )
        cfg = _cfg(
            synth_root, tmp_path, "nhr", "nhr",
            extra=("train.vgg_weights", npz),
        )
        state = engine.run_train(cfg, epochs=1)
        assert np.isfinite(
            float(jax.tree_util.tree_leaves(state.params)[0].sum())
        )
