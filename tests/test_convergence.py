"""End-to-end overfit-one-frame convergence test (SURVEY §4).

The reference has no automated tests; its implicit acceptance signal is
"training reduces the image loss and eval PSNR looks sane" (evaluation
IS the test — lib/evaluators/if_nerf.py). This pins that signal on the
full pipeline: synthetic dataset -> config -> engine.run_train ->
recorder JSONL -> checkpoint -> engine.run_evaluate, overfitting one
frame/one view so convergence is fast and deterministic enough to
assert on.
"""

import json
import os

import numpy as np
import pytest

from animatable_nerf_tpu import engine
from animatable_nerf_tpu.config import load_config
from animatable_nerf_tpu.data import generate_synthetic_dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_conv") / "human")
    generate_synthetic_dataset(
        root, n_frames=1, n_views=1, image_size=48, n_verts=300, n_blobs=64
    )
    return root


def _img_losses(record_dir):
    path = os.path.join(record_dir, "scalars.jsonl")
    losses = []
    with open(path) as f:
        for line in f:
            payload = json.loads(line).get("train")
            if payload and "img_loss" in payload:
                losses.append(float(payload["img_loss"]))
    return losses


def test_overfit_one_frame_converges(synth_root, tmp_path):
    """50 steps on one frame/one view must at least halve the image
    loss, and eval on the SAME view (pure overfit) must beat the
    initial loss by a wide margin."""
    opts = [
        "train_dataset.data_root", synth_root,
        "train_dataset.ann_file", os.path.join(synth_root, "annots.npy"),
        "test_dataset.data_root", synth_root,
        "test_dataset.ann_file", os.path.join(synth_root, "annots.npy"),
        "training_view", "[0]",
        "test_view", "[0]",          # same view: convergence, not generalization
        "num_train_frame", "1",
        "H", "48", "W", "48",
        "N_rand", "128",
        "N_samples", "32",
        "ep_iter", "25",
        "log_interval", "25",
        "record_interval", "1",   # one jsonl line per step
        "exp_name", "test_convergence",
        "record_dir", str(tmp_path / "record"),
        "trained_model_dir", str(tmp_path / "model"),
        "result_dir", str(tmp_path / "result"),
        "resume", "False",
        "fix_random", "True",
    ]
    cfg = load_config("configs/synthetic.yaml", opts=list(opts))
    engine.run_train(cfg, epochs=2)

    losses = _img_losses(cfg.record_dir)
    assert len(losses) >= 40, f"expected ~50 logged steps, got {len(losses)}"
    early = float(np.mean(losses[:5]))
    late = float(np.mean(losses[-5:]))
    assert late < 0.5 * early, (
        f"img_loss did not halve while overfitting: {early:.4f} -> {late:.4f}"
    )

    cfg2 = cfg.clone()
    cfg2.eval = True
    out = engine.run_evaluate(cfg2, max_items=1, save_images=False)
    assert np.isfinite(out["psnr"]) and np.isfinite(out["ssim"])
    # eval renders the trained view densely (different code path from the
    # train step's sampled rays); its MSE must reflect the overfit
    assert out["mse"] < 0.6 * early, (
        f"eval mse {out['mse']:.4f} vs initial train loss {early:.4f}"
    )


def test_overfit_sdf_pdf_converges(synth_root, tmp_path):
    """Flagship SDF-PDF end-to-end: the composite loss (img MSE + resd
    reg + eikonal + SDF mask BCE) must drop while overfitting one
    frame/view, and eval must run finite through the KNN/grid-filtered
    compacted render. The geometric init starts as a sphere, so the
    criterion is a solid decrease rather than AniNeRF's halving."""
    opts = [
        "train_dataset.data_root", synth_root,
        "train_dataset.ann_file", os.path.join(synth_root, "annots.npy"),
        "test_dataset.data_root", synth_root,
        "test_dataset.ann_file", os.path.join(synth_root, "annots.npy"),
        "network_module", "sdf_pdf",
        "train_dataset_module", "tpose_pdf",
        "test_dataset_module", "tpose_pdf",
        "use_bigpose", "True",
        "tpose_viewdir", "True",
        "init_sdf", "",
        "training_view", "[0]",
        "test_view", "[0]",
        "num_train_frame", "1",
        "num_latent_code", "1",
        "H", "48", "W", "48",
        "N_rand", "128",
        "N_samples", "32",
        "ep_iter", "25",
        "log_interval", "25",
        "record_interval", "1",
        "exp_name", "test_convergence_sdf",
        "record_dir", str(tmp_path / "record_sdf"),
        "trained_model_dir", str(tmp_path / "model_sdf"),
        "result_dir", str(tmp_path / "result_sdf"),
        "resume", "False",
        "fix_random", "True",
    ]
    cfg = load_config("configs/synthetic.yaml", opts=list(opts))
    engine.run_train(cfg, epochs=2)

    losses = _img_losses(cfg.record_dir)
    assert len(losses) >= 40, f"expected ~50 logged steps, got {len(losses)}"
    early = float(np.mean(losses[:5]))
    late = float(np.mean(losses[-5:]))
    assert late < 0.75 * early, (
        f"SDF-PDF img_loss did not drop while overfitting: "
        f"{early:.4f} -> {late:.4f}"
    )

    cfg2 = cfg.clone()
    cfg2.eval = True
    out = engine.run_evaluate(cfg2, max_items=1, save_images=False)
    assert np.isfinite(out["psnr"]) and np.isfinite(out["ssim"])
    assert out["mse"] < 1.2 * early, (
        f"eval mse {out['mse']:.4f} vs initial train loss {early:.4f}"
    )
