"""Eval/vis/bench CLI.

Usage mirrors the reference (run.py):
    python run.py --type evaluate --cfg_file configs/aninerf_313.yaml exp_name aninerf_313
    python run.py --type visualize --cfg_file ... vis_novel_view True
    python run.py --type visualize --cfg_file ... vis_posed_mesh True
    python run.py --type dataset --cfg_file ...
    python run.py --type network --cfg_file ...
Dispatch is `run_<type>` by --type (reference run.py:143-144).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from animatable_nerf_tpu import jaxenv
from animatable_nerf_tpu.config import parse_cli

jaxenv.setup()


def run_dataset(cfg):
    from animatable_nerf_tpu.engine import run_dataset as f

    f(cfg)


def run_network(cfg):
    from animatable_nerf_tpu.engine import run_network as f

    f(cfg)


def run_evaluate(cfg):
    from animatable_nerf_tpu.engine import run_evaluate as f

    f(cfg)


def run_visualize(cfg):
    from animatable_nerf_tpu.engine import run_visualize as f

    f(cfg)


def run_animation(cfg):
    """Animate extracted meshes over the test sequence (reference
    run.py:127-129 dispatches to an absent tools/animate_mesh; working
    here). Pass `vis_posed_mesh True` for the mesh dataset overlay."""
    from animatable_nerf_tpu.engine import run_animation as f

    f(cfg)


def run_raster(cfg):
    """Rasterize extracted meshes into training-view cameras (reference
    run.py:132-135 dispatches to an absent tools/rasterizer_mesh; working
    here on the native z-buffer). Pass `vis_posed_mesh True`."""
    from animatable_nerf_tpu.engine import run_raster as f

    f(cfg)


def run_light_stage(cfg):
    """Point-cloud -> occupancy voxelization (reference run.py:105-108)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
    )
    import ply_to_occupancy

    ply_to_occupancy.ply_to_occupancy(
        cfg.train_dataset.get("data_root", "data/light_stage")
    )


def run_lpips(cfg):
    """LPIPS over the evaluate run's dumped pred/gt pairs (reference
    run.py:138-140 dispatches to an absent tools/calculate_lpips; working
    here). Needs converted weights: see tools/convert_lpips_weights.py,
    then pass `lpips_weights <path.npz>`."""
    from animatable_nerf_tpu.evaluators.lpips import score_comparison_dir

    weights = cfg.get("lpips_weights", "")
    if not weights:
        raise SystemExit(
            "lpips needs converted weights: run "
            "tools/convert_lpips_weights.py on the torchvision backbone + "
            "LPIPS calibration .pth files, then pass "
            "`lpips_weights <path.npz>` (no pretrained weights are bundled)"
        )
    score_comparison_dir(cfg.result_dir, weights)


def run_evaluate_nv(cfg):
    """Re-score externally produced renders against dataset ground truth
    (reference run.py:111-124: loader + evaluator only, no network)."""
    from animatable_nerf_tpu.engine import run_evaluate_external as f

    f(cfg)


def main():
    args, cfg = parse_cli()
    fn = globals().get("run_" + args.type)
    if fn is None:
        raise SystemExit(
            f"unknown --type {args.type!r}; available: dataset, network, "
            "evaluate, visualize, animation, raster, light_stage, "
            "evaluate_nv, lpips"
        )
    fn(cfg)


if __name__ == "__main__":
    main()
