"""Trained-checkpoint cross-framework parity protocol (VERDICT-r3
item 1): close the <=0.1 dB PSNR contract with TRAINED weights, in both
directions, using only in-sandbox machinery.

  direction A (reference -> ours): the reference's own train_net.py
    (tools/ref_cli.py, CPU) trains on the synthetic capsule subject;
    its run.py --type evaluate scores the checkpoint; we import the
    .pth (compat/torch_import.py) and score the SAME eval split with
    our run.py. |dPSNR| <= 0.1 dB per view and on the mean.

  direction B (ours -> reference): our train_net.py (TPU) trains the
    same config; our run.py scores it; compat/torch_export.py converts
    the flax checkpoint to a reference .pth, and the reference's own
    run.py --type evaluate scores it.

One reference-format yaml per family drives BOTH stacks (the registry
accepts reference module paths; *_path entries are absolute into
/root/reference so the reference CLI runs from a scratch cwd).

Subcommands:
  gen        --work W   write dataset + per-family yamls
  import-eval --work W --family F   import ref .pth -> our ckpt dir
  export     --work W --family F   export our .flax -> ref .pth tree
  report     --work W   assemble the parity table from metrics files

Orchestrated end to end by tools/quality_runs/parity_contract.sh.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_ROOT = "/root/reference"

FAMILIES = {
    "aninerf": dict(
        network_module="lib.networks.bw_deform.tpose_nerf_network",
        network_path=f"{REF_ROOT}/lib/networks/bw_deform/tpose_nerf_network.py",
        dataset_module="lib.datasets.tpose_dataset",
        dataset_path=f"{REF_ROOT}/lib/datasets/tpose_dataset.py",
        extra={},
        n_rand=256,
        epochs=2,
        ep_iter=500,
    ),
    "sdf_pdf": dict(
        network_module="lib.networks.bw_deform.anisdf_pdf_network",
        network_path=f"{REF_ROOT}/lib/networks/bw_deform/anisdf_pdf_network.py",
        dataset_module="lib.datasets.tpose_pdf_dataset",
        dataset_path=f"{REF_ROOT}/lib/datasets/tpose_pdf_dataset.py",
        extra={"use_bigpose": True, "tpose_viewdir": True, "init_sdf": "''"},
        n_rand=192,
        epochs=2,
        ep_iter=300,
    ),
    # round-5 additions (VERDICT-r4 item 1): the NeuS variant and one
    # aligned family, so the trained contract covers the KNN blend-
    # weight warp (aligned_aninerf_lbw_network.py) and the NeuS alpha
    # conversion (sdf_utils.py:14-67) with real trained weights
    "neus_pdf": dict(
        network_module="lib.networks.bw_deform.anisdf_neus_pdf_network",
        network_path=(
            f"{REF_ROOT}/lib/networks/bw_deform/anisdf_neus_pdf_network.py"
        ),
        dataset_module="lib.datasets.tpose_pdf_dataset",
        dataset_path=f"{REF_ROOT}/lib/datasets/tpose_pdf_dataset.py",
        extra={"use_bigpose": True, "tpose_viewdir": True, "init_sdf": "''"},
        n_rand=192,
        epochs=2,
        ep_iter=300,
    ),
    "aligned_lbw": dict(
        network_module="lib.networks.bw_deform.aligned_aninerf_lbw_network",
        network_path=(
            f"{REF_ROOT}/lib/networks/bw_deform/aligned_aninerf_lbw_network.py"
        ),
        dataset_module="lib.datasets.tpose_pdf_dataset",
        dataset_path=f"{REF_ROOT}/lib/datasets/tpose_pdf_dataset.py",
        extra={"use_bigpose": True, "tpose_viewdir": True},
        n_rand=192,
        epochs=2,
        ep_iter=300,
    ),
}

N_FRAMES = 4       # training-frame window (num_train_frame)
N_EVAL_FRAMES = 4  # novel-pose window after it (num_eval_frame)
N_VIEWS = 4
IMG = 128
TRAIN_VIEWS = [0, 1, 2]
TEST_VIEWS = [3]
# one reference CPU training can be stretched to ~5k steps
# (PARITY_LONG=aninerf etc.; VERDICT-r4 item 6 — hardens the contract
# beyond the 600-1000-step runs)
LONG_EPOCHS = 10


def _yaml_for(family: str, data_root: str) -> str:
    f = FAMILIES[family]
    extra = "\n".join(f"{k}: {v}" for k, v in f["extra"].items())
    views = ", ".join(str(v) for v in TRAIN_VIEWS)
    tviews = ", ".join(str(v) for v in TEST_VIEWS)
    epochs = f["epochs"]
    if family in os.environ.get("PARITY_LONG", "").split(","):
        epochs = LONG_EPOCHS
    return f"""task: 'deform'
exp_name: 'parity_{family}'
gpus: [0]

train_dataset_module: '{f["dataset_module"]}'
train_dataset_path: '{f["dataset_path"]}'
test_dataset_module: '{f["dataset_module"]}'
test_dataset_path: '{f["dataset_path"]}'

network_module: '{f["network_module"]}'
network_path: '{f["network_path"]}'
renderer_module: 'lib.networks.renderer.tpose_renderer'
renderer_path: '{REF_ROOT}/lib/networks/renderer/tpose_renderer.py'

trainer_module: 'lib.train.trainers.tpose_trainer'
trainer_path: '{REF_ROOT}/lib/train/trainers/tpose_trainer.py'

evaluator_module: 'lib.evaluators.if_nerf'
evaluator_path: '{REF_ROOT}/lib/evaluators/if_nerf.py'

visualizer_module: 'lib.visualizers.if_nerf'
visualizer_path: '{REF_ROOT}/lib/visualizers/if_nerf.py'

train_dataset:
    data_root: '{data_root}'
    human: 'synthetic'
    ann_file: '{data_root}/annots.npy'
    split: 'train'

test_dataset:
    data_root: '{data_root}'
    human: 'synthetic'
    ann_file: '{data_root}/annots.npy'
    split: 'test'

train:
    batch_size: 1
    collator: ''
    lr: 5.0e-4
    weight_decay: 0
    epoch: {epochs}
    scheduler:
        type: 'exponential'
        gamma: 0.1
        decay_epochs: 1000
    num_workers: 0

test:
    sampler: 'FrameSampler'
    frame_sampler_interval: 1
    batch_size: 1
    collator: ''

ep_iter: {f["ep_iter"]}
save_ep: {epochs}
save_latest_ep: 1
eval_ep: 1000000

train_th: 0.
norm_th: 0.1

i_embed: 0
xyz_res: 10
view_res: 4
raw_noise_std: 0

N_samples: 64
N_importance: 128
N_rand: {f["n_rand"]}

perturb: 1
white_bkgd: False

render_views: 50

ratio: 1.
training_view: [{views}]
test_view: [{tviews}]
init_aninerf: 'no_pretrain'
num_train_frame: {N_FRAMES}
num_eval_frame: {N_EVAL_FRAMES}
begin_ith_frame: 0
frame_interval: 1
smpl: 'smpl'
vertices: 'vertices'
params: 'params'
big_box: False
box_padding: 0.05

H: {IMG}
W: {IMG}

voxel_size: [0.02, 0.02, 0.02]

log_interval: 100
{extra}

aninerf_animation_cfg:
    trainer_module: 'lib.train.trainers.aninerf_animation_trainer'
    trainer_path: '{REF_ROOT}/lib/train/trainers/aninerf_animation_trainer.py'
"""


# pseudo-families: stage-2 flows layered on a base family's yaml with
# extra cfg flags. "aninerf_anim" is the paper's headline novel-pose
# capability (aninerf_animation_trainer.py:33-121 training; eval with
# test_novel_pose True shifting the frame window,
# tpose_dataset.py:51-53,266-270).
CASES = {
    "aninerf_anim": (
        "aninerf",
        ["aninerf_animation", "True", "test_novel_pose", "True"],
    ),
}


def _case(family):
    """(yaml base family, extra cfg opts) for a family or pseudo-family."""
    if family in CASES:
        return CASES[family]
    return family, []


def cmd_gen(args):
    # host-side generation: never route the generator's eager jax ops
    # through the TPU tunnel (each tiny op pays the ~26 ms relay floor,
    # and a relay stall blocks the whole contract before it starts)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from animatable_nerf_tpu.data import generate_synthetic_dataset

    work = os.path.abspath(args.work)
    root = os.path.join(work, "human")
    os.makedirs(work, exist_ok=True)
    if not os.path.exists(os.path.join(root, "annots.npy")):
        # N_FRAMES training poses + N_EVAL_FRAMES novel poses after
        # them (the test_novel_pose window starts at frame
        # num_train_frame * frame_interval, tpose_dataset.py:51-53)
        generate_synthetic_dataset(
            root, n_frames=N_FRAMES + N_EVAL_FRAMES, n_views=N_VIEWS,
            image_size=IMG, n_verts=1380, seed=7, subject="capsule",
        )
        print(f"dataset -> {root}")
    for family in FAMILIES:
        path = os.path.join(work, f"{family}_ref.yaml")
        with open(path, "w") as fh:
            fh.write(_yaml_for(family, root))
        print(f"config -> {path}")


def _ref_latest_pth(work, family, exp=None):
    exp = exp or f"parity_{family}"
    return os.path.join(work, "ref", "data", "trained_model", "deform",
                        exp, "latest.pth")


def cmd_import_eval(args):
    """Convert the reference-trained .pth into our checkpoint dir under
    work/ours (our run.py then evaluates it like a native model)."""
    import subprocess

    work = os.path.abspath(args.work)
    base, opts = _case(args.family)
    pth = _ref_latest_pth(work, args.family)
    out_dir = os.path.join(work, "ours", "data", "trained_model", "deform",
                           f"parity_{args.family}_imported")
    cfg = os.path.join(work, f"{base}_ref.yaml")
    subprocess.check_call([
        sys.executable, os.path.join(REPO, "tools",
                                     "import_torch_checkpoint.py"),
        "--cfg_file", cfg, "--pth", pth, "--out", out_dir,
    ] + opts)


def cmd_export(args):
    """Convert our TPU-trained .flax into a reference .pth tree under
    work/ref (the reference's run.py then scores it)."""
    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")

    from animatable_nerf_tpu.compat.torch_export import (
        save_reference_checkpoint,
    )
    from animatable_nerf_tpu.config import load_config
    from animatable_nerf_tpu.engine import Engine
    from animatable_nerf_tpu.train.checkpoints import load_checkpoint

    work = os.path.abspath(args.work)
    base, opts = _case(args.family)
    cfg = load_config(
        os.path.join(work, f"{base}_ref.yaml"),
        opts + ["exp_name", f"parity_{args.family}"],
    )
    ours_dir = os.path.join(work, "ours", "data", "trained_model", "deform",
                            f"parity_{args.family}")
    eng = Engine(cfg)
    if args.family in CASES:
        # stage-2 checkpoints carry the FULL tree (bw_field AND
        # novel_pose_bw AND the color head) — the reference's strict
        # load needs every subtree, but the novel-pose EVAL template
        # only traces novel_pose_bw. Init in the animation trainer's
        # regime (train=True, novel_pose=True traces both fields plus
        # the full canonical human; train/animation.py init_state).
        import jax.numpy as jnp

        from animatable_nerf_tpu.engine import frame_arrays

        ds = _template_dataset(cfg)
        frame = frame_arrays(ds[0])  # host-side: keep out of the trace
        z = jnp.ones((8, cfg.N_samples))
        template = jax.jit(
            lambda: eng.model.init(
                jax.random.PRNGKey(0), jnp.zeros((*z.shape, 3)),
                jnp.ones((8, 3)), z, frame,
                train=True, novel_pose=True,
            )
        )()
    else:
        template = eng.init_params(
            jax.random.PRNGKey(0), dataset=_template_dataset(cfg),
        )
    loaded = load_checkpoint(ours_dir, template)
    assert loaded is not None, f"no checkpoint in {ours_dir}"
    params, _opt, epoch, _step, _rec = loaded
    out = _ref_latest_pth(work, args.family,
                          exp=f"parity_{args.family}_tpu")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_reference_checkpoint(out, _export_family(args.family), params,
                              epoch=epoch,
                              num_train_frame=int(cfg.num_train_frame))
    print(f"exported {ours_dir} (epoch {epoch}) -> {out}")


def _export_family(family):
    return {
        "aninerf": "aninerf",
        "aninerf_anim": "aninerf",
        "sdf_pdf": "sdf_pdf",
        "neus_pdf": "neus_pdf",
        "aligned_lbw": "aligned_lbw",
    }[family]


def _template_dataset(cfg):
    from animatable_nerf_tpu.engine import make_dataset

    return make_dataset(cfg, "test")


def _ref_metrics(work, family, exp=None):
    import numpy as np

    exp = exp or f"parity_{family}"
    path = os.path.join(work, "ref", "data", "result", "deform", exp,
                        "metrics.npy")
    m = np.load(path, allow_pickle=True).item()
    return {k: [float(x) for x in v] for k, v in m.items()}


def _our_metrics(work, family, exp=None):
    import numpy as np

    exp = exp or f"parity_{family}"
    path = os.path.join(work, "ours", "data", "result", "deform", exp,
                        "metrics.npy")
    m = np.load(path, allow_pickle=True).item()
    return {k: [float(x) for x in v] for k, v in m.items()}


def cmd_report(args):
    import numpy as np

    work = os.path.abspath(args.work)
    rows = []
    ok = True
    for family in args.families.split(","):
        # direction A: reference-trained weights
        ref = _ref_metrics(work, family)
        ours = _our_metrics(work, family, exp=f"parity_{family}_imported")
        # direction B: TPU-trained weights
        ours_b = _our_metrics(work, family)
        ref_b = _ref_metrics(work, family, exp=f"parity_{family}_tpu")
        for name, a, b in (
            (f"{family} A (ref-trained): ref-eval vs our-eval", ref, ours),
            (f"{family} B (tpu-trained): our-eval vs ref-eval", ours_b,
             ref_b),
        ):
            pa, pb = np.array(a["psnr"]), np.array(b["psnr"])
            assert len(pa) == len(pb), (name, len(pa), len(pb))
            d = np.abs(pa - pb)
            mean_d = abs(pa.mean() - pb.mean())
            rows.append({
                "case": name,
                "n_items": len(pa),
                "psnr_1": round(float(pa.mean()), 4),
                "psnr_2": round(float(pb.mean()), 4),
                "mean_abs_dpsnr": round(float(mean_d), 4),
                "max_item_abs_dpsnr": round(float(d.max()), 4),
                "ssim_1": round(float(np.mean(a["ssim"])), 4),
                "ssim_2": round(float(np.mean(b["ssim"])), 4),
                "pass_0.1dB": bool(mean_d <= 0.1 and d.max() <= 0.1),
            })
            ok &= rows[-1]["pass_0.1dB"]
    print(json.dumps(rows, indent=1))
    out = os.path.join(work, "parity_report.json")
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"report -> {out}")
    print("CONTRACT", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (
        ("gen", cmd_gen), ("import-eval", cmd_import_eval),
        ("export", cmd_export), ("report", cmd_report),
    ):
        sp = sub.add_parser(name)
        sp.add_argument("--work", required=True)
        if name in ("import-eval", "export"):
            sp.add_argument("--family", required=True,
                            choices=sorted(FAMILIES) + sorted(CASES))
        if name == "report":
            sp.add_argument(
                "--families",
                default="aninerf,sdf_pdf,neus_pdf,aligned_lbw,aninerf_anim",
            )
        sp.set_defaults(fn=fn)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main() or 0)
