#!/bin/bash
# VERDICT-r3 item 3: make end-to-end CLI eval wall-time a headline
# number. Drives `run.py --type evaluate` (load -> pad -> H2D -> render
# -> SSIM -> PNG) on a 512^2 synthetic subject and reports the
# steady-state sec/frame the pipelined eval loop prints (engine.py
# run_evaluate: Loader thread-prefetch + ordered metrics worker).
#
# The model is trained briefly first (the wall-time is survivor-
# fraction-dependent through the capacity ladder, which is data-driven,
# not weights-driven — the short schedule just makes the renders
# non-degenerate). Run on the real chip from the repo root.
set -e
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}
ROOT=${SYNTH512_ROOT:-/tmp/synth512}/human
EXP=${EXP:-synth512_cli}

python - <<'EOF'
import os, jax
jax.config.update("jax_platforms", "cpu")
from animatable_nerf_tpu.data.synthetic import generate_synthetic_dataset
root = os.path.join(os.environ.get("SYNTH512_ROOT", "/tmp/synth512"), "human")
if not os.path.exists(os.path.join(root, "annots.npy")):
    generate_synthetic_dataset(root, n_frames=2, n_views=3, image_size=512,
                               n_verts=1380, n_blobs=256, seed=11)
print("dataset ready:", root)
EOF

COMMON="train_dataset.data_root $ROOT train_dataset.ann_file $ROOT/annots.npy \
test_dataset.data_root $ROOT test_dataset.ann_file $ROOT/annots.npy \
H 512 W 512 training_view [0,1] test_view [0,1,2] num_train_frame 2 num_eval_frame 1"

if [ ! -f data/trained_model/deform/$EXP/latest.flax ]; then
  echo "=== quick training (non-degenerate renders) ==="
  python train_net.py --cfg_file configs/synthetic.yaml exp_name $EXP resume False \
    $COMMON N_rand 1024 ep_iter 250 train.epoch 4 train.steps_per_dispatch 16 \
    save_ep 4 save_latest_ep 4 eval_ep 1000000
fi

echo "=== pass 1 (compiles + ladder settling) ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP \
  $COMMON test.frame_sampler_interval 1 2>&1 | grep -E "eval pipeline|psnr"
echo "=== pass 2 (steady state, cached programs) ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP \
  $COMMON test.frame_sampler_interval 1 2>&1 | grep -E "eval pipeline|psnr"
