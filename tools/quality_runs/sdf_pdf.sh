#!/bin/bash
# SDF-PDF flagship quality protocol on the 20-pose 256^2 subject
# (full loss stack: eikonal, observed-gradient, SDF mask BCE, resd
# reg). Default EPOCHS=16 (8k steps = 4% of the reference schedule,
# ~11 min on v5e). BASELINE.md: "SDF-PDF 20-pose quality run".
set -e
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}
ROOT=${SYNTH256_ROOT:-/tmp/synth256}/human
EPOCHS=${EPOCHS:-16}
EXP=${EXP:-synth256_sdf}
COMMON="train_dataset.data_root $ROOT train_dataset.ann_file $ROOT/annots.npy test_dataset.data_root $ROOT test_dataset.ann_file $ROOT/annots.npy H 256 W 256 training_view [0,1,2,3] num_train_frame 16 num_eval_frame 4 network_module sdf_pdf train_dataset_module tpose_pdf test_dataset_module tpose_pdf use_bigpose True tpose_viewdir True init_sdf ''"

echo "=== SDF-PDF stage 1: $((EPOCHS * 500)) steps ==="
python train_net.py --cfg_file configs/synthetic.yaml exp_name $EXP resume False $COMMON \
  N_rand 1024 ep_iter 500 train.epoch $EPOCHS train.steps_per_dispatch 16 \
  save_ep $EPOCHS save_latest_ep 4 eval_ep 1000000
echo "=== SDF eval: training view 0, training poses ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP $COMMON test_view "0," test.frame_sampler_interval 4 2>&1 | tail -3
echo "=== SDF eval: HELD-OUT view 4, training poses ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP $COMMON test_view "4," test.frame_sampler_interval 4 2>&1 | tail -3
echo ALL_DONE
