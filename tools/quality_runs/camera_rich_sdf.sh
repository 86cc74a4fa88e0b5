#!/bin/bash
# SDF-PDF flagship at reference-like camera density: 12 training views,
# views 12-13 held out; same 8k-step (4%) schedule as the 4-camera SDF
# run for a controlled view-axis comparison. BASELINE.md: "camera-rich"
# section.
set -e
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}
ROOT=${SYNTHV14_ROOT:-/tmp/synthv14}/human
EPOCHS=${EPOCHS:-16}
EXP=${EXP:-synthv14_sdf}
COMMON="train_dataset.data_root $ROOT train_dataset.ann_file $ROOT/annots.npy test_dataset.data_root $ROOT test_dataset.ann_file $ROOT/annots.npy H 256 W 256 training_view [0,1,2,3,4,5,6,7,8,9,10,11] num_train_frame 16 num_eval_frame 4 network_module sdf_pdf train_dataset_module tpose_pdf test_dataset_module tpose_pdf use_bigpose True tpose_viewdir True init_sdf ''"

echo "=== SDF-PDF stage 1: $((EPOCHS * 500)) steps, 12 training views ==="
python train_net.py --cfg_file configs/synthetic.yaml exp_name $EXP resume False $COMMON \
  N_rand 1024 ep_iter 500 train.epoch $EPOCHS train.steps_per_dispatch 16 \
  save_ep $EPOCHS save_latest_ep 4 eval_ep 1000000
echo "=== SDF eval: training view 0, training poses ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP $COMMON test_view "0," test.frame_sampler_interval 4 2>&1 | tail -3
echo "=== SDF eval: HELD-OUT view 12, training poses ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP $COMMON test_view "12," test.frame_sampler_interval 4 2>&1 | tail -3
echo "=== SDF eval: HELD-OUT view 13, training poses ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP $COMMON test_view "13," test.frame_sampler_interval 4 2>&1 | tail -3
echo ALL_DONE
