#!/bin/bash
# Camera-rich two-stage AniNeRF protocol: 20 poses x 14 views, 12
# training views (reference-like density — H36M/ZJU subjects train on
# ~20 cameras), views 12-13 held out. Same 20k-step schedule as the
# 4-camera run for a controlled view-axis comparison.
# BASELINE.md: "camera-rich" section.
set -e
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}
ROOT=${SYNTHV14_ROOT:-/tmp/synthv14}/human
EPOCHS=${EPOCHS:-40}
EXP=${EXP:-synthv14_s1}
COMMON="train_dataset.data_root $ROOT train_dataset.ann_file $ROOT/annots.npy test_dataset.data_root $ROOT test_dataset.ann_file $ROOT/annots.npy H 256 W 256 training_view [0,1,2,3,4,5,6,7,8,9,10,11] num_train_frame 16 num_eval_frame 4"

echo "=== stage 1: $((EPOCHS * 500)) steps, 12 training views ==="
python train_net.py --cfg_file configs/synthetic.yaml exp_name $EXP resume False $COMMON \
  N_rand 1024 ep_iter 500 train.epoch $EPOCHS train.steps_per_dispatch 16 \
  save_ep $EPOCHS save_latest_ep 10 eval_ep 1000000
echo "=== eval: training view 0, training poses ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP $COMMON test_view "0," test.frame_sampler_interval 4 2>&1 | tail -3
echo "=== eval: HELD-OUT view 12, training poses ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP $COMMON test_view "12," test.frame_sampler_interval 4 2>&1 | tail -3
echo "=== eval: HELD-OUT view 13, training poses ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP $COMMON test_view "13," test.frame_sampler_interval 4 2>&1 | tail -3

echo "=== stage 2: novel-pose bw field, 5k steps ==="
python train_net.py --cfg_file configs/synthetic.yaml exp_name ${EXP}_anim resume False \
  aninerf_animation True init_aninerf $EXP $COMMON \
  ep_iter 500 train.epoch 10 save_ep 10 save_latest_ep 2 eval_ep 1000000
echo "=== novel-pose eval: UNSEEN poses, HELD-OUT view 12 ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name ${EXP}_anim \
  aninerf_animation True test_novel_pose True $COMMON test_view "12," 2>&1 | tail -3
echo "=== novel-pose eval: UNSEEN poses, training view 0 ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name ${EXP}_anim \
  aninerf_animation True test_novel_pose True $COMMON test_view "0," 2>&1 | tail -3

echo "=== mesh loop: chamfer / P2S vs analytic GT ==="
python run.py --type visualize --cfg_file configs/synthetic.yaml exp_name $EXP \
  vis_posed_mesh True $COMMON test.frame_sampler_interval 8 2>&1 | tail -4
echo ALL_DONE
