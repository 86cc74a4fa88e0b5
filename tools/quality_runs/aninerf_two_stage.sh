#!/bin/bash
# Two-stage AniNeRF quality protocol on the 20-pose 256^2 subject.
# Stage 1 trains on frames 0-15 x views 0-3; view 4 and frames 16-19
# are held out. Default EPOCHS=40 (20k steps, ~15 min stage 1 on v5e);
# EPOCHS=120 reproduces the 60k-step "30% schedule" run.
# BASELINE.md: "20-pose two-stage quality run" / "30%-schedule" rows.
set -e
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}
ROOT=${SYNTH256_ROOT:-/tmp/synth256}/human
EPOCHS=${EPOCHS:-40}
EXP=${EXP:-synth256_s1}
COMMON="train_dataset.data_root $ROOT train_dataset.ann_file $ROOT/annots.npy test_dataset.data_root $ROOT test_dataset.ann_file $ROOT/annots.npy H 256 W 256 training_view [0,1,2,3] num_train_frame 16 num_eval_frame 4"

echo "=== stage 1: $((EPOCHS * 500)) steps ==="
python train_net.py --cfg_file configs/synthetic.yaml exp_name $EXP resume False $COMMON \
  N_rand 1024 ep_iter 500 train.epoch $EPOCHS train.steps_per_dispatch 16 \
  save_ep $EPOCHS save_latest_ep 5 eval_ep 1000000
echo "=== stage-1 eval: training view 0, training poses ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP $COMMON test_view "0," test.frame_sampler_interval 4 2>&1 | tail -3
echo "=== stage-1 eval: HELD-OUT view 4, training poses ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP $COMMON test_view "4," test.frame_sampler_interval 4 2>&1 | tail -3

echo "=== stage 2: novel-pose bw field, 5k steps ==="
python train_net.py --cfg_file configs/synthetic.yaml exp_name ${EXP}_anim resume False \
  aninerf_animation True init_aninerf $EXP $COMMON \
  ep_iter 500 train.epoch 10 save_ep 10 save_latest_ep 2 eval_ep 1000000
echo "=== novel-pose eval: UNSEEN poses (frames 16-19), HELD-OUT view 4 ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name ${EXP}_anim \
  aninerf_animation True test_novel_pose True $COMMON test_view "4," 2>&1 | tail -3
echo "=== novel-pose eval: UNSEEN poses, training view 0 ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name ${EXP}_anim \
  aninerf_animation True test_novel_pose True $COMMON test_view "0," 2>&1 | tail -3

echo "=== mesh loop: chamfer/P2S vs analytic GT (2 frames) ==="
python run.py --type visualize --cfg_file configs/synthetic.yaml exp_name $EXP \
  vis_posed_mesh True $COMMON test.frame_sampler_interval 8 2>&1 | tail -4
echo ALL_DONE
