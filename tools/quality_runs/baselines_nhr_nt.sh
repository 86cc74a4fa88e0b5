#!/bin/bash
# NHR / NT image-space baseline quality protocol on the 4-pose 128^2
# subject: train on views 0-2, hold out view 3 (4k steps each, ~10 min
# total on v5e). BASELINE.md: "NHR / NT baseline quality runs".
set -e
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}
ROOT=${SYNTH_NHR_ROOT:-/tmp/synth_nhr}/human
COMMON="train_dataset.data_root $ROOT train_dataset.ann_file $ROOT/annots.npy test_dataset.data_root $ROOT test_dataset.ann_file $ROOT/annots.npy train_dataset.human synthetic test_dataset.human synthetic training_view [0,1,2] num_train_frame 4 H 128 W 128 ratio 1.0 test.sampler FrameSampler test.frame_sampler_interval 1 vertices vertices params params"

python train_net.py --cfg_file configs/baselines/nhr_s9p.yaml exp_name nhr_long resume False \
  ep_iter 100 train.epoch 40 save_ep 20 save_latest_ep 5 eval_ep 1000000 $COMMON
echo "=== NHR eval (held-out view 3) ==="
python run.py --type evaluate --cfg_file configs/baselines/nhr_s9p.yaml exp_name nhr_long $COMMON 2>&1 | tail -3
echo "=== NHR eval (training view 0) ==="
python run.py --type evaluate --cfg_file configs/baselines/nhr_s9p.yaml exp_name nhr_long test_view "0," $COMMON 2>&1 | tail -3

python train_net.py --cfg_file configs/baselines/nt_s9p.yaml exp_name nt_long resume False \
  ep_iter 100 train.epoch 40 save_ep 20 save_latest_ep 5 eval_ep 1000000 $COMMON
echo "=== NT eval (held-out view 3) ==="
python run.py --type evaluate --cfg_file configs/baselines/nt_s9p.yaml exp_name nt_long $COMMON 2>&1 | tail -3
echo "=== NT eval (training view 0) ==="
python run.py --type evaluate --cfg_file configs/baselines/nt_s9p.yaml exp_name nt_long test_view "0," $COMMON 2>&1 | tail -3
echo ALL_DONE
