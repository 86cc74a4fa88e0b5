#!/bin/bash
# VERDICT-r1 item 5: first end-to-end train->eval cycles for the three
# previously-untrained ablation families (AlignedPBW / AlignedSMPL /
# AlignedLBWPDF; reference aligned_aninerf_{pbw,smpl,lbw_pdf}_network +
# extension.sh). Short runs (default 8 epochs = 4k steps) on the 20-pose
# 5-view synthetic subject via the production CLI. BASELINE.md:
# "ablation family" section.
set -e
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}
ROOT=${SYNTH256_ROOT:-/tmp/synth256}/human
EPOCHS=${EPOCHS:-8}
COMMON="train_dataset.data_root $ROOT train_dataset.ann_file $ROOT/annots.npy test_dataset.data_root $ROOT test_dataset.ann_file $ROOT/annots.npy H 256 W 256 training_view [0,1,2,3] num_train_frame 16 num_eval_frame 4 train_dataset_module tpose_pdf test_dataset_module tpose_pdf use_bigpose True tpose_viewdir True init_sdf ''"

for MOD in aligned_pbw aligned_smpl aligned_lbw_pdf; do
  EXP=synth256_${MOD}
  echo "=== $MOD: $((EPOCHS * 500)) steps ==="
  python train_net.py --cfg_file configs/synthetic.yaml exp_name $EXP resume False \
    $COMMON network_module $MOD \
    N_rand 1024 ep_iter 500 train.epoch $EPOCHS train.steps_per_dispatch 16 \
    save_ep $EPOCHS save_latest_ep 4 eval_ep 1000000
  echo "=== $MOD eval: training view 0 ==="
  python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP \
    $COMMON network_module $MOD test_view "0," test.frame_sampler_interval 4 2>&1 | tail -3
  echo "=== $MOD eval: HELD-OUT view 4 ==="
  python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP \
    $COMMON network_module $MOD test_view "4," test.frame_sampler_interval 4 2>&1 | tail -3
done
echo ALL_DONE
