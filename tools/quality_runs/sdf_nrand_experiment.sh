#!/bin/bash
# VERDICT-r4 item 3: attack the intrinsic SDF silhouette-BCE training
# oscillation (BASELINE.md round-4: crash-recovery events at B=1 /
# N_rand 1024, img_loss spiking ~8x, PSNR dropping 4-7 dB and settling
# below peak) using the measured ~10x train-step throughput headroom.
#
# Treatment: N_rand 4096 (4x the reference's ray budget = 2x lower
# gradient noise) on the SAME capsule 26k-step protocol as the three
# archived control curves (sdf_curve_r04_scalars.jsonl.txt etc.),
# uncapped alpha schedule, eval every 2k steps on training view 0 +
# held-out view 12. Secondary arm (RUN_EMA=1): N_rand 1024 with
# parameter-EMA evaluation — tests whether smoothing the ITERATES
# rather than the gradients suffices.
#
# Verdict criterion: does the 8x loss-spike / 4-7 dB crash class
# disappear from the treatment curve? (win or measured negative —
# either goes in BASELINE.md.)
set -e
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}
ROOT=${SYNTHCAP14_ROOT:-/tmp/synthcap14}/human
EPOCHS=${EPOCHS:-52}    # 26k steps — the control protocol's length
NRAND=${NRAND:-4096}
EXP=${EXP:-capsdf_nrand${NRAND}}
# throughput opts appended AFTER the protocol opts (later opts win):
# e.g. train_keep_frac (exact gradients absent overflow) and
# compute_dtype bfloat16 — recorded with the artifact when used
EXTRA_TRAIN=${EXTRA_TRAIN:-}
COMMON="train_dataset.data_root $ROOT train_dataset.ann_file $ROOT/annots.npy \
test_dataset.data_root $ROOT test_dataset.ann_file $ROOT/annots.npy \
H 256 W 256 training_view [0,1,2,3,4,5,6,7,8,9,10,11] \
num_train_frame 16 num_eval_frame 4 \
train_dataset_module tpose_pdf test_dataset_module tpose_pdf \
use_bigpose True tpose_viewdir True init_sdf '' norm_th 0.1 \
network_module sdf_pdf"

python tools/quality_runs/generate_capsule_dataset.py

echo "=== SDF-PDF treatment: N_rand $NRAND, $((EPOCHS * 500)) steps ==="
python train_net.py --cfg_file configs/synthetic.yaml exp_name $EXP \
  resume ${RESUME:-False} $COMMON \
  N_rand $NRAND ep_iter 500 train.epoch $EPOCHS train.steps_per_dispatch 8 \
  save_ep $EPOCHS save_latest_ep 8 eval_ep 4 test_view "0,12" \
  test.frame_sampler_interval 8 $EXTRA_TRAIN
echo "=== final evals (best.flax preferred) ==="
for V in 0 12; do
  python run.py --type evaluate --cfg_file configs/synthetic.yaml \
    exp_name $EXP $COMMON test_view "$V," \
    test.frame_sampler_interval 4 2>&1 | tail -3
done
echo "curve: data/record/deform/$EXP/scalars.jsonl (val lines)"
echo ALL_DONE
