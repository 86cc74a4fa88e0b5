#!/bin/bash
# VERDICT-r2 item 1: prove the SDF flagship actually CONVERGES.
#
# Round 2's long-schedule SDF runs plateaued at ~19.x dB / 101 mm chamfer on
# the Gaussian-blob subject — a soft density cloud a watertight-surface prior
# cannot represent (BASELINE.md round-2 analysis). This protocol reruns the
# same schedule on the WATERTIGHT capsule-union subject
# (data/synthetic.py subject="capsule"): analytic 1-Lipschitz posed SDF,
# hard silhouette masks, exact GT isosurface meshes. Reference behavior
# being validated: anisdf_pdf_network.py:156-224 + sdf_mesh_renderer.py:51-111.
#
# Runs: SDF-PDF 60k steps (30% of the reference 200k schedule), NeuS 20k
# (10%), and an 8k-step NeRF-PDF density-family control for the same-subject
# chamfer comparison. 12 training views, eval on training view 0 + HELD-OUT
# view 12, mesh metrics vs the analytic GT.
set -e
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}
ROOT=${SYNTHCAP14_ROOT:-/tmp/synthcap14}/human
SDF_EPOCHS=${SDF_EPOCHS:-120}   # 60k steps = 30% of the reference schedule
NEUS_EPOCHS=${NEUS_EPOCHS:-40}  # 20k steps = 10%
CTRL_EPOCHS=${CTRL_EPOCHS:-16}  # 8k-step density-family control
EXP=${EXP:-synthcap14_sdf_long}
NEUS_EXP=${NEUS_EXP:-synthcap14_neus_long}
CTRL_EXP=${CTRL_EXP:-synthcap14_nerfpdf_ctrl}
COMMON="train_dataset.data_root $ROOT train_dataset.ann_file $ROOT/annots.npy test_dataset.data_root $ROOT test_dataset.ann_file $ROOT/annots.npy H 256 W 256 training_view [0,1,2,3,4,5,6,7,8,9,10,11] num_train_frame 16 num_eval_frame 4 train_dataset_module tpose_pdf test_dataset_module tpose_pdf use_bigpose True tpose_viewdir True init_sdf '' norm_th 0.1"

# dataset + GT meshes (idempotent; capsule subject, 20 poses, 14 views)
python tools/quality_runs/generate_capsule_dataset.py

run_family () { # $1=exp $2=network_module $3=epochs
  echo "=== $2 stage 1: $(($3 * 500)) steps, 12 views ==="
  python train_net.py --cfg_file configs/synthetic.yaml exp_name $1 resume False \
    $COMMON network_module $2 \
    N_rand 1024 ep_iter 500 train.epoch $3 train.steps_per_dispatch 16 \
    save_ep $3 save_latest_ep 8 eval_ep 1000000
  echo "=== $2 eval: training view 0 ==="
  python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $1 $COMMON network_module $2 test_view "0," test.frame_sampler_interval 4 2>&1 | tail -3
  echo "=== $2 eval: HELD-OUT view 12 ==="
  python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $1 $COMMON network_module $2 test_view "12," test.frame_sampler_interval 4 2>&1 | tail -3
}

run_family $EXP sdf_pdf $SDF_EPOCHS
echo "=== SDF mesh metrics (canonical mc + re-pose vs analytic GT) ==="
# opts win over the mesh_cfg overlay (like the reference), so restore the
# canonical-grid mesh dataset after COMMON's test_dataset_module
python run.py --type visualize --cfg_file configs/synthetic.yaml exp_name $EXP $COMMON network_module sdf_pdf vis_posed_mesh True \
  test_dataset_module lib.datasets.anisdf_mesh_dataset mesh_th 0.0 2>&1 | tail -5

run_family $NEUS_EXP neus_pdf $NEUS_EPOCHS
echo "=== NeuS mesh metrics ==="
python run.py --type visualize --cfg_file configs/synthetic.yaml exp_name $NEUS_EXP $COMMON network_module neus_pdf vis_posed_mesh True \
  test_dataset_module lib.datasets.anisdf_mesh_dataset mesh_th 0.0 2>&1 | tail -5

run_family $CTRL_EXP nerf_pdf $CTRL_EPOCHS
echo "=== density-family control mesh metrics (same subject/protocol) ==="
python run.py --type visualize --cfg_file configs/synthetic.yaml exp_name $CTRL_EXP $COMMON network_module nerf_pdf vis_posed_mesh True \
  test_dataset_module lib.datasets.aninerf_pdf_mesh_dataset mesh_th 50 2>&1 | tail -5
echo ALL_DONE
