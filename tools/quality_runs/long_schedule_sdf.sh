#!/bin/bash
# VERDICT-r1 item 3: long-schedule SDF-family quality runs with SDF mesh
# metrics. SDF-PDF at >=30% of the reference's 200k-step schedule and
# NeuS at >=10%, on the camera-rich 14-view subject (12 training views),
# then PSNR/SSIM evals + the SDF mesh path (canonical marching cubes +
# inverse-displacement re-pose, engine.canonical_sdf_mesh; reference
# sdf_mesh_renderer.py:51-111) scored chamfer/P2S against the analytic
# GT isosurfaces. BASELINE.md: "long-schedule SDF" section.
set -e
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}
ROOT=${SYNTHV14_ROOT:-/tmp/synthv14}/human
SDF_EPOCHS=${SDF_EPOCHS:-120}   # 60k steps = 30% of the reference schedule
NEUS_EPOCHS=${NEUS_EPOCHS:-40}  # 20k steps = 10%
EXP=${EXP:-synthv14_sdf_long}
NEUS_EXP=${NEUS_EXP:-synthv14_neus_long}
COMMON="train_dataset.data_root $ROOT train_dataset.ann_file $ROOT/annots.npy test_dataset.data_root $ROOT test_dataset.ann_file $ROOT/annots.npy H 256 W 256 training_view [0,1,2,3,4,5,6,7,8,9,10,11] num_train_frame 16 num_eval_frame 4 train_dataset_module tpose_pdf test_dataset_module tpose_pdf use_bigpose True tpose_viewdir True init_sdf ''"

# GT meshes for chamfer/P2S (idempotent)
python - <<EOF
import jax; jax.config.update("jax_platforms", "cpu")
from animatable_nerf_tpu.data.synthetic import write_gt_meshes
import os
if not os.path.exists(os.path.join("$ROOT", "object")):
    # synthv14 generation params (tools/quality_runs/generate_datasets.sh)
    write_gt_meshes("$ROOT", n_verts=1380, n_blobs=256, seed=3)
print("GT meshes ready")
EOF

echo "=== SDF-PDF stage 1: $((SDF_EPOCHS * 500)) steps (30% schedule), 12 views ==="
python train_net.py --cfg_file configs/synthetic.yaml exp_name $EXP resume False \
  $COMMON network_module sdf_pdf \
  N_rand 1024 ep_iter 500 train.epoch $SDF_EPOCHS train.steps_per_dispatch 16 \
  save_ep $SDF_EPOCHS save_latest_ep 8 eval_ep 1000000
echo "=== SDF eval: training view 0 ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP $COMMON network_module sdf_pdf test_view "0," test.frame_sampler_interval 4 2>&1 | tail -3
echo "=== SDF eval: HELD-OUT view 12 ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $EXP $COMMON network_module sdf_pdf test_view "12," test.frame_sampler_interval 4 2>&1 | tail -3
echo "=== SDF mesh metrics (canonical mc + re-pose vs analytic GT) ==="
# the SDF families use the canonical-grid mesh dataset + sdf mesh
# renderer (reference configs/sdf_pdf_*: mesh_cfg); COMMON's
# test_dataset_module opt would stomp the mesh_cfg overlay (opts win,
# like the reference), so override it back after COMMON
python run.py --type visualize --cfg_file configs/synthetic.yaml exp_name $EXP $COMMON network_module sdf_pdf vis_posed_mesh True \
  test_dataset_module lib.datasets.anisdf_mesh_dataset mesh_th 0.0 2>&1 | tail -5

echo "=== NeuS: $((NEUS_EPOCHS * 500)) steps (10% schedule), 12 views ==="
python train_net.py --cfg_file configs/synthetic.yaml exp_name $NEUS_EXP resume False \
  $COMMON network_module neus_pdf \
  N_rand 1024 ep_iter 500 train.epoch $NEUS_EPOCHS train.steps_per_dispatch 16 \
  save_ep $NEUS_EPOCHS save_latest_ep 8 eval_ep 1000000
echo "=== NeuS eval: training view 0 ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $NEUS_EXP $COMMON network_module neus_pdf test_view "0," test.frame_sampler_interval 4 2>&1 | tail -3
echo "=== NeuS eval: HELD-OUT view 12 ==="
python run.py --type evaluate --cfg_file configs/synthetic.yaml exp_name $NEUS_EXP $COMMON network_module neus_pdf test_view "12," test.frame_sampler_interval 4 2>&1 | tail -3
echo "=== NeuS mesh metrics ==="
python run.py --type visualize --cfg_file configs/synthetic.yaml exp_name $NEUS_EXP $COMMON network_module neus_pdf vis_posed_mesh True \
  test_dataset_module lib.datasets.anisdf_mesh_dataset mesh_th 0.0 2>&1 | tail -5
echo ALL_DONE
