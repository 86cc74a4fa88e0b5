#!/bin/bash
# VERDICT-r1 item 6: exercise the CONVERTED-VGG19 perceptual objective
# end to end. ImageNet weights cannot be bundled, so a locally
# initialized torchvision-layout VGG19 head (random but SHARED through
# the converter) stands in: the point is that the convert -> load ->
# train-on-TPU path runs the real objective, and that a fixed-features
# perceptual loss trains at least as well as the multi-scale stand-in
# on training-view PSNR at fixed steps. BASELINE.md: "converted-VGG19
# NHR run".
set -e
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}
ROOT=${SYNTH_NHR_ROOT:-/tmp/synth_nhr}/human
NPZ=${NPZ:-/tmp/vgg19_head_local.npz}
COMMON="train_dataset.data_root $ROOT train_dataset.ann_file $ROOT/annots.npy train_dataset.human synthetic test_dataset.data_root $ROOT test_dataset.ann_file $ROOT/annots.npy test_dataset.human synthetic training_view [0,1,2] num_train_frame 4 H 128 W 128 ratio 1.0 test.sampler FrameSampler test.frame_sampler_interval 1 vertices vertices params params"

# 1. author a torchvision-layout vgg19 head locally and convert it
python - <<EOF
import torch, torch.nn as nn
torch.manual_seed(0)
# first 8 entries of torchvision vgg19.features: conv,relu,conv,relu,pool? -
# the converter reads features.{0,2,5,7}.weight/bias (the four head convs)
feats = nn.Sequential(
    nn.Conv2d(3, 64, 3, padding=1), nn.ReLU(),
    nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(), nn.MaxPool2d(2),
    nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(),
    nn.Conv2d(128, 128, 3, padding=1),
)
sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
torch.save(sd, "/tmp/vgg19_local.pth")
print("authored /tmp/vgg19_local.pth")
EOF
python tools/convert_vgg_weights.py --arch vgg19_head \
    --pth /tmp/vgg19_local.pth --out $NPZ

# 2. NHR with the converted-VGG19 objective (real perceptual path on TPU)
python train_net.py --cfg_file configs/baselines/nhr_s9p.yaml exp_name nhr_vgg resume False \
  ep_iter 100 train.epoch 20 save_ep 20 save_latest_ep 5 eval_ep 1000000 \
  train.vgg_weights $NPZ $COMMON
echo "=== NHR + converted VGG19 eval (training view 0) ==="
python run.py --type evaluate --cfg_file configs/baselines/nhr_s9p.yaml exp_name nhr_vgg test_view "0," $COMMON 2>&1 | tail -3

# 3. control: the multi-scale stand-in at identical steps
python train_net.py --cfg_file configs/baselines/nhr_s9p.yaml exp_name nhr_standin resume False \
  ep_iter 100 train.epoch 20 save_ep 20 save_latest_ep 5 eval_ep 1000000 $COMMON
echo "=== NHR stand-in eval (training view 0) ==="
python run.py --type evaluate --cfg_file configs/baselines/nhr_s9p.yaml exp_name nhr_standin test_view "0," $COMMON 2>&1 | tail -3
echo ALL_DONE
