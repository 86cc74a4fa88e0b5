#!/bin/bash
# Generate the synthetic quality-run subjects (CPU; jitted renderer).
# 5-view 256^2: ~20-30 min. 14-view 256^2: ~50 min. NHR 128^2: ~2 min.
set -e
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/.axon_site:$PWD${PYTHONPATH:+:$PYTHONPATH}

python - <<EOF
import jax; jax.config.update("jax_platforms", "cpu")
from animatable_nerf_tpu.data import generate_synthetic_dataset
import os

root = os.environ.get("SYNTH256_ROOT", "/tmp/synth256")
if not os.path.exists(os.path.join(root, "human", "annots.npy")):
    print("generating 20-pose 5-view 256^2 subject at", root)
    generate_synthetic_dataset(root + "/human", n_frames=20, n_views=5,
                               image_size=256, n_verts=1380, n_blobs=256,
                               seed=3)

root = os.environ.get("SYNTHV14_ROOT", "/tmp/synthv14")
if not os.path.exists(os.path.join(root, "human", "annots.npy")):
    print("generating 20-pose 14-view 256^2 subject at", root)
    generate_synthetic_dataset(root + "/human", n_frames=20, n_views=14,
                               image_size=256, n_verts=1380, n_blobs=256,
                               seed=3)

root = os.environ.get("SYNTH_NHR_ROOT", "/tmp/synth_nhr")
if not os.path.exists(os.path.join(root, "human", "annots.npy")):
    print("generating 4-pose 4-view 128^2 subject at", root)
    generate_synthetic_dataset(root + "/human", n_frames=4, n_views=4,
                               image_size=128, n_verts=1380, n_blobs=256)
print("done")
EOF
