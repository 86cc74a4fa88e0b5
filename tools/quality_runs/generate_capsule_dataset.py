"""Generate the watertight capsule-union quality-run subject (idempotent):
20 poses x 14 views at 256^2 + analytic GT isosurface meshes.
See data/synthetic.py subject="capsule" (VERDICT-r2 item 1)."""
import os

import jax

jax.config.update("jax_platforms", "cpu")

from animatable_nerf_tpu.data.synthetic import (  # noqa: E402
    generate_synthetic_dataset,
    write_gt_meshes,
)

root = os.path.join(os.environ.get("SYNTHCAP14_ROOT", "/tmp/synthcap14"), "human")
if not os.path.exists(os.path.join(root, "annots.npy")):
    print("generating 20-pose 14-view 256^2 capsule subject at", root, flush=True)
    generate_synthetic_dataset(
        root, n_frames=20, n_views=14, image_size=256, n_verts=2500, seed=3,
        subject="capsule",
    )
if not os.path.exists(os.path.join(root, "object")):
    print("writing analytic GT isosurface meshes", flush=True)
    write_gt_meshes(root, n_verts=2500, n_blobs=0, seed=3, subject="capsule")
print("capsule dataset ready")
