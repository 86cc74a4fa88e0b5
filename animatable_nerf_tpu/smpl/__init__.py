"""SMPL body model: loading raw SMPL pickles and running forward LBS.

Replaces the reference's offline SMPL machinery: the vendored smplx
package (lib/utils/smplx/, never imported at runtime — SURVEY.md §2.7)
and the raw-pickle math in the dataset-prep tools
(tools/custom_dataset/prepare_lbs_meta.py:107-134,
 prepare_blend_weights.py:107-155). Used by tools/ to build the lbs/
metadata every dataset requires.
"""

from .body_model import (
    load_smpl,
    SMPLModel,
    big_pose_vector,
    barycentric_interpolation,
    smplx_full_pose,
    smplx_lbs,
    smplx_forward,
    vertices2landmarks,
    extra_joint_ids,
    SMPLX_VERTEX_IDS,
)
from .point_mesh import closest_point_on_mesh
