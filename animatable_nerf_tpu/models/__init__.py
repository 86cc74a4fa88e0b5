"""Model families: deformation + canonical-field compositions.

Every model is a flax module with the ray-structured signature

    model.apply(params, wpts (R,S,3), viewdir (R,3), z_vals (R,S),
                frame: dict, train: bool) -> dict

returning at least {'raw': (R,S,4)} plus model-specific aux outputs
consumed by the losses (SURVEY.md §2.3). Static shapes + masked compute
replace the reference's boolean point compaction
(tpose_nerf_network.py:149-157 etc.): every sample is evaluated and
filtered samples contribute exactly zero density.
"""

from .aninerf import AniNeRF
from .pdf import NeRFPDF, SDFPDF, NeuSPDF
from .aligned import AlignedLBW, AlignedPBW, AlignedSMPL, AlignedLBWPDF
from .registry import MODELS, make_model
