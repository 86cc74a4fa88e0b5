"""Data layer: numpy/cv2 host pipeline mirroring the reference's dataset
formats (annots.npy + params/vertices/lbs trees), ray sampling with the
same body/bound-mask distribution, fixed-size padded batches for jit
stability, and per-host sharding for multi-process training."""

from .dataset import TPoseDataset, TPosePDFDataset
from .novel_view import NovelViewDataset, PoseSequenceDataset
from .mesh_dataset import MeshDataset
from .loader import Loader, FrameSampler, ImageSizeBatchSampler
from .synthetic import generate_synthetic_dataset
from .utils import pad_volume_to, sample_rays_image
