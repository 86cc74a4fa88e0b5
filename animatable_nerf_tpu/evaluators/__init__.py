from .image import ImageEvaluator, psnr_metric, ssim_metric
from .mesh import MeshEvaluator, chamfer_distance, point_to_surface
