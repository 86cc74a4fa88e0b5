from .image import ImageVisualizer, NovelViewVisualizer, PoseSequenceVisualizer
from .mesh import MeshVisualizer
