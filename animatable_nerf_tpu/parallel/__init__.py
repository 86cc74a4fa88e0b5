from .mesh import make_mesh, shard_batch, replicate
from .eval_sharding import render_image_sharded
