from .halo import halo_exchange_z
from .mesh import make_mesh, shard_pipeline_step
from .preprocess import shard_preprocess

__all__ = [
    "make_mesh", "shard_pipeline_step", "halo_exchange_z",
    "shard_preprocess",
]
