from .mesh import make_mesh, shard_pipeline_step
from .halo import halo_exchange_z

__all__ = ["make_mesh", "shard_pipeline_step", "halo_exchange_z"]
