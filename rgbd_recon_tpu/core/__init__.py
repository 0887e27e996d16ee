from .grid import BoundingBox, VolumeGrid, BrickGrid
from .camera import PinholeCamera, SensorRig
from .cache import enable_compile_cache
from .config import PipelineConfig, parse_conf, parse_ks, SceneDescription

__all__ = [
    "enable_compile_cache",
    "BoundingBox",
    "VolumeGrid",
    "BrickGrid",
    "PinholeCamera",
    "SensorRig",
    "PipelineConfig",
    "parse_conf",
    "parse_ks",
    "SceneDescription",
]
