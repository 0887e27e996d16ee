from .grid import BoundingBox, VolumeGrid, BrickGrid
from .camera import PinholeCamera, SensorRig
from .config import PipelineConfig, parse_conf, parse_ks, SceneDescription

__all__ = [
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
