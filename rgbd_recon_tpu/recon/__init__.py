from .tsdf_pipeline import TsdfPipeline, RenderOutput
from .points import PointsPipeline
from .trigrid import TrigridPipeline
from .mvt import MvtPipeline
from .calibs import CalibVisPipeline

__all__ = [
    "TsdfPipeline",
    "RenderOutput",
    "PointsPipeline",
    "TrigridPipeline",
    "MvtPipeline",
    "CalibVisPipeline",
]
