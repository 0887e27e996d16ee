from .tsdf_pipeline import TsdfPipeline, RenderOutput

__all__ = ["TsdfPipeline", "RenderOutput"]
