"""Multi-view texturing reconstruction (mode 3).

Re-design of ReconMVT (framework/reconstruction/recon_mvt.cpp +
glsl/mvt_accum.{vs,gs,fs}). The reference's mode-3 draw() is disabled — it
prints "not implemented any more" and returns (recon_mvt.cpp:84-86) — but
the capability it documents is: the trigrid accumulation pipeline driven by
*raw* (unfiltered) depths with the bilateral filter applied inline in the
vertex stage (mvt_accum.vs:43-98, bound to the raw-depth texture at unit 40,
recon_mvt.cpp:32).

Here that is re-enabled: raw metric depth is normalized + bilateral-filtered
on the fly (the same 13x13 depth-adaptive kernel as ops/preprocess
.bilateral_lab, which is the filter mvt_accum.vs inlines), then fed through
the identical visibility-epsilon accumulation as mode 2.
"""

from __future__ import annotations

import jax

from ..calib.sensors import CalibrationSet
from ..core.config import PipelineConfig
from ..ops.preprocess import SensorMaps, bilateral_lab
from ..ops.raymarch import ViewCamera
from .trigrid import TrigridPipeline


class MvtPipeline(TrigridPipeline):
    """mode-3 strategy: trigrid accumulation over in-kernel-filtered RAW
    depth (the reference's original multi-view-texturing variant)."""

    def __init__(self, calib: CalibrationSet, config: PipelineConfig = None,
                 **kw):
        super().__init__(calib, config, **kw)

    def make_render_fn(self, camera: ViewCamera):
        trigrid_render = super().make_render_fn(camera)
        cfg = self.config

        def render(maps: SensorMaps, calib: CalibrationSet):
            # rebuild the depth channel from RAW morphed depth with the
            # in-vertex-stage bilateral (mvt_accum.vs:43-98); colors/quality
            # reuse the standard chain's maps
            def per_sensor(raw_depth, color, cv_xyz, cv_uv, limits):
                depth2, _lab = bilateral_lab(
                    raw_depth, color, cv_xyz, cv_uv,
                    calib.bbox_min, calib.bbox_max, limits,
                    filter_on=cfg.bilateral,
                )
                return depth2

            depth2 = jax.vmap(per_sensor)(
                maps.raw_depth, maps.color, calib.cv_xyz, calib.cv_uv,
                calib.depth_limits,
            )
            maps_mvt = maps.replace(depth=depth2)
            return trigrid_render(maps_mvt, calib)

        return render
