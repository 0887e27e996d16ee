"""TSDF / calibration debug visualization (mode 4, "calib vis").

Re-design of ReconCalibs (framework/reconstruction/recon_calibs.cpp +
glsl/calib_vis.{vs,fs}): every voxel center is drawn as a point colored by
its TSDF value —

  tsd > 0          red,  brightness 1 - |tsd|/limit   (calib_vis.fs:19-21)
  tsd <= 0         green, brightness 1 - |tsd|/limit  (:23-24)
  tsd >= +limit    solid blue                          (:26-28)
  tsd <= -limit    discarded                           (:30)

The point cloud is z-buffer splatted into the view (the VS's
vol_to_world * ModelView * Projection path, calib_vis.vs:29-38) — same
scatter renderer as the points mode. `active_kinect` is kept for API parity
with the reference's per-sensor selection (its shader only uses the layer
for commented-out lookups; the TSDF coloring is sensor-independent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import VolumeGrid
from ..ops import splat
from ..ops.raymarch import ViewCamera
from ..ops.tsdf import voxel_centers


class CalibVisPipeline:
    """Debug strategy: renders the TSDF volume itself, no sensor data."""

    def __init__(self, volume_grid: VolumeGrid, tsdf_limit: float = 0.01,
                 active_kinect: int = 0, max_points: int = 1 << 20):
        self.volume_grid = volume_grid
        self.tsdf_limit = float(tsdf_limit)
        self.active_kinect = active_kinect
        # subsample stride keeping the splat count bounded (the reference
        # draws every voxel; at 8.8M points a debug view doesn't need to)
        n = volume_grid.num_voxels
        self.stride = max(1, int(np.ceil((n / max_points) ** (1.0 / 3.0))))

    def set_active_kinect(self, num: int) -> None:
        """API parity with ReconCalibs::setActiveKinect."""
        self.active_kinect = num

    def set_tsdf_limit(self, limit: float) -> None:
        self.tsdf_limit = float(limit)

    def make_renderer(self, camera: ViewCamera, jit_compile: bool = True):
        grid = self.volume_grid
        bbox = grid.bbox
        limit = self.tsdf_limit
        s = self.stride
        bbox_min = jnp.asarray(np.asarray(bbox.min, np.float32))
        bbox_size = jnp.asarray(bbox.size)

        def render(volume: jnp.ndarray):
            vol = volume[::s, ::s, ::s]
            pos = voxel_centers(grid.shape)[::s, ::s, ::s]

            tsd = vol.reshape(-1)
            world = (pos.reshape(-1, 3) * bbox_size + bbox_min)

            t = jnp.clip(jnp.abs(tsd) / limit, 0.0, 1.0)
            bright = 1.0 - t
            red = jnp.stack([bright, jnp.zeros_like(t), jnp.zeros_like(t)], -1)
            green = jnp.stack([jnp.zeros_like(t), bright, jnp.zeros_like(t)], -1)
            blue = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0], jnp.float32), red.shape
            )
            color = jnp.where((tsd > 0.0)[..., None], red, green)
            color = jnp.where((tsd >= limit)[..., None], blue, color)
            valid = tsd > -limit  # discard at <= -limit (calib_vis.fs:30)

            xy, z = splat.project_points(world, camera)
            valid &= z > camera.near
            radius = jnp.ones_like(z) * 0.5

            zbuf = splat.zbuffer_min(
                xy, z, valid, (camera.height, camera.width), radius, max_radius=1
            )
            img, covered = splat.resolve_winners(
                xy, z, valid, color, zbuf, radius=radius, z_tol=1e-4,
                max_radius=1,
            )
            depth_out = jnp.where(
                jnp.isfinite(zbuf), camera.window_depth(zbuf), 1.0
            )
            img = jnp.where(covered[..., None], img, 0.0)
            return img, depth_out, covered

        return jax.jit(render) if jit_compile else render
