"""Runtime calibration container — the device-resident lookup volumes.

Replaces the reference's CalibVolumes (framework/calibration/CalibVolumes.cpp)
which owns per-sensor GL 3D textures bound to fixed texture units. Here the
set is a single pytree of stacked jnp arrays (leading sensor axis) so every
kernel can vmap over sensors and XLA sees one fused gather per lookup.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.camera import SensorRig
from ..core.grid import BoundingBox
from .bake import bake_cv_xyz, bake_cv_uv, bake_cv_xyz_inv_analytic
from .frustum import frustum_from_cv_xyz


@struct.dataclass
class SensorCalibration:
    """Single-sensor baked calibration (host-side staging)."""

    cv_xyz: jnp.ndarray       # (D, H, W, 3)
    cv_uv: jnp.ndarray        # (D, H, W, 2)
    cv_xyz_inv: jnp.ndarray   # (Dz, Hy, Wx, 4)
    depth_limits: jnp.ndarray  # (2,) near/far meters
    camera_position: jnp.ndarray  # (3,) world


@struct.dataclass
class CalibrationSet:
    """All sensors, stacked. The runtime equivalent of CalibVolumes +
    CalibrationFiles (+ the bbox UBO, CalibVolumes.cpp:45-49)."""

    cv_xyz: jnp.ndarray        # (N, D, H, W, 3)
    cv_uv: jnp.ndarray         # (N, D, H, W, 2)
    cv_xyz_inv: jnp.ndarray    # (N, Dz, Hy, Wx, 4)
    depth_limits: jnp.ndarray  # (N, 2)
    camera_positions: jnp.ndarray  # (N, 3)
    bbox_min: jnp.ndarray      # (3,)
    bbox_max: jnp.ndarray      # (3,)

    @property
    def num_sensors(self) -> int:
        return self.cv_xyz.shape[0]

    @property
    def bbox(self) -> BoundingBox:
        return BoundingBox(
            min=tuple(np.asarray(self.bbox_min).tolist()),
            max=tuple(np.asarray(self.bbox_max).tolist()),
        )


def build_synthetic_calibration(
    rig: SensorRig,
    bbox: BoundingBox,
    cv_res: Tuple[int, int, int] = (32, 64, 32),
    inv_res: Tuple[int, int, int] = (64, 64, 64),
) -> CalibrationSet:
    """Bake a full calibration set from analytic sensors.

    cv_res is the sensor-space volume resolution (W, H, D) — the reference
    ships 128 x 256 x 128 (SURVEY.md §0); tests use smaller. inv_res is the
    world-grid resolution (X, Y, Z) of the inverse volumes.
    """
    cv_xyz_list, cv_uv_list, inv_list, limits, campos = [], [], [], [], []
    for sensor in rig.sensors:
        cv_xyz = bake_cv_xyz(sensor, cv_res)
        cv_xyz_list.append(cv_xyz)
        cv_uv_list.append(bake_cv_uv(sensor, cv_res))
        inv_list.append(bake_cv_xyz_inv_analytic(sensor, bbox, inv_res))
        limits.append([sensor.depth.near, sensor.depth.far])
        # camera position recovered the reference way — from the frustum
        # apex of the baked volume (CalibVolumes.cpp:224-230) — so that any
        # bake/parse path yields consistent positions.
        campos.append(frustum_from_cv_xyz(cv_xyz).camera_position())

    return CalibrationSet(
        cv_xyz=jnp.asarray(np.stack(cv_xyz_list)),
        cv_uv=jnp.asarray(np.stack(cv_uv_list)),
        cv_xyz_inv=jnp.asarray(np.stack(inv_list)),
        depth_limits=jnp.asarray(np.array(limits, np.float32)),
        camera_positions=jnp.asarray(np.stack(campos)),
        bbox_min=jnp.asarray(np.array(bbox.min, np.float32)),
        bbox_max=jnp.asarray(np.array(bbox.max, np.float32)),
    )
