from .volume_io import read_calibration_volume, write_calibration_volume
from .frustum import Frustum
from .bake import bake_cv_xyz, bake_cv_uv, bake_cv_xyz_inv_analytic
from .inverter import invert_calibration_knn
from .scattered import build_lookup_volume, idw_interpolate, mls_interpolate
from .sensors import SensorCalibration, CalibrationSet, build_synthetic_calibration

__all__ = [
    "build_lookup_volume",
    "idw_interpolate",
    "mls_interpolate",
    "read_calibration_volume",
    "write_calibration_volume",
    "Frustum",
    "bake_cv_xyz",
    "bake_cv_uv",
    "bake_cv_xyz_inv_analytic",
    "invert_calibration_knn",
    "SensorCalibration",
    "CalibrationSet",
    "build_synthetic_calibration",
]
