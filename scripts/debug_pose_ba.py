"""Debug one refine round at reference scale: raw estimates before
gating, rankings, margins — to see where recovery stalls."""
import dataclasses
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from rgbd_recon_tpu.core.cache import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp

from rgbd_recon_tpu.calib.sensors import build_synthetic_calibration
from rgbd_recon_tpu.core.camera import RGBDSensor, SensorRig
from rgbd_recon_tpu.core.config import PipelineConfig
from rgbd_recon_tpu.core.grid import BoundingBox
from rgbd_recon_tpu.recon import TsdfPipeline
from rgbd_recon_tpu.refine import pose_ba
from rgbd_recon_tpu.sensors.synthetic import (
    SyntheticScene, default_test_rig, render_rig_frames,
)

BBOX = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
rig = default_test_rig(num_sensors=4, depth_size=(512, 424),
                       color_size=(640, 540), bbox=BBOX)
DRIFT_DEG = float(os.environ.get("BA_DRIFT_DEG", "1.0"))
DRIFT_T = [float(v) for v in
           os.environ.get("BA_DRIFT_T", "0.018,0,0.008").split(",")]
th = np.radians(DRIFT_DEG)
E_rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]], np.float32)
E_t = np.array(DRIFT_T, np.float32)
s1 = rig.sensors[1]
bad_depth = dataclasses.replace(
    s1.depth,
    r_cw=tuple(map(tuple, (E_rot @ np.asarray(s1.depth.R)).tolist())),
    t_cw=tuple((E_rot @ np.asarray(s1.depth.t_cw) + E_t).tolist()),
)
bad_rig = SensorRig(sensors=(
    rig.sensors[0],
    RGBDSensor(depth=bad_depth, color=s1.color, serial=s1.serial),
    rig.sensors[2], rig.sensors[3],
))
scene = SyntheticScene(spheres=[((0.0, 1.25, 0.0), 0.45),
                                ((0.45, 0.55, 0.25), 0.28),
                                ((-0.5, 0.75, -0.2), 0.22)])
frames = render_rig_frames(scene, rig)
print("baking calibration...", flush=True)
calib = build_synthetic_calibration(bad_rig, BBOX, cv_res=(64, 128, 64),
                                    inv_res=(200, 220, 200))
cfg = PipelineConfig(voxel_size=0.01, brick_size=0.1, tsdf_limit=0.01)
pipe = TsdfPipeline(calib, cfg, BBOX)
volume, maps, counts = pipe.fuse(frames)

for band_mult, use_obs in ((1.0, True), (1.0, False), (4.0, True)):
    band = cfg.tsdf_limit * band_mult
    if use_obs:
        vols, obs = pose_ba.leave_one_out_volumes(
            pipe, maps, counts, limit=band, return_observers=True)
    else:
        vols = pose_ba.leave_one_out_volumes(pipe, maps, counts, limit=band)
        obs = None
    poses, hist = pose_ba.refine_poses(
        pipe.calib, maps, None, band, iters=8, volumes=vols,
        mask_floor=-max(band * 0.5, cfg.tsdf_limit * 0.999),
        observers=obs, min_observers=2.0,
    )
    res = pose_ba.pose_residual_stats(
        pipe.calib, maps, None, band, volumes=vols)
    p = np.asarray(poses)
    print(f"\nband x{band_mult} obs={use_obs}")
    print("  res rank:", np.asarray(res).round(5),
          "worst:", int(np.argmax(np.asarray(res))),
          "margin ok:", bool(np.asarray(res).max()
                             > 1.12 * np.median(np.asarray(res))))
    print("  |rot| deg:", np.degrees(
        np.linalg.norm(p[:, :3], axis=1)).round(3))
    print("  |t| mm  :", (np.linalg.norm(p[:, 3:], axis=1) * 1000).round(2))
    print("  hist s1 :", np.asarray(hist)[:, 1].round(5))

# ---- truth comparison + apply outcome ------------------------------------
print("\n==== truth comparison ====", flush=True)
c = (np.asarray(BBOX.min) + np.asarray(BBOX.max)) * 0.5
w_true = np.array([0, -th, 0], np.float32)
t_true = (E_rot.T @ (c - E_t) - c).astype(np.float32)
print("truth s1: rot(deg)", np.degrees(np.linalg.norm(w_true)).round(3),
      " t(mm)", (t_true * 1000).round(1))

calib_true = build_synthetic_calibration(rig, BBOX, cv_res=(64, 128, 64),
                                         inv_res=(8, 8, 8))

def calib_error_mm(calib_cur):
    a = np.asarray(calib_cur.cv_xyz[:, 16:112])
    b = np.asarray(calib_true.cv_xyz[:, 16:112])
    return np.linalg.norm(a - b, axis=-1).mean(axis=(1, 2, 3)) * 1000

for use_obs in (True, False):
    band = cfg.tsdf_limit
    if use_obs:
        vols, obs = pose_ba.leave_one_out_volumes(
            pipe, maps, counts, limit=band, return_observers=True)
    else:
        vols = pose_ba.leave_one_out_volumes(pipe, maps, counts, limit=band)
        obs = None
    poses, hist = pose_ba.refine_poses(
        pipe.calib, maps, None, band, iters=8, volumes=vols,
        mask_floor=-cfg.tsdf_limit * 0.999,
        observers=obs, min_observers=2.0,
    )
    p1 = np.asarray(poses)[1]
    print(f"\nobs={use_obs} est s1: rot(deg) "
          f"{np.degrees(np.linalg.norm(p1[:3])).round(3)} "
          f"t(mm) {(p1[3:] * 1000).round(1)}  "
          f"param err: rot {np.degrees(np.linalg.norm(p1[:3] - w_true)).round(3)} deg, "
          f"t {np.linalg.norm(p1[3:] - t_true) * 1000:.1f} mm")
    only1 = np.zeros((4, 6), np.float32)
    only1[1] = p1
    new_calib = pose_ba.apply_pose_corrections(pipe.calib, jnp.asarray(only1))
    print("  calib err after apply:", calib_error_mm(new_calib).round(1))
