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

    # the perturbed sensor's residual must shrink substantially
    assert res_after[1] < res_before[1] * 0.7, (res_before, res_after)
    # and its estimated translation should point opposite the injected
    # offset (the correction moves its points back onto the fused surface)
    t = np.asarray(poses[1, 3:])
    assert np.linalg.norm(t) > 0.005
    # the correction direction should have a clear -x component
    assert t[0] < 0.0
