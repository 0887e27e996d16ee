"""End-to-end pipeline tests: the config-4 milestone — 4-sensor fusion,
bricking, rendering, surface accuracy vs the analytic scene."""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_recon_tpu.calib.sensors import build_synthetic_calibration
from rgbd_recon_tpu.core.config import PipelineConfig
from rgbd_recon_tpu.core.grid import BoundingBox
from rgbd_recon_tpu.ops.raymarch import ViewCamera
from rgbd_recon_tpu.recon import TsdfPipeline
from rgbd_recon_tpu.sensors.synthetic import (
    SyntheticScene,
    default_test_rig,
    render_rig_frames,
)

BBOX = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
SPHERE = ((0.0, 1.1, 0.0), 0.55)


@pytest.fixture(scope="module")
def setup():
    rig = default_test_rig(num_sensors=4, bbox=BBOX)
    calib = build_synthetic_calibration(
        rig, BBOX, cv_res=(24, 32, 24), inv_res=(40, 44, 40)
    )
    scene = SyntheticScene(spheres=[SPHERE])
    frames = render_rig_frames(scene, rig)
    cfg = PipelineConfig(
        voxel_size=0.05, brick_size=0.25, tsdf_limit=0.02, num_lods=5
    )
    pipe = TsdfPipeline(calib, cfg, BBOX)
    volume, maps, counts = pipe.fuse(frames)
    return rig, calib, scene, frames, pipe, volume, maps, counts


def test_fusion_produces_band(setup):
    _, _, scene, _, pipe, volume, _, counts = setup
    vol = np.asarray(volume)
    limit = pipe.config.tsdf_limit
    band = (np.abs(vol) < limit) & (vol != -limit)
    assert band.sum() > 100


def test_brick_occupancy_sane(setup):
    _, _, _, _, pipe, _, _, counts = setup
    occ = np.asarray(counts) > pipe.config.min_voxels_per_brick
    ratio = occ.mean()
    # sphere surface should occupy a small but nonzero fraction
    assert 0.01 < ratio < 0.5


def test_render_hits_sphere_surface(setup):
    _, _, scene, _, pipe, volume, maps, counts = setup
    cam = ViewCamera(width=64, height=56, eye=(0.0, 1.2, 2.5), target=(0.0, 1.1, 0.0))
    out = pipe.make_renderer(cam)(volume, maps, counts)
    hit = np.asarray(out.hit)
    assert hit.sum() > 200

    # reconstruct hit world positions from depth: compare against the SDF.
    # use the num_samples/hit mask + the renderer's window depth inversion.
    color = np.asarray(out.color)
    assert color[hit].max() > 0.05  # non-black surface
    # background is black
    assert color[~hit & (np.asarray(out.depth) >= 1.0)].max() == 0.0


def test_surface_accuracy(setup):
    """Surface RMSE vs the analytic sphere — the BASELINE.md parity metric."""
    _, _, scene, _, pipe, volume, maps, counts = setup
    cam = ViewCamera(width=64, height=56, eye=(0.0, 1.2, 2.5), target=(0.0, 1.1, 0.0))
    # march directly (bypasses shading) for geometric check
    from rgbd_recon_tpu.ops import raymarch as rm

    eye_vol = jnp.asarray(BBOX.normalize(np.asarray(cam.eye, np.float32)))
    dirs = jnp.asarray(cam.ray_directions_world() / BBOX.size)
    hit, hit_pos, _ = rm.march(volume, eye_vol, dirs, pipe.config.tsdf_limit, 400)
    hit = np.asarray(hit)
    world = BBOX.denormalize(np.asarray(hit_pos))
    sd = np.abs(scene.sdf(world[hit]))
    # voxel size is 5 cm, truncation band 8 cm metric: the bulk of the
    # surface must land well within a voxel; grazing/silhouette rays
    # contribute a small heavy tail (same artifact class as the reference's
    # GL pipeline at equal resolution), so assert median + p90.
    assert np.median(sd) < 0.03, f"median surface error {np.median(sd)}"
    assert np.percentile(sd, 90) < 0.09, f"p90 surface error {np.percentile(sd, 90)}"


def test_double_integration_idempotent(setup):
    """Re-fusing the same frame yields the same volume (pure function)."""
    _, _, _, frames, pipe, volume, _, _ = setup
    volume2, _, _ = pipe.fuse(frames)
    np.testing.assert_array_equal(np.asarray(volume), np.asarray(volume2))


def test_empty_frames_no_surface(setup):
    rig, calib, _, frames, pipe, _, _, _ = setup
    empty = frames.replace(
        depths=jnp.zeros_like(frames.depths), colors=jnp.zeros_like(frames.colors)
    )
    volume, maps, counts = pipe.fuse(empty)
    assert (np.asarray(counts) == 0).all()
    # fully carved/unoccupied volume -> no positive densities anywhere
    assert (np.asarray(volume) <= 0).all()
    cam = ViewCamera(width=32, height=24, eye=(0.0, 1.2, 2.5))
    out = pipe.make_renderer(cam)(volume, maps, counts)
    assert not np.asarray(out.hit).any()
