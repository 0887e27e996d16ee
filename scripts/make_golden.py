"""Generate the committed golden full-pipeline fixture.

Builds the small deterministic scene, runs the JAX preprocess chain (whose
passes are individually oracle-tested in tests/test_preprocess.py), then
runs the INDEPENDENT NumPy pipeline (tests/golden_np.py: integrate ->
dense trilinear march -> secant -> blendColors -> window depth ->
pull-push) on the preprocessed maps and stores inputs + NumPy outputs in
tests/golden/golden_small.npz. tests/test_golden.py regression-tests the
JAX exact-parity pipeline against this fixture.

Run (CPU): python scripts/make_golden.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


# single source of truth for the fixture's scene + camera + config
SCENE = dict(
    num_sensors=2, depth_size=(48, 40), color_size=(64, 48),
    cv_res=(16, 24, 16), inv_res=(32, 36, 32),
    voxel_size=0.0625, brick_size=0.25, tsdf_limit=0.02, num_lods=4,
    width=48, height=40, eye=(0.0, 1.3, 2.6), target=(0.0, 1.1, 0.0),
    fov_y=50.0, near=0.1, far=20.0,
)


def build_scene():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from rgbd_recon_tpu.calib.sensors import build_synthetic_calibration
    from rgbd_recon_tpu.core.config import PipelineConfig
    from rgbd_recon_tpu.core.grid import BoundingBox
    from rgbd_recon_tpu.recon import TsdfPipeline
    from rgbd_recon_tpu.sensors.synthetic import (
        SyntheticScene,
        default_test_rig,
        render_rig_frames,
    )

    s = SCENE
    bbox = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
    rig = default_test_rig(
        num_sensors=s["num_sensors"], depth_size=s["depth_size"],
        color_size=s["color_size"], bbox=bbox,
    )
    calib = build_synthetic_calibration(
        rig, bbox, cv_res=s["cv_res"], inv_res=s["inv_res"]
    )
    frames = render_rig_frames(
        SyntheticScene(spheres=[((0.0, 1.1, 0.0), 0.55)]), rig
    )
    # exact-parity configuration: trilinear march, no space skipping, no
    # bricking (dense integrate), volume-lookup blending
    cfg = PipelineConfig(
        voxel_size=s["voxel_size"], brick_size=s["brick_size"],
        tsdf_limit=s["tsdf_limit"], num_lods=s["num_lods"],
        bricking=False, skip_space=False, march_mode="trilinear",
        march_empty_skip=False, integrate_taps="bilinear",
        projection_model=False, march_dtype="float32", mark_stride=1,
    )
    pipe = TsdfPipeline(calib, cfg, bbox)
    return pipe, frames, bbox, calib


def main():
    import golden_np

    pipe, frames, bbox, calib = build_scene()
    s = SCENE
    maps, counts = pipe.preprocess(frames)

    maps_np = {
        "depth": np.asarray(maps.depth[..., 0]),
        "quality": np.asarray(maps.quality),
        "silhouette": np.asarray(maps.silhouette),
        "color": np.asarray(maps.color),
    }

    vol_np = golden_np.integrate(
        pipe.volume_grid.shape, np.asarray(calib.cv_xyz_inv),
        maps_np["depth"], maps_np["quality"], maps_np["silhouette"],
        s["tsdf_limit"],
    )
    max_steps = int(np.ceil(np.sqrt(3.0) / (s["tsdf_limit"] * 0.5)))
    color, depth, hit, _g = golden_np.render(
        vol_np, maps_np["color"], maps_np["depth"], maps_np["quality"],
        np.asarray(calib.cv_xyz_inv), np.asarray(calib.cv_uv),
        np.asarray(bbox.min), np.asarray(bbox.max),
        s["width"], s["height"], s["eye"], s["target"], s["fov_y"],
        s["near"], s["far"], s["tsdf_limit"], s["num_lods"], max_steps,
    )

    outdir = os.path.join(REPO, "tests", "golden")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "golden_small.npz")
    np.savez_compressed(
        path,
        volume=vol_np, color=color, depth=depth, hit=hit,
        maps_depth=maps_np["depth"], maps_quality=maps_np["quality"],
        maps_silhouette=maps_np["silhouette"], maps_color=maps_np["color"],
    )
    print(f"wrote {path}: volume {vol_np.shape}, "
          f"hit px {int(hit.sum())}, "
          f"{os.path.getsize(path) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
