"""Render-config sweep at reference scale: quantify each march lever."""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from rgbd_recon_tpu.core.cache import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from rgbd_recon_tpu.calib import build_synthetic_calibration
from rgbd_recon_tpu.core import BoundingBox, PipelineConfig
from rgbd_recon_tpu.recon import TsdfPipeline
from rgbd_recon_tpu.ops.raymarch import ViewCamera
from rgbd_recon_tpu.sensors import (
    SyntheticScene, default_test_rig, render_rig_frames,
)


def sync(*arrays):
    for a in arrays:
        np.asarray(jax.device_get(jnp.ravel(a)[0]))


bbox = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
rig = default_test_rig(num_sensors=4, depth_size=(512, 424),
                       color_size=(1280, 1080), bbox=bbox)
print("baking calibration...", flush=True)
calib = build_synthetic_calibration(rig, bbox, cv_res=(128, 256, 128),
                                    inv_res=(200, 220, 200))
scene = SyntheticScene(spheres=[((0.0, 1.1, 0.0), 0.55), ((0.4, 0.6, 0.3), 0.25)])
frames = render_rig_frames(scene, rig)
base = PipelineConfig(voxel_size=0.01, brick_size=0.1, tsdf_limit=0.01,
                      num_lods=7)
pipe0 = TsdfPipeline(calib, base, bbox)
volume, maps, counts = pipe0.fuse(frames)
sync(volume)
cam = ViewCamera(width=1280, height=720, eye=(0.0, 1.3, 2.6),
                 target=(0.0, 1.1, 0.0))

variants = [
    ("baseline", {}),
    ("ray_compaction 0.25", {"ray_compaction": 0.25}),
    ("phase1 16", {"march_phase1_steps": 16}),
    ("step_frac 0.125", {"interval_step_frac": 0.125}),
    ("colorfill off", {"colorfill": False}),
    ("hit_compaction 0.35", {"hit_compaction": 0.35}),
]

for name, kw in variants:
    cfg = dataclasses.replace(base, **kw)
    pipe = TsdfPipeline.__new__(TsdfPipeline)
    pipe.__dict__.update(pipe0.__dict__)  # reuse baked projections
    pipe.config = cfg
    if hasattr(pipe, "_projection_models"):
        pass
    renderer = pipe.make_renderer(cam)
    out = renderer(volume, maps, counts)
    sync(out.color)
    t0 = time.perf_counter()
    for _ in range(5):
        out = renderer(volume, maps, counts)
    sync(out.color)
    dt = (time.perf_counter() - t0) / 5 * 1000
    print(f"{name:28s} {dt:8.2f} ms  hits {int(np.asarray(out.hit).sum()):6d}  "
          f"overflow {np.asarray(out.overflow)}", flush=True)
