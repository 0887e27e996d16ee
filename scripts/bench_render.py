"""Render-path benchmark at reference scale on the real TPU.

Times the full render and its stages for the current pipeline configuration.
Usage: python scripts/bench_render.py [--small]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

from rgbd_recon_tpu.core.cache import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
import numpy as np

small = "--small" in sys.argv

from rgbd_recon_tpu.calib import build_synthetic_calibration
from rgbd_recon_tpu.core import BoundingBox, PipelineConfig
from rgbd_recon_tpu.ops.raymarch import ViewCamera
from rgbd_recon_tpu.recon import TsdfPipeline
from rgbd_recon_tpu.sensors import (
    SyntheticScene,
    default_test_rig,
    render_rig_frames,
)


def sync(*arrays):
    for a in arrays:
        np.asarray(jax.device_get(jnp.ravel(a)[0]))


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s} {dt:10.2f} ms", flush=True)
    return out, dt


bbox = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
if small:
    rig = default_test_rig(num_sensors=4, depth_size=(64, 56),
                           color_size=(80, 64), bbox=bbox)
    calib = build_synthetic_calibration(rig, bbox, cv_res=(24, 32, 24),
                                        inv_res=(40, 44, 40))
    cfg = PipelineConfig(voxel_size=0.05, brick_size=0.25, tsdf_limit=0.02,
                         num_lods=5)
    cam = ViewCamera(width=128, height=96, eye=(0.0, 1.3, 2.6),
                     target=(0.0, 1.1, 0.0))
else:
    rig = default_test_rig(num_sensors=4, depth_size=(512, 424),
                           color_size=(1280, 1080), bbox=bbox)
    print("baking calibration...", flush=True)
    calib = build_synthetic_calibration(rig, bbox, cv_res=(128, 256, 128),
                                        inv_res=(200, 220, 200))
    cfg = PipelineConfig(voxel_size=0.01, brick_size=0.1, tsdf_limit=0.01,
                         num_lods=7)
    cam = ViewCamera(width=1280, height=720, eye=(0.0, 1.3, 2.6),
                     target=(0.0, 1.1, 0.0))

scene = SyntheticScene(spheres=[((0.0, 1.1, 0.0), 0.55),
                                ((0.4, 0.6, 0.3), 0.25)])
print("rendering frames...", flush=True)
frames = render_rig_frames(scene, rig)
print("building pipeline...", flush=True)
t0 = time.perf_counter()
pipe = TsdfPipeline(calib, cfg, bbox)
print(f"  setup {time.perf_counter()-t0:.1f}s (compact={pipe.compact})", flush=True)

t0 = time.perf_counter()
volume, maps, counts = pipe.fuse(frames)
sync(volume)
print(f"fuse compile+run {time.perf_counter()-t0:.1f}s", flush=True)
timeit("fuse (preprocess+mark+integrate)", pipe.fuse, frames)

renderer = pipe.make_renderer(cam)
t0 = time.perf_counter()
out = renderer(volume, maps, counts)
sync(out.color)
print(f"render compile+run {time.perf_counter()-t0:.1f}s", flush=True)
out, dt = timeit("render (full)", renderer, volume, maps, counts)
print("hits:", int(np.asarray(out.hit).sum()), flush=True)
