"""Render stage breakdown at reference scale on the real TPU."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from rgbd_recon_tpu.core.cache import enable_compile_cache

enable_compile_cache()
import dataclasses

import jax.numpy as jnp
import numpy as np

from rgbd_recon_tpu.calib import build_synthetic_calibration
from rgbd_recon_tpu.core import BoundingBox, PipelineConfig
from rgbd_recon_tpu.ops import holefill, raymarch
from rgbd_recon_tpu.recon import TsdfPipeline
from rgbd_recon_tpu.sensors import (
    SyntheticScene, default_test_rig, render_rig_frames,
)


def sync(*arrays):
    for a in arrays:
        np.asarray(jax.device_get(jnp.ravel(a)[0]))


def timeit(name, fn, *args, iters=5, **kw):
    out = fn(*args, **kw)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    sync(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:45s} {dt:10.2f} ms", flush=True)
    return out


bbox = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
rig = default_test_rig(num_sensors=4, depth_size=(512, 424),
                       color_size=(1280, 1080), bbox=bbox)
print("baking calibration...", flush=True)
calib = build_synthetic_calibration(rig, bbox, cv_res=(128, 256, 128),
                                    inv_res=(200, 220, 200))
print("bake done", flush=True)
cfg = PipelineConfig(voxel_size=0.01, brick_size=0.1, tsdf_limit=0.01,
                     num_lods=7)
scene = SyntheticScene(spheres=[((0.0, 1.1, 0.0), 0.55), ((0.4, 0.6, 0.3), 0.25)])
frames = render_rig_frames(scene, rig)
print("frames done", flush=True)
t0 = time.perf_counter()
pipe = TsdfPipeline(calib, cfg, bbox)
print(f"pipeline init (projection bake): {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
maps, counts = pipe.preprocess(frames)
sync(maps.quality)
print(f"preprocess compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
volume = pipe.integrate(maps, counts)
sync(volume)
print(f"integrate compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
timeit("1preprocess", lambda f: pipe.preprocess(f)[0].quality, frames)
timeit("2integrate", pipe.integrate, maps, counts)

from rgbd_recon_tpu.ops.raymarch import ViewCamera

cam = ViewCamera(width=1280, height=720, eye=(0.0, 1.3, 2.6),
                 target=(0.0, 1.1, 0.0))

# full render (block-compacted surface march)
renderer = pipe.make_renderer(cam)
out = timeit("render (block path, full)", renderer, volume, maps, counts)
print("  hits:", int(np.asarray(out.hit).sum()),
      " overflow [blocks, phase2, hits]:", np.asarray(out.overflow), flush=True)
print("  diagnostics:", pipe.diagnostics(counts, out), flush=True)

# stage: packed volume build
pack = jax.jit(lambda v: raymarch.PackedVolume.from_volume(v).pairs)
timeit("pack volume pairs", pack, volume)

# stage: surface mask
mask_fn = jax.jit(pipe._surface_brick_mask)
occ = timeit("surface brick mask", mask_fn, volume)
print("  surface bricks:", int(np.asarray(occ).sum()),
      " marked occupied:", int((np.asarray(counts) > cfg.min_voxels_per_brick).sum()),
      flush=True)

# stage: colorfill
rgba = jnp.zeros((720, 1280, 4), jnp.float32)
depth_win = jnp.ones((720, 1280), jnp.float32)
fill = jax.jit(lambda c, d: holefill.fill_colors(c, d, cfg.num_lods))
timeit("colorfill pyramid", fill, rgba, depth_win)

# moving camera: same jit, new pose (must NOT recompile)
cam2 = ViewCamera(width=1280, height=720, eye=(0.6, 1.5, 2.4),
                  target=(0.0, 1.0, 0.0))
t0 = time.perf_counter()
out2 = renderer(volume, maps, counts, camera_pose=cam2)
sync(out2.color)
print(f"moved-camera render (no recompile expected): "
      f"{(time.perf_counter()-t0)*1000:.2f} ms", flush=True)

import sys; sys.exit(0)
# dense path for reference
cfg_dense = dataclasses.replace(cfg, ray_compaction=0.0)
pipe_d = TsdfPipeline(calib, cfg_dense, bbox)
renderer_d = pipe_d.make_renderer(cam)
out_d = timeit("render (dense path)", renderer_d, volume, maps, counts, iters=2)
print("  dense hits:", int(np.asarray(out_d.hit).sum()), flush=True)
