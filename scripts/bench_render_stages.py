"""Render stage breakdown at reference scale on the real TPU."""
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

from rgbd_recon_tpu.calib import build_synthetic_calibration
from rgbd_recon_tpu.core import BoundingBox, PipelineConfig
from rgbd_recon_tpu.ops import holefill, raymarch
from rgbd_recon_tpu.ops import bricks as brick_ops
from rgbd_recon_tpu.recon import TsdfPipeline
from rgbd_recon_tpu.recon.tsdf_pipeline import raymarch_brick_interval
from rgbd_recon_tpu.sensors import (
    SyntheticScene, default_test_rig, render_rig_frames,
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
    print(f"{name:45s} {dt:10.2f} ms", flush=True)
    return out


bbox = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
rig = default_test_rig(num_sensors=4, depth_size=(512, 424),
                       color_size=(1280, 1080), bbox=bbox)
print("baking calibration...", flush=True)
calib = build_synthetic_calibration(rig, bbox, cv_res=(128, 256, 128),
                                    inv_res=(200, 220, 200))
cfg = PipelineConfig(voxel_size=0.01, brick_size=0.1, tsdf_limit=0.01,
                     num_lods=7)
scene = SyntheticScene(spheres=[((0.0, 1.1, 0.0), 0.55), ((0.4, 0.6, 0.3), 0.25)])
frames = render_rig_frames(scene, rig)
pipe = TsdfPipeline(calib, cfg, bbox)
volume, maps, counts = pipe.fuse(frames)
sync(volume)

from rgbd_recon_tpu.ops.raymarch import ViewCamera

cam = ViewCamera(width=1280, height=720, eye=(0.0, 1.3, 2.6),
                 target=(0.0, 1.1, 0.0))
eye_vol = jnp.asarray(bbox.normalize(np.asarray(cam.eye, np.float32)))
dirs_vol = jnp.asarray(cam.ray_directions_world() / bbox.size)

# stage 1: brick interval
@jax.jit
def interval(counts, dirs_vol):
    occ = brick_ops.occupied_mask(counts, cfg.min_voxels_per_brick)
    return raymarch_brick_interval(occ, eye_vol, dirs_vol, pipe.brick_grid.res)

se = timeit("brick interval pass", interval, counts, dirs_vol)

# stage 2: compaction
H, W = 720, 1280
M = H * W
cap = -(-int(M * cfg.ray_compaction) // 128) * 128

@jax.jit
def compact(se, dirs_vol):
    pos0_f = se[0].reshape(M, 3)
    len_f = se[1].reshape(M)
    dirs_f = dirs_vol.reshape(M, 3)
    (ray_idx,) = jnp.nonzero(len_f > 0.0, size=cap, fill_value=M)
    safe = jnp.minimum(ray_idx, M - 1)
    return ray_idx, dirs_f[safe], pos0_f[safe], jnp.where(ray_idx < M, len_f[safe], 0.0)

ray_idx, dirs_b, p_b, l_b = timeit("ray compaction", compact, se, dirs_vol)
print("active rays:", int(np.asarray((np.asarray(se[1]) > 0).sum())), "cap:", cap, flush=True)

# stage 3: march (nearest)
@jax.jit
def march_fast(volume, dirs_b, p_b, l_b):
    return raymarch.march(volume, eye_vol, dirs_b, cfg.tsdf_limit, 512,
                          (p_b, l_b), mode="nearest")

hit, hit_pos, num = timeit("march (nearest, compacted)", march_fast,
                           volume, dirs_b, p_b, l_b)
print("max steps taken:", int(np.asarray(num).max()), "hits:", int(np.asarray(hit).sum()), flush=True)

# stage 4: gradient normals
@jax.jit
def grad(volume, hit_pos):
    return raymarch.gradient_normal(volume, hit_pos, cfg.tsdf_limit, mode="nearest")

timeit("gradient normals (nearest)", grad, volume, hit_pos)

# stage 5: blend colors fast
@jax.jit
def blend(hit_pos, maps, calib):
    return raymarch.blend_colors_fast(
        hit_pos, calib.cv_xyz_inv, calib.cv_uv, maps.color,
        maps.depth[..., 0], maps.quality, cfg.tsdf_limit)

timeit("blend_colors_fast", blend, hit_pos, maps, pipe.calib)

# stage 6: colorfill pyramid
rgba = jnp.zeros((H, W, 4), jnp.float32)
depth_win = jnp.ones((H, W), jnp.float32)

@jax.jit
def fill(rgba, depth_win):
    return holefill.fill_colors(rgba, depth_win, cfg.num_lods)

timeit("colorfill pyramid", fill, rgba, depth_win)

# full render for comparison
renderer = pipe.make_renderer(cam)
timeit("render (full, jitted once)", renderer, volume, maps, counts)
