"""Stage-level timing of the fused update at reference scale on TPU."""
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
from rgbd_recon_tpu.ops import tsdf
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
scene = SyntheticScene(spheres=[((0.0, 1.1, 0.0), 0.55),
                                ((0.4, 0.6, 0.3), 0.25)])
frames = render_rig_frames(scene, rig)
pipe = TsdfPipeline(calib, cfg, bbox)
print("compact:", pipe.compact, flush=True)

maps, counts = pipe.preprocess(frames)
sync(counts)
timeit("preprocess+mark", pipe.preprocess, frames)

# mark_bricks alone
pm = pipe._get_pixel_models(frames.depths.shape[1:3])
mark = jax.jit(lambda c, p, m: pipe._mark_bricks(c, p, m))
timeit("mark_bricks", mark, pipe.calib, pm, maps)

timeit("integrate (compact)", pipe.integrate, maps, counts)

# integrate sub-stages
c = cfg
ids = jax.jit(lambda cnt: tsdf.occupied_brick_ids(
    cnt, c.min_voxels_per_brick, c.brick_capacity))(counts)
sync(ids)
print("occupied bricks:", int((np.asarray(counts) > c.min_voxels_per_brick).sum()),
      flush=True)

proj = pipe.projections

@jax.jit
def gather_proj(proj, ids):
    return proj[:, jnp.minimum(ids, proj.shape[1] - 1)]

timeit("  proj block gather", gather_proj, proj, ids)

@jax.jit
def pack_maps(maps):
    d = maps.depth[..., 0]
    return jnp.stack([d, maps.quality, maps.silhouette,
                      jnp.zeros_like(d)], axis=-1)

timeit("  pack maps", pack_maps, maps)

pr = gather_proj(proj, ids)
pk = pack_maps(maps)

@jax.jit
def corner_gathers(pr, pk):
    N = pk.shape[0]
    H, W = pk.shape[1:3]
    flat = pk.reshape(N * H * W, 4)
    u, vv = pr[..., 0], pr[..., 1]
    cx = u * W - 0.5
    cy = vv * H - 0.5
    x0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, H - 1)
    base = jnp.arange(N, dtype=jnp.int32).reshape(N, 1, 1) * (H * W)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    return (flat[base + y0 * W + x0], flat[base + y0 * W + x1],
            flat[base + y1 * W + x0], flat[base + y1 * W + x1])

timeit("  4x corner gathers (N*K*V rows)", corner_gathers, pr, pk)

@jax.jit
def scatter_back(ids, tsd):
    B, V = proj.shape[1], proj.shape[2]
    vol = jnp.full((B, V), -c.tsdf_limit, jnp.float32)
    return vol.at[ids].set(tsd, mode="drop")

tsd_fake = jnp.zeros((ids.shape[0], proj.shape[2]), jnp.float32)
timeit("  block scatter", scatter_back, ids, tsd_fake)

@jax.jit
def unbrick(vol_bm):
    (Bz, By, Bx), padded = tsdf.brick_layout(pipe.volume_grid.shape, pipe.brick_vox)
    v = pipe.brick_vox
    dense = vol_bm.reshape(Bz, By, Bx, v, v, v).transpose(0, 3, 1, 4, 2, 5)
    Z, Y, X = pipe.volume_grid.shape
    return dense.reshape(padded)[:Z, :Y, :X]

vb = scatter_back(ids, tsd_fake)
timeit("  unbrick transpose", unbrick, vb)
