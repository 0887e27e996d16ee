"""Microbenchmarks on the real TPU: cost model for the ops that dominate
the pipeline (gathers, stencils, dispatch overhead). Layout-aware: batch
shapes are kept 2D grids (H, W) so no tiny trailing dims get tile-padded."""
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

print("devices:", jax.devices(), file=sys.stderr)


def timeit(name, fn, *args, iters=5):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:58s} {dt:10.2f} ms")
        return dt
    except Exception as e:
        print(f"{name:58s} FAILED: {str(e)[:120]}")
        return None


key = jax.random.PRNGKey(0)

x1 = jnp.ones((8, 128))
timeit("dispatch overhead (tiny add)", jax.jit(lambda x: x + 1), x1, iters=20)

a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
timeit("matmul 4096^3 bf16 (137 GFLOP)", jax.jit(lambda a: a @ a), a)

vol = jax.random.normal(key, (200, 220, 200), jnp.float32)
timeit("elementwise x*2+1 on 8.8M f32", jax.jit(lambda v: v * 2 + 1), vol)

# --- gather variants: 921k samples (render-scale), grid-shaped idx (720,1280)
volf = vol.ravel()  # (8.8M,)
idx_grid = jax.random.randint(key, (720, 1280), 0, volf.shape[0])
timeit("flat gather (720,1280) idx from 8.8M f32",
       jax.jit(lambda v, i: v[i]), volf, idx_grid)

idx8 = jax.random.randint(key, (8, 720, 1280), 0, volf.shape[0])
timeit("flat gather (8,720,1280) idx from 8.8M f32 (8 corners)",
       jax.jit(lambda v, i: v[i]), volf, idx8)

# row-gather (M, C) form — the OLD sampling.py pattern
imgflat = jax.random.normal(key, (424 * 512, 4), jnp.float32)
idx_flat = jax.random.randint(key, (921600,), 0, 424 * 512)
timeit("row gather (921600,4) from (217k,4)",
       jax.jit(lambda v, i: jnp.take(v, i, axis=0)), imgflat, idx_flat)

# per-channel gather, same work
img1 = jax.random.normal(key, (424 * 512,), jnp.float32)
def per_chan(v, i):
    return [v[i] for _ in range(4)]
timeit("4x per-channel gather (720,1280) from 217k f32",
       jax.jit(per_chan), img1, idx_grid % (424 * 512))

# --- integrate-scale: 8.8M samples from a 512x424 map, idx as (Z,Y,X)
idx_vox = jax.random.randint(key, (200, 220, 200), 0, 424 * 512)
timeit("flat gather (200,220,200) idx from 217k f32",
       jax.jit(lambda v, i: v[i]), img1, idx_vox)
def gather12(v, i):
    return [v[i] for _ in range(12)]
timeit("12x flat gather (200,220,200) from 217k f32",
       jax.jit(gather12), img1, idx_vox)

# 1M-voxel version (bricked)
idx_brick = jax.random.randint(key, (1024, 1024), 0, 424 * 512)
def gather12b(v, i):
    return [v[i] for _ in range(12)]
timeit("12x flat gather (1024,1024) from 217k f32",
       jax.jit(gather12b), img1, idx_brick)

# --- trilinear via current sampling.py at render scale
from rgbd_recon_tpu.ops.sampling import trilinear_3d

pos = jax.random.uniform(key, (720, 1280, 3))
vol4 = vol[..., None]
timeit("trilinear_3d (C=1) 921k samples from 200^3",
       jax.jit(trilinear_3d), vol4, pos)

# --- march-like: 50-step scan of trilinear
def march_like(v, p):
    def body(c, k):
        c = c + trilinear_3d(v, p + 0.0001 * k)[..., 0]
        return c, None
    out, _ = jax.lax.scan(body, jnp.zeros(p.shape[:-1]), jnp.arange(50.0))
    return out
timeit("50-step trilinear march 921k rays", jax.jit(march_like), vol4, pos, iters=2)

# nearest-sample march (1 gather/step)
def march_nn(v, p):
    D, H, W = 200, 220, 200
    vf = v.ravel()
    def body(c, k):
        q = p + 0.0001 * k
        xi = jnp.clip((q[..., 0] * W).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip((q[..., 1] * H).astype(jnp.int32), 0, H - 1)
        zi = jnp.clip((q[..., 2] * D).astype(jnp.int32), 0, D - 1)
        c = c + vf[(zi * H + yi) * W + xi]
        return c, None
    out, _ = jax.lax.scan(body, jnp.zeros(p.shape[:-1]), jnp.arange(50.0))
    return out
timeit("50-step nearest march 921k rays", jax.jit(march_nn), vol, pos, iters=2)

# --- stencil: 13x13 on (4,424,512) via padded slices (no gather)
imgs = jax.random.normal(key, (4, 424, 512), jnp.float32)
def stencil_slice(x):
    xp = jnp.pad(x, ((0, 0), (6, 6), (6, 6)))
    acc = jnp.zeros_like(x)
    for dy in range(13):
        for dx in range(13):
            acc = acc + jax.lax.slice(
                xp, (0, dy, dx), (4, dy + 424, dx + 512))
    return acc
timeit("13x13 slice-stencil (4,424,512)", jax.jit(stencil_slice), imgs)

# depthwise conv form
def stencil_conv(x):
    k = jnp.ones((13, 13, 1, 1), jnp.float32)
    return jax.lax.conv_general_dilated(
        x[..., None], k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
timeit("13x13 conv-stencil (4,424,512)", jax.jit(stencil_conv), imgs)

# --- scatter: 1M updates into 8.8M volume
upd = jax.random.normal(key, (1024, 1024), jnp.float32)
sidx = jax.random.randint(key, (1024, 1024), 0, volf.shape[0])
timeit("scatter-set 1M into 8.8M f32",
       jax.jit(lambda v, i, u: v.at[i].set(u)), volf, sidx, upd)
timeit("scatter-add (4,720,1280)->8800 bricks",
       jax.jit(lambda i, u: jnp.zeros(8800).at[i].add(u)),
       jax.random.randint(key, (4, 720, 1280), 0, 8800),
       jax.random.normal(key, (4, 720, 1280)))

# --- H2D transfer: 4-sensor frame set
host_frames = np.random.rand(4, 424, 512).astype(np.float32)
host_colors = np.random.rand(4, 1080, 1280, 3).astype(np.float32)
def put(*arrs):
    return [jax.device_put(a) for a in arrs]
timeit("H2D: 4x depth (3.5MB) + 4x color (66MB)", put, host_frames, host_colors, iters=3)
