"""Isolate holefill pull/push variants at 1280x720 on the TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_recon_tpu.core.cache import enable_compile_cache

enable_compile_cache()

from rgbd_recon_tpu.ops import holefill as hf


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def bench(name, fn, *args, iters=10):
    r = fn(*args)
    sync(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    sync(jax.tree_util.tree_leaves(r)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:9.2f} ms", flush=True)
    return r


H, W = 720, 1280
key = jax.random.PRNGKey(0)
rgba = jax.random.uniform(key, (H, W, 4))
# ~10% holes
rgba = rgba.at[..., 3].set((rgba[..., 3] > 0.1) * 1.0 - (rgba[..., 3] <= 0.1) * 1.0)
depth = jax.random.uniform(key, (H, W)) * 0.5 + 0.2
planes = [rgba[..., i] for i in range(4)]

bench("fill_colors_planar (7 lods)",
      jax.jit(lambda p, d: hf.fill_colors_planar(list(p), d, 7)),
      planes, depth)
bench("pull planar x7 (pyramid)",
      jax.jit(lambda p, d: hf._build_pyramid_planar(list(p), d, 7)[1][-1]),
      planes, depth)
bench("pull planar LOD0 only",
      jax.jit(lambda p, d: hf._pull_planar(list(p), d)[1]),
      planes, depth)

cs, ds = jax.jit(
    lambda p, d: hf._build_pyramid_planar(list(p), d, 7)
)(planes, depth)
bench("push planar",
      jax.jit(lambda cs, ds: hf._push_planar(
          [list(c) for c in cs], list(ds))[1]),
      [list(c) for c in cs], list(ds))
bench("fill 4 lods",
      jax.jit(lambda p, d: hf.fill_colors_planar(list(p), d, 4)),
      planes, depth)
