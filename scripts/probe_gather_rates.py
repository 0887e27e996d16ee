"""Probe XLA gather throughput vs table size, row width, dtype, and locality.

Informs the packed-row design of the render/integrate kernels: if wide rows
gather at near-constant row rate, trilinear sampling becomes one gather of a
pre-packed 2x2x2 neighborhood row instead of 8 scalar gathers.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

from rgbd_recon_tpu.core.cache import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
import numpy as np

M = 1 << 20


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:48s} {dt*1e3:8.3f} ms  {M/dt/1e6:9.1f} M rows/s "
          f"{M*args[0].shape[-1]*args[0].dtype.itemsize/dt/1e9:8.1f} GB/s",
          flush=True)


@jax.jit
def take(t, i):
    return t[i]


for rows_log2 in (17, 20, 23):
    for width in (1, 2, 4, 8, 16, 32):
        n = 1 << rows_log2
        t = jnp.arange(n * width, dtype=jnp.float32).reshape(n, width)
        i = jax.random.randint(jax.random.PRNGKey(0), (M,), 0, n, jnp.int32)
        mb = n * width * 4 / 1e6
        bench(f"f32 rows={1<<rows_log2} w={width} table={mb:.0f}MB", take, t, i)

# dtype variants at 1M rows, width 8
n = 1 << 20
i = jax.random.randint(jax.random.PRNGKey(0), (M,), 0, n, jnp.int32)
for dt_ in (jnp.int8, jnp.bfloat16, jnp.float32):
    t = jnp.ones((n, 8), dt_)
    bench(f"{dt_.__name__} rows=1M w=8", take, t, i)

# locality: sorted vs random indices
t = jnp.ones((n, 8), jnp.float32)
i_sorted = jnp.sort(i)
bench("f32 w=8 sorted idx", take, t, i_sorted)
i_local = (jnp.arange(M, dtype=jnp.int32) // 8) % n
bench("f32 w=8 sequentialish idx", take, t, i_local)
