"""Loop-of-gathers vs one vmapped batched gather for per-sensor tables."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_recon_tpu.core.cache import enable_compile_cache

enable_compile_cache()


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def bench(name, fn, *args, iters=20):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.3f} ms", flush=True)


N, HW, C = 4, 512 * 424, 4
M = 768 * 1000        # integrate-scale rows per sensor
key = jax.random.PRNGKey(0)
tables = jax.random.uniform(key, (N, HW, C))
idx = jax.random.randint(key, (N, M), 0, HW, jnp.int32)


@jax.jit
def loop_gather(tables, idx):
    return sum(tables[i][idx[i]].sum() for i in range(N))


@jax.jit
def vmap_gather(tables, idx):
    return jax.vmap(lambda t, ix: t[ix])(tables, idx).sum()


@jax.jit
def takealong(tables, idx):
    return jnp.take_along_axis(
        tables, idx[..., None], axis=1
    ).sum()


bench("loop of 4 gathers (768k rows each)", loop_gather, tables, idx)
bench("vmapped batched gather", vmap_gather, tables, idx)
bench("take_along_axis", takealong, tables, idx)

# hit-shading scale
M2 = 115_000
idx2 = jax.random.randint(key, (N, M2), 0, HW, jnp.int32)
bench("loop 4x 115k rows", loop_gather, tables, idx2)
bench("vmap 4x 115k rows", vmap_gather, tables, idx2)

# wide rows (16-wide bilinear packed)
tables16 = jax.random.uniform(key, (N, HW, 16))


@jax.jit
def loop16(tables16, idx):
    return sum(tables16[i][idx[i]].sum() for i in range(N))


@jax.jit
def vmap16(tables16, idx):
    return jax.vmap(lambda t, ix: t[ix])(tables16, idx).sum()


bench("loop 4x 768k rows w=16", loop16, tables16, idx)
bench("vmap 4x 768k rows w=16", vmap16, tables16, idx)
