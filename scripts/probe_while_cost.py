"""Measure while_loop fixed per-iteration cost vs gather-row cost on TPU.

If per-iteration dispatch overhead dominates (rather than gather rows), the
march should unroll multiple samples per iteration.
"""
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


table = jnp.ones((8_800_000, 2), jnp.float32)


def make_march(R, iters, unroll):
    @jax.jit
    def go(table, seed):
        idx0 = (seed + jax.lax.iota(jnp.int32, R)) % 8_000_000
        acc = jnp.zeros((R,), jnp.float32)

        def cond(c):
            k, acc, idx = c
            return k < iters

        def body(c):
            k, acc, idx = c
            for _ in range(unroll):
                rows = table[idx]
                acc = acc + rows[..., 0]
                idx = (idx + 131) % 8_000_000
            return k + 1, acc, idx

        _, acc, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), acc, idx0))
        return acc

    return go


for R in (1024, 57_600, 230_400):
    for iters, unroll in ((48, 1), (12, 4), (6, 8)):
        fn = make_march(R, iters, unroll)
        r = fn(table, jnp.int32(0))
        sync(r)
        t0 = time.perf_counter()
        for i in range(10):
            r = fn(table, jnp.int32(i))
        sync(r)
        dt = (time.perf_counter() - t0) / 10 * 1e3
        rows = R * iters * unroll
        print(
            f"R={R:7d} iters={iters:3d} unroll={unroll}  {dt:8.3f} ms  "
            f"({dt/iters*1000:7.1f} us/iter, {rows/dt*1e3/1e6:7.1f} M rows/s)",
            flush=True,
        )
