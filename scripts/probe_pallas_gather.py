"""Probe: can Mosaic/Pallas gather from a VMEM-resident table at VPU rate?

The whole render/integrate path is gather-bound through XLA (~140M gather
rows/s measured in round 2). If a Pallas kernel can random-access a
VMEM-resident volume (e.g. via jnp.take / dynamic_gather lowering) at a
multiple of that, the raymarch + map-sampling kernels should move to Pallas.

Tries several gather formulations on a small table; prints which ones
compile+run on the TPU backend and their rough throughput.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 1 << 20           # number of lookups
TABLE = 1 << 20       # table rows (f32) = 4 MB


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def bench(name, fn, *args, iters=20):
    try:
        out = fn(*args)
        sync(out)
    except Exception as e:  # noqa
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.3f} ms   {M/dt/1e6:10.1f} M lookups/s")
    return out


key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (TABLE,), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, TABLE, jnp.int32)

# baseline: XLA gather
@jax.jit
def xla_gather(table, idx):
    return table[idx]

bench("xla take (1M rows from 4MB)", xla_gather, table, idx)

# XLA gather, 8-wide rows
table8 = jax.random.normal(key, (TABLE // 8, 8), jnp.float32)
idx8 = idx % (TABLE // 8)

@jax.jit
def xla_gather8(t, i):
    return t[i]

bench("xla take (1M x 8-wide rows)", xla_gather8, table8, idx8)


# pallas: whole table in VMEM, vector index read
def k_take(tab_ref, idx_ref, out_ref):
    out_ref[:] = tab_ref[idx_ref[:]]

@jax.jit
def pallas_take(table, idx):
    return pl.pallas_call(
        k_take,
        out_shape=jax.ShapeDtypeStruct((M,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)

bench("pallas ref[idx] vector index", pallas_take, table, idx)


# pallas: jnp.take inside kernel
def k_take2(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

@jax.jit
def pallas_take2(table, idx):
    return pl.pallas_call(
        k_take2,
        out_shape=jax.ShapeDtypeStruct((M,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)

bench("pallas jnp.take axis=0", pallas_take2, table, idx)


# pallas: take_along_axis on 2D (sublane x lane) layout.
# table as (8, TABLE//8): gather along lanes per sublane row.
tab2d = table.reshape(8, TABLE // 8)
idx2d = (idx % (TABLE // 8)).reshape(8, M // 8)

def k_taa(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

@jax.jit
def pallas_taa(t, i):
    return pl.pallas_call(
        k_taa,
        out_shape=jax.ShapeDtypeStruct((8, M // 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab2d, idx2d)

bench("pallas take_along_axis axis=1 (lanes)", pallas_taa, tab2d, idx2d)

# pallas: take_along_axis along sublanes (axis=0)
tab2ds = table.reshape(TABLE // 128, 128)
idx2ds = (idx % (TABLE // 128)).reshape(M // 128, 128)

def k_taas(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

@jax.jit
def pallas_taas(t, i):
    return pl.pallas_call(
        k_taas,
        out_shape=jax.ShapeDtypeStruct((M // 128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab2ds, idx2ds)

bench("pallas take_along_axis axis=0 (sublanes)", pallas_taas, tab2ds, idx2ds)

# XLA take_along_axis same-shape comparison (outside pallas)
@jax.jit
def xla_taa(t, i):
    return jnp.take_along_axis(t, i, axis=0)

bench("xla take_along_axis axis=0", xla_taa, tab2ds, idx2ds)
