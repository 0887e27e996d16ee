"""Device-mesh distribution of the reconstruction pipeline.

The reference is a single-GPU application; multi-chip scaling is this
framework's new capability (SURVEY.md §2.10, BASELINE.md north star). The
spatial analogue of the reference's brick decomposition becomes the sharding
unit: the TSDF volume (and the voxel-position grid) is sharded along its Z
axis over the mesh; sensor maps and calibration volumes are replicated
(cheap: a few MB) so integration is embarrassingly parallel with zero
communication; rendering shards over image rows, and XLA inserts the
all-gather of the volume over ICI automatically.

All shardings are expressed with `jax.sharding.NamedSharding` under `jit`
(GSPMD), so the same code runs on 1 chip, a v5e pod slice, or the CPU
8-device test mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "z") -> Mesh:
    """1-D mesh over the first n available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def _pad_to_multiple(arr: jnp.ndarray, axis: int, m: int):
    """Pad an axis to a multiple of m (sharded axes must divide evenly)."""
    size = arr.shape[axis]
    rem = (-size) % m
    if rem == 0:
        return arr, 0
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return jnp.pad(arr, pad), rem


def shard_pipeline_step(pipeline, camera, mesh: Mesh, axis_name: str = "z"):
    """Build a sharded full step: frames -> (volume, render output).

    - voxel grid + output volume: sharded over Z (`P('z')` on axis 0)
    - sensor maps / calibration: replicated
    - render rays: sharded over image rows

    Returns step(frames) running under `jit` on the mesh.
    """
    n = mesh.devices.size
    vol_sharding = NamedSharding(mesh, P(axis_name))
    ray_sharding = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    cfg = pipeline.config
    Z, Y, X = pipeline.volume_grid.shape
    padz = (-Z) % n
    vol_shape_p = (Z + padz, Y, X)
    bbox_size = tuple(float(s) for s in pipeline.bbox.size)

    calib = jax.device_put(pipeline.calib, repl)
    render_fn, cam0 = pipeline.make_render_fn(camera)
    cam0 = jax.device_put(cam0, repl)
    proj_models = pipeline._get_projection_models()
    if proj_models is not None:
        proj_models = jax.device_put(proj_models, repl)

    from ..ops import bricks as brick_ops
    from ..ops import tsdf as tsdf_ops

    def step(frames, calib, cam, pixel_models):
        maps, counts = pipeline._preprocess_impl(calib, pixel_models, frames)

        mask = None
        if cfg.bricking:
            occ = brick_ops.occupied_mask(counts, cfg.min_voxels_per_brick)
            mask = brick_ops.expand_mask_to_voxel_grid(
                occ, (Z, Y, X), bbox_size, cfg.brick_size
            )
            if padz:
                mask = jnp.pad(mask, ((0, padz), (0, 0), (0, 0)))
        # voxel centers over the padded grid, normalized by the TRUE
        # resolution: padded rows project outside every frustum and keep
        # the clear value, then get cropped below
        voxel_pos = tsdf_ops.voxel_centers(vol_shape_p, true_shape=(Z, Y, X))
        voxel_pos = jax.lax.with_sharding_constraint(voxel_pos, vol_sharding)
        volume_p = tsdf_ops.integrate(
            voxel_pos, calib.cv_xyz_inv,
            maps.depth[..., 0], maps.quality, maps.silhouette,
            cfg.tsdf_limit, voxel_mask=mask,
            carve_sil_threshold=cfg.carve_sil_threshold,
            phantom_hull=cfg.phantom_hull,
        )
        volume_p = jax.lax.with_sharding_constraint(volume_p, vol_sharding)
        volume = volume_p[:Z] if padz else volume_p
        out = render_fn(volume, maps, counts, calib, cam, proj_models)
        out = out.replace(
            color=jax.lax.with_sharding_constraint(out.color, ray_sharding)
        )
        return volume, out

    jitted = jax.jit(step)

    def run(frames):
        pm = pipeline._get_pixel_models(frames.depths.shape[1:3])
        if pm is not None:
            pm = jax.device_put(pm, repl)
        return jitted(frames, calib, cam0, pm)

    return run
