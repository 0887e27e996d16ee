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

    voxel_pos, padz = _pad_to_multiple(pipeline.voxel_pos, 0, n)
    voxel_pos = jax.device_put(voxel_pos, NamedSharding(mesh, P(axis_name)))
    v2b, _ = _pad_to_multiple(pipeline.voxel_to_brick, 0, n)
    v2b = jax.device_put(v2b, NamedSharding(mesh, P(axis_name)))

    calib = jax.device_put(pipeline.calib, repl)
    cfg = pipeline.config
    renderer = pipeline.make_renderer(camera, jit_compile=False)

    from ..ops import bricks as brick_ops
    from ..ops import tsdf as tsdf_ops
    from ..ops.preprocess import preprocess_frames

    def step(frames):
        maps = preprocess_frames(
            frames.depths, frames.colors,
            calib.cv_xyz, calib.cv_uv,
            calib.bbox_min, calib.bbox_max,
            calib.depth_limits, calib.camera_positions,
            morph=cfg.morph, bilateral=cfg.bilateral and cfg.processed,
            refine=cfg.refine,
        )
        counts = pipeline._mark_bricks(maps)

        mask = None
        if cfg.bricking:
            occ = brick_ops.occupied_mask(counts, cfg.min_voxels_per_brick)
            mask = occ.reshape(-1)[v2b]
        volume_p = tsdf_ops.integrate(
            voxel_pos, calib.cv_xyz_inv,
            maps.depth[..., 0], maps.quality, maps.silhouette,
            cfg.tsdf_limit, voxel_mask=mask,
        )
        volume_p = jax.lax.with_sharding_constraint(volume_p, vol_sharding)
        volume = volume_p[: pipeline.volume_grid.shape[0]] if padz else volume_p
        out = renderer(volume, maps, counts)
        out = out.replace(
            color=jax.lax.with_sharding_constraint(out.color, ray_sharding)
        )
        return volume, out

    return jax.jit(step)
