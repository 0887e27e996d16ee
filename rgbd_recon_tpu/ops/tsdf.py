"""TSDF integration — weighted multi-sensor fusion into the volume.

Exact math of glsl/tsdf_integration.vs:23-58, restructured for TPU: instead
of one vertex-shader thread per voxel with a sensor loop, the whole volume is
a dense (Z, Y, X) array and the sensor loop is an unrolled scan whose body is
fully vectorized over all voxels (gathers through cv_xyz_inv + sensor maps).

Per voxel (volume-normalized position p), per sensor i in order:
  pos_calib = cv_xyz_inv[i](p)                       (:31)
  silhouette carve: sil < 1 and nothing written yet -> tsd = -limit, skip
                                                      (:32-39)
  sdist = pos_calib.z - depth_i(pos_calib.xy)        (:40-41)
  sdist <= -limit -> tsd = -limit                    (:42-45)
  sdist >= +limit -> skip                            (:46-48)
  else quality-weighted running average              (:49-54)
Initial value +limit (:28); voxels of unoccupied bricks keep the clear value
-limit (clearImage, recon_integration.cpp:250-251).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .sampling import bilinear_2d, trilinear_3d


def voxel_centers(
    vol_shape: Tuple[int, int, int],
    true_shape: Optional[Tuple[int, int, int]] = None,
) -> jnp.ndarray:
    """(Z, Y, X, 3) volume-normalized voxel-center positions, computed from
    iota *inside* the traced program.

    Materializing this grid host-side and closing over it bakes a ~100 MB
    constant into every jitted program (8.8M voxels at reference scale,
    SURVEY.md §6) — which both bloats the lowered module beyond what
    remote-compile transports accept and costs an HBM read per frame. Iota
    is free on TPU.

    ``true_shape`` supports sharding-padded grids: positions are normalized
    by the true resolution so padded rows land outside [0,1] and integrate
    to the clear value.
    """
    Z, Y, X = vol_shape
    tz, ty, tx = true_shape or vol_shape
    zi = jax.lax.broadcasted_iota(jnp.float32, (Z, Y, X), 0)
    yi = jax.lax.broadcasted_iota(jnp.float32, (Z, Y, X), 1)
    xi = jax.lax.broadcasted_iota(jnp.float32, (Z, Y, X), 2)
    return jnp.stack(
        [(xi + 0.5) / tx, (yi + 0.5) / ty, (zi + 0.5) / tz], axis=-1
    )


def precompute_projections(
    voxel_pos: jnp.ndarray, cv_xyz_inv: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hoist the frame-invariant cv_xyz_inv lookups out of the per-frame
    integration: the voxel grid and calibration volumes are both static, so
    each voxel's per-sensor (u, v, depth_norm) projection is a constant.

    This is the TPU answer to the reference's per-voxel texture fetches
    (tsdf_integration.vs:31): one big gather at calibration time instead of
    one per frame, turning the per-frame kernel into pure elementwise math +
    small-map bilinear gathers.

    Returns (pos_calib (N, Z, Y, X, 3), in_frustum (N, Z, Y, X) bool).
    """

    def one(inv):
        lookup = trilinear_3d(inv, voxel_pos)
        return lookup[..., :3], lookup[..., 3] > 0.99

    return jax.lax.map(one, cv_xyz_inv)


@functools.partial(jax.jit, static_argnums=(1,))
def bake_projections(
    cv_xyz_inv: jnp.ndarray, vol_shape: Tuple[int, int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jitted projection bake over an iota voxel grid (no host constants):
    the form the pipeline uses at setup."""
    return precompute_projections(voxel_centers(vol_shape), cv_xyz_inv)


def integrate(
    voxel_pos: Union[jnp.ndarray, Tuple[int, int, int]],
    # (Z, Y, X, 3) volume-normalized voxel centers, or a static (Z, Y, X)
    # shape tuple -> centers are generated from iota in-program
    cv_xyz_inv: jnp.ndarray,     # (N, Dz, Hy, Wx, 4)
    depths: jnp.ndarray,         # (N, H, W) processed normalized depth
    qualities: jnp.ndarray,      # (N, H, W)
    silhouettes: jnp.ndarray,    # (N, H, W)
    limit: float,
    voxel_mask: Optional[jnp.ndarray] = None,  # (Z, Y, X) bool brick gating
    projections: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    carve_sil_threshold: float = 1.0,
    phantom_hull: bool = False,
) -> jnp.ndarray:
    """Returns the fused TSDF volume (Z, Y, X) float32 in [-limit, +limit].

    Pass `projections` from :func:`precompute_projections` to skip the
    per-frame cv_xyz_inv gathers (identical math, large speedup)."""
    if isinstance(voxel_pos, tuple):
        voxel_pos = voxel_centers(voxel_pos)
    num_sensors = depths.shape[0]

    tsd = jnp.full(voxel_pos.shape[:-1], limit, jnp.float32)
    total_w = jnp.zeros_like(tsd)

    for i in range(num_sensors):
        if projections is not None:
            pos_calib = projections[0][i]
            in_frustum = projections[1][i]
        else:
            lookup = trilinear_3d(cv_xyz_inv[i], voxel_pos)
            pos_calib = lookup[..., :3]
            # validity channel (w = 1 in-frustum, -1 outside,
            # calibration_inverter.cpp:128,141): voxels whose trilinear
            # lookup mixes invalid texels would read garbage projections.
            # The reference skips this check (its bbox is strictly inside
            # every frustum); we gate on it so partial-coverage rigs stay
            # correct.
            in_frustum = lookup[..., 3] > 0.99
        uv = pos_calib[..., :2]
        sil = bilinear_2d(silhouettes[i][..., None], uv)[..., 0]
        depth = bilinear_2d(depths[i][..., None], uv)[..., 0]
        qual = bilinear_2d(qualities[i][..., None], uv)[..., 0]

        # silhouette carve (:32-39): only when no sensor has written yet.
        # Threshold 1.0 = reference-exact; see PipelineConfig.
        carve = (sil < carve_sil_threshold) & (tsd >= limit) & in_frustum

        sdist = pos_calib[..., 2] - depth
        behind = (sdist <= -limit) & in_frustum
        skip = (sdist >= limit) | ~in_frustum

        new_w = total_w + qual
        updated = jnp.where(
            new_w > 0.0, (tsd * total_w + qual * sdist) / jnp.maximum(new_w, 1e-20), tsd
        )

        tsd_next = jnp.where(
            behind, -limit, jnp.where(skip, tsd, updated)
        )
        w_next = jnp.where(behind | skip, total_w, new_w)

        tsd = jnp.where(carve, -limit, tsd_next)
        total_w = jnp.where(carve, total_w, w_next)

    if not phantom_hull:
        # Reference parity quirk (tsdf_integration.vs:28,57): voxels of
        # occupied bricks that NO sensor observed inside the truncation band
        # keep the +limit init value. Where such a region abuts carved
        # (-limit) space, the raymarcher finds a sign change that is not a
        # measured surface — a phantom wall inside objects / at hull
        # boundaries. With phantom_hull=False (default), unobserved voxels
        # (zero accumulated weight, still at +limit) are reset to -limit
        # ("unknown"), so only genuinely written TSDF bands produce hits.
        tsd = jnp.where((total_w <= 0.0) & (tsd >= limit), -limit, tsd)

    if voxel_mask is not None:
        tsd = jnp.where(voxel_mask, tsd, -limit)
    return tsd
