"""Calibration-volume inversion: world grid -> sensor-space lookup volume.

Parity reimplementation of the reference's offline ``calib_inverter`` tool
(source/calib_inverter.cpp + framework/calibration/calibration_inverter.cpp):

  for each voxel center of the target world grid (half-voxel offset,
  calibration_inverter.cpp:105-108):
    - if outside the sensor frustum -> (-1, -1, -1, -1)        (:127-129)
    - else: k=8 nearest cv_xyz samples (CGAL kd-tree, :134)
      -> inverse-distance-weighted average of their integer texel indices
      (:55-69) -> +0.5, normalized by the cv_xyz resolution (:141)
      -> (u, v, depth_norm, 1.0)

This implementation runs the k-NN on host via scipy's cKDTree (the exact
role CGAL plays in the reference — an offline, CPU-side precompute), with
the IDW combine vectorized over all voxels. A pure-JAX brute-force variant
is provided for small problems and tests.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .frustum import Frustum, frustum_from_cv_xyz
from ..core.grid import BoundingBox


def _target_voxel_centers(bbox: BoundingBox, res: Tuple[int, int, int]) -> np.ndarray:
    rx, ry, rz = res
    xs = (np.arange(rx, dtype=np.float32) + 0.5) / rx
    ys = (np.arange(ry, dtype=np.float32) + 0.5) / ry
    zs = (np.arange(rz, dtype=np.float32) + 0.5) / rz
    zz, yy, xx = np.meshgrid(zs, ys, xs, indexing="ij")
    return bbox.denormalize(np.stack([xx, yy, zz], axis=-1))


def invert_calibration_knn(
    cv_xyz: np.ndarray,
    bbox: BoundingBox,
    res: Tuple[int, int, int],
    k: int = 8,
) -> np.ndarray:
    """Numerically invert a cv_xyz volume over a world grid.

    Args:
      cv_xyz: (D, H, W, 3) world positions per (depth, v, u) texel.
      bbox: target world bounding box.
      res: target grid resolution (X, Y, Z).
      k: neighbor count (reference uses 8, calibration_inverter.cpp:134).

    Returns (Z, Y, X, 4) float32 volume of (u, v, depth_norm, valid).
    """
    from scipy.spatial import cKDTree

    D, H, W, _ = cv_xyz.shape
    samples = cv_xyz.reshape(-1, 3).astype(np.float64)
    # integer texel indices (u=x, v=y, d=z) matching getXyzSamples ordering
    dz, vy, ux = np.meshgrid(
        np.arange(D), np.arange(H), np.arange(W), indexing="ij"
    )
    indices = np.stack([ux, vy, dz], axis=-1).reshape(-1, 3).astype(np.float64)

    tree = cKDTree(samples)
    targets = _target_voxel_centers(bbox, res).reshape(-1, 3).astype(np.float64)

    frustum = frustum_from_cv_xyz(cv_xyz)
    inside = frustum.inside(targets)

    out = np.full((targets.shape[0], 4), -1.0, np.float32)
    q = targets[inside]
    if q.shape[0] > 0:
        dist, nn = tree.query(q, k=k, workers=-1)
        # IDW of texel indices (inverseDistance, calibration_inverter.cpp:55-69)
        w = 1.0 / np.maximum(dist, 1e-12)
        widx = np.einsum("nk,nkc->nc", w, indices[nn]) / w.sum(axis=1, keepdims=True)
        dims = np.array([W, H, D], np.float64)
        norm = (widx + 0.5) / dims  # calibration_inverter.cpp:141
        out[inside, :3] = norm.astype(np.float32)
        out[inside, 3] = 1.0
    rx, ry, rz = res
    return out.reshape(rz, ry, rx, 4)


def invert_calibration_bruteforce_jax(
    cv_xyz, bbox: BoundingBox, res: Tuple[int, int, int], k: int = 8
):
    """Pure-JAX brute-force variant (top-k over all samples) for small
    volumes; used to validate the kd-tree path and as the on-device option
    when recalibrating online."""
    import jax
    import jax.numpy as jnp

    D, H, W, _ = cv_xyz.shape
    samples = jnp.asarray(cv_xyz, jnp.float32).reshape(-1, 3)
    dz, vy, ux = np.meshgrid(np.arange(D), np.arange(H), np.arange(W), indexing="ij")
    indices = jnp.asarray(
        np.stack([ux, vy, dz], axis=-1).reshape(-1, 3), jnp.float32
    )

    targets = jnp.asarray(_target_voxel_centers(bbox, res).reshape(-1, 3))
    frustum = frustum_from_cv_xyz(np.asarray(cv_xyz))
    inside = jnp.asarray(frustum.inside(np.asarray(targets)))

    def one(t):
        d2 = jnp.sum((samples - t) ** 2, axis=-1)
        neg_d2, nn = jax.lax.top_k(-d2, k)
        dist = jnp.sqrt(jnp.maximum(-neg_d2, 1e-24))
        w = 1.0 / dist
        widx = jnp.sum(w[:, None] * indices[nn], axis=0) / jnp.sum(w)
        dims = jnp.array([W, H, D], jnp.float32)
        return (widx + 0.5) / dims

    uvd = jax.lax.map(one, targets, batch_size=4096)
    out = jnp.where(
        inside[:, None],
        jnp.concatenate([uvd, jnp.ones((uvd.shape[0], 1))], axis=-1),
        jnp.full((uvd.shape[0], 4), -1.0),
    )
    rx, ry, rz = res
    return np.asarray(out, np.float32).reshape(rz, ry, rx, 4)
