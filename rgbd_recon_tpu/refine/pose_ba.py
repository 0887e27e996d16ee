"""Sensor-pose refinement: Gauss-Newton over depth-to-TSDF residuals.

New capability beyond the reference (BASELINE.json north star): the
reference trusts its offline calibration; drift between sensors shows up as
doubled surfaces. Here each sensor gets a 6-DoF correction (rotation vector
+ translation) estimated by minimizing the fused TSDF sampled at that
sensor's observed surface points:

  r_ij = TSDF( T_i · x_ij )          x_ij = cv_xyz_i(u_j, v_j, d_ij)
  E = sum_ij  w_ij · r_ij²

Gauss-Newton with Levenberg damping; the 6x6 normal equations per sensor are
built as reductions over pixels (J^T W J, J^T W r). Under the device mesh
(dist/), pixels shard across chips and these small reductions become `psum`s
— the Schur-style reduce-then-solve pattern over collectives; the solve
itself is a trivial 6x6 on every chip.

All Jacobians come from `jax.jacrev` through the trilinear TSDF sampling —
the whole pipeline is differentiable, so this module is ~100 lines instead
of hand-derived derivative code.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.sampling import trilinear_3d


def _rodrigues(w: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (3,) -> rotation matrix (3,3), small-angle safe AND
    differentiable at w = 0 (uses sinc-style coefficients on theta² so no
    sqrt(0) appears in the gradient graph)."""
    theta2 = jnp.sum(w * w)
    small = theta2 < 1e-12
    # double-where: keep sqrt/div off the zero input so the *gradient* of
    # the untaken branch cannot produce NaN (standard JAX where-grad trap)
    safe_t2 = jnp.where(small, 1.0, theta2)
    safe_t = jnp.sqrt(safe_t2)
    # sin(t)/t and (1-cos(t))/t² with stable small-angle expansions
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_t) / safe_t)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_t)) / safe_t2)
    K = jnp.array(
        [[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]], [-w[1], w[0], 0.0]]
    )
    return jnp.eye(3) + a * K + b * (K @ K)


def apply_pose(params: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """params (6,) = [rotation vector (3), translation (3)] applied to world
    points (..., 3)."""
    R = _rodrigues(params[:3])
    return points @ R.T + params[3:]


def _surface_points(calib, maps, sensor: int, stride: int = 1):
    """Observed world-space surface points of one sensor + weights.

    Uses the processed depth's valid pixels through cv_xyz — the same
    lookup the integration uses."""
    depth2 = maps.depth[sensor]
    H, W = depth2.shape[:2]
    u = (jnp.arange(0, W, stride, dtype=jnp.float32) + 0.5) / W
    v = (jnp.arange(0, H, stride, dtype=jnp.float32) + 0.5) / H
    uu, vv = jnp.meshgrid(u, v)
    d = depth2[::stride, ::stride, 0]
    q = maps.quality[sensor, ::stride, ::stride]
    valid = (d > 0.0) & (d < 1.0)
    pts = trilinear_3d(calib.cv_xyz[sensor], jnp.stack([uu, vv, d], axis=-1))
    w = jnp.where(valid, jnp.maximum(q, 1e-4), 0.0)
    return pts.reshape(-1, 3), w.reshape(-1)


def _tsdf_at(volume, bbox_min, bbox_size, world: jnp.ndarray) -> jnp.ndarray:
    norm = (world - bbox_min) / bbox_size
    return trilinear_3d(volume[..., None], norm)[..., 0]


def _normal_equations(params, pts, w, volume, bbox_min, bbox_size, limit):
    """(J^T W J (6,6), J^T W r (6,), mean |r|) for one sensor."""

    def resid_fn(p):
        moved = apply_pose(p, pts)
        r = _tsdf_at(volume, bbox_min, bbox_size, moved)
        # only near-surface samples constrain the pose (|tsdf| < limit
        # means within the truncation band)
        mask = (jnp.abs(r) < limit * 0.999) & (w > 0.0)
        return r, mask

    r, mask = resid_fn(params)
    J = jax.jacrev(lambda p: resid_fn(p)[0])(params)  # (P, 6)
    wm = jnp.where(mask, w, 0.0)
    JtWJ = J.T @ (J * wm[:, None])
    JtWr = J.T @ (r * wm)
    denom = jnp.maximum(jnp.sum(wm > 0), 1)
    return JtWJ, JtWr, jnp.sum(jnp.abs(r) * (wm > 0)) / denom


def leave_one_out_volumes(pipeline, maps, brick_counts) -> jnp.ndarray:
    """(N, Z, Y, X) stack of TSDF volumes, volume i fused WITHOUT sensor i.

    Refining a sensor against the volume its own (misaligned) depth
    contributed to is self-confirming: the doubled surface it created pulls
    its residual toward zero. Each sensor must instead be aligned against
    the consensus of the *other* sensors. Sensor i is neutralised by giving
    it an always-skip depth (sdist >= limit everywhere), a full silhouette
    (no carving) and zero quality.
    """
    vols = []
    N = maps.depth.shape[0]
    for i in range(N):
        sel = jnp.arange(N) != i
        m = maps.replace(
            depth=jnp.where(
                sel[:, None, None, None], maps.depth,
                jnp.full_like(maps.depth, -100.0)
            ),
            silhouette=jnp.where(
                sel[:, None, None], maps.silhouette,
                jnp.ones_like(maps.silhouette)
            ),
            quality=jnp.where(
                sel[:, None, None], maps.quality, jnp.zeros_like(maps.quality)
            ),
        )
        vols.append(pipeline.integrate(m, brick_counts))
    return jnp.stack(vols)


def refine_poses(
    calib,
    maps,
    volume: jnp.ndarray,
    limit: float,
    iters: int = 5,
    damping: float = 1e-4,
    stride: int = 2,
    volumes: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate per-sensor pose corrections against the fused TSDF.

    Pass ``volumes`` (N, Z, Y, X) from :func:`leave_one_out_volumes` to
    align each sensor against the other sensors' consensus surface (the
    well-posed form); ``volume`` alone aligns against the joint volume.

    Returns (poses (N, 6), per-iteration mean abs residual (iters, N)).
    """
    bbox_min = calib.bbox_min
    bbox_size = calib.bbox_max - calib.bbox_min
    N = maps.depth.shape[0]

    pts_list, w_list = [], []
    for i in range(N):
        p, w = _surface_points(calib, maps, i, stride)
        pts_list.append(p)
        w_list.append(w)
    pts = jnp.stack(pts_list)
    ws = jnp.stack(w_list)
    vols = volumes if volumes is not None else jnp.broadcast_to(
        volume, (N,) + volume.shape
    )

    def one_iter(poses):
        def per_sensor(params, p, w, vol):
            JtWJ, JtWr, res = _normal_equations(
                params, p, w, vol, bbox_min, bbox_size, limit
            )
            A = JtWJ + damping * jnp.eye(6) * (1.0 + jnp.diag(JtWJ))
            delta = jnp.linalg.solve(A, JtWr)
            return params - delta, res

        return jax.vmap(per_sensor)(poses, pts, ws, vols)

    poses = jnp.zeros((N, 6), jnp.float32)
    history = []
    for _ in range(iters):
        poses, res = one_iter(poses)
        history.append(res)
    return poses, jnp.stack(history)


def pose_residual_stats(calib, maps, volume, limit, poses=None, stride=2,
                        volumes=None):
    """Mean |TSDF| at observed surface points (alignment quality metric).

    Pass ``volumes`` (N, Z, Y, X) to score each sensor against the
    leave-one-out consensus instead of the joint volume."""
    N = maps.depth.shape[0]
    if poses is None:
        poses = jnp.zeros((N, 6), jnp.float32)
    bbox_min = calib.bbox_min
    bbox_size = calib.bbox_max - calib.bbox_min
    out = []
    for i in range(N):
        vol = volumes[i] if volumes is not None else volume
        pts, w = _surface_points(calib, maps, i, stride)
        moved = apply_pose(poses[i], pts)
        r = _tsdf_at(vol, bbox_min, bbox_size, moved)
        mask = (jnp.abs(r) < limit * 0.999) & (w > 0)
        denom = jnp.maximum(jnp.sum(mask), 1)
        out.append(jnp.sum(jnp.abs(r) * mask) / denom)
    return jnp.stack(out)
