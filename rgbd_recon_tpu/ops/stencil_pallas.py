"""Pallas TPU kernels for the 13x13 preprocessing stencils.

The two heaviest preprocess passes are dense 13x13 sliding-window reductions
per sensor (the reference's hot fragment shaders, SURVEY.md §3.2):

  bilateral   glsl/pre_depth.fs:85-127   depth-adaptive bilateral filter
  quality     glsl/pre_quality.fs:65-119 lateral-continuity census

The portable jnp implementation (ops/preprocess.py) unrolls the 169 taps as
shifted slices, which XLA fuses but still schedules as many full-map passes.
These kernels instead make the whole padded map VMEM-resident (a 512x424
float32 map is < 1 MB against ~16 MB VMEM) and unroll the 169 taps as pure
VPU arithmetic over on-chip data: one HBM read + one write per map.

Both kernels run over the full (N, H, W) sensor batch with a grid over the
sensor axis, and are dispatched by ops/preprocess.py on TPU backends
(PipelineConfig / preprocess_frames(use_pallas=...)); the jnp path remains
the reference implementation and the CPU fallback. Numerics are
tap-for-tap identical (same accumulation order), so parity tests compare
them to ~f32 rounding.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_KS = 6  # window radius: 13x13 (pre_depth.fs / pre_quality.fs)


def have_pallas_tpu() -> bool:
    """True when the default backend can run Mosaic TPU kernels."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


# backwards-compatible private alias
_have_pallas_tpu = have_pallas_tpu


def _pad_for_stencil(depth: jnp.ndarray):
    """Edge-pad H by the window radius and round the lane dim up to 128 so
    the VMEM block is tile-aligned (padding columns are never read).
    depth: (N, H, W) -> (N, H + 2k, Wp)."""
    _, H, W = depth.shape
    wp = -(-(W + 2 * _KS) // 128) * 128
    return jnp.pad(
        depth, ((0, 0), (_KS, _KS), (_KS, wp - W - _KS)), mode="edge"
    )


def _bilateral_kernel(limits_ref, dpad_ref, d_ref, bf_ref, w_ref, wr_ref):
    """One sensor's bilateral pass, whole-map block in VMEM.

    limits_ref: (N, 2) [near, far] in SMEM (whole array, indexed by the
    sensor grid position)
    dpad_ref: (1, H + 12, Wp) edge-padded metric depth
    d_ref:    (1, H, W) center depth
    outputs: depth_bf sum, weight sum, range-weight sum (1, H, W)
    """
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    near = limits_ref[i, 0]
    far = limits_ref[i, 1]
    d = d_ref[0]
    H, W = d.shape
    drm = 0.35 * d / 4.5  # dist_range_max, pre_depth.fs:89-91 (_MAX_DEPTH)
    drm_safe = jnp.maximum(drm, 1e-20)

    bf = jnp.zeros_like(d)
    w = jnp.zeros_like(d)
    wr = jnp.zeros_like(d)
    for dy in range(-_KS, _KS + 1):
        for dx in range(-_KS, _KS + 1):
            s = dpad_ref[0, _KS + dy: _KS + dy + H, _KS + dx: _KS + dx + W]
            depth_range = jnp.abs(s - d)
            border = (s < near) | (s > far) | (depth_range > drm)
            gauss_space = 1.0 - math.sqrt(dx * dx + dy * dy) / _KS
            gauss_range = 1.0 - jnp.minimum(depth_range, drm) / drm_safe
            w_s = jnp.where(border, 0.0, gauss_space * gauss_range)
            bf = bf + w_s * s
            w = w + w_s
            wr = wr + jnp.where(border, 0.0, gauss_range)
    bf_ref[0] = bf
    w_ref[0] = w
    wr_ref[0] = wr


def _quality_kernel(dpad_ref, d_ref, border_ref, wr_ref):
    """One sensor's quality census, whole-map block in VMEM.

    dpad_ref: (1, H + 12, Wp) edge-padded NORMALIZED depth; d_ref: (1, H, W).
    outputs: border count, range-weight sum (pre_quality.fs:65-119).
    """
    d = d_ref[0]
    H, W = d.shape
    drm = 0.35 * d  # max_depth = 1.0 in normalized units
    drm_safe = jnp.maximum(drm, 1e-20)

    border = jnp.zeros_like(d)
    wr = jnp.zeros_like(d)
    for dy in range(-_KS, _KS + 1):
        for dx in range(-_KS, _KS + 1):
            s = dpad_ref[0, _KS + dy: _KS + dy + H, _KS + dx: _KS + dx + W]
            depth_range = jnp.abs(s - d)
            is_border = (s <= 0.0) | (s >= 1.0) | (depth_range > drm)
            gauss_range = 1.0 - jnp.minimum(depth_range, drm) / drm_safe
            border = border + is_border.astype(d.dtype)
            wr = wr + jnp.where(is_border, 0.0, gauss_range)
    border_ref[0] = border
    wr_ref[0] = wr


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilateral13_tpu(depth_m: jnp.ndarray, depth_limits: jnp.ndarray,
                    interpret: bool = False):
    """(N, H, W) metric depth + (N, 2) [near, far] ->
    (depth_bf_sum, weight_sum, range_weight_sum), each (N, H, W).
    Grid over the sensor axis; each step's map block lives in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, W = depth_m.shape
    dpad = _pad_for_stencil(depth_m)
    Hp, Wp = dpad.shape[1:]
    out = jax.ShapeDtypeStruct((N, H, W), jnp.float32)
    block = lambda h, w: pl.BlockSpec(  # noqa: E731
        (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _bilateral_kernel,
        grid=(N,),
        out_shape=(out, out, out),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block(Hp, Wp),
            block(H, W),
        ],
        out_specs=(block(H, W), block(H, W), block(H, W)),
        interpret=interpret,
    )(depth_limits.astype(jnp.float32), dpad, depth_m)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quality13_tpu(depth_norm: jnp.ndarray, interpret: bool = False):
    """(N, H, W) normalized depth -> (border_count, range_weight_sum)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, W = depth_norm.shape
    dpad = _pad_for_stencil(depth_norm)
    Hp, Wp = dpad.shape[1:]
    out = jax.ShapeDtypeStruct((N, H, W), jnp.float32)
    block = lambda h, w: pl.BlockSpec(  # noqa: E731
        (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _quality_kernel,
        grid=(N,),
        out_shape=(out, out),
        in_specs=[block(Hp, Wp), block(H, W)],
        out_specs=(block(H, W), block(H, W)),
        interpret=interpret,
    )(dpad, depth_norm)
