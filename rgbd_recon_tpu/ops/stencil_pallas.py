"""Pallas TPU kernels for the 13x13 preprocessing stencils.

The two heaviest preprocess passes are dense 13x13 sliding-window reductions
per sensor (the reference's hot fragment shaders, SURVEY.md §3.2):

  bilateral   glsl/pre_depth.fs:85-127   depth-adaptive bilateral filter
  quality     glsl/pre_quality.fs:65-119 lateral-continuity census

The portable jnp implementation (ops/preprocess.py) unrolls the 169 taps as
shifted slices, which XLA fuses but still schedules as many full-map passes.
These kernels keep the map block VMEM-resident and reduce the window on-chip.

Kernel shape chosen for the Mosaic compiler:
  - a fully unrolled 169-tap kernel takes pathologically long to compile;
  - dynamic sublane offsets (``ref[pl.ds(r, H), ...]``) are rejected unless
    provably 8-aligned;
so the row dimension of the window is materialized as 13 pre-shifted views
of the edge-padded map (cheap XLA slices) and the kernel GRID iterates
(sensor, row): each step unrolls only the 13 static lane offsets and
accumulates into revisited output blocks (the standard reduction-grid
pattern). Accumulation order (dy outer, dx inner) matches the jnp fold, so
parity tests agree to f32 rounding.

Dispatched by ops/preprocess.py on TPU backends; the jnp path remains the
reference implementation and the CPU fallback (the parity tests run these
kernels in interpret mode off-TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_KS = 6  # window radius: 13x13 (pre_depth.fs / pre_quality.fs)
_NR = 2 * _KS + 1


def have_pallas_tpu() -> bool:
    """True when the default backend can run Mosaic TPU kernels."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


# backwards-compatible private alias
_have_pallas_tpu = have_pallas_tpu


_STRIPE = 64  # H-stripe per grid step: bounds the kernel's VMEM stack


def _pad_h(x: jnp.ndarray):
    """Pad the row axis of (N, H, ...) to a _STRIPE multiple (padding rows
    are computed then cropped)."""
    N, H = x.shape[:2]
    hp = -(-H // _STRIPE) * _STRIPE
    pad = [(0, 0), (0, hp - H)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad, mode="edge"), hp


def _shifted_rows(depth: jnp.ndarray, hp: int):
    """(N, H, W) -> (N, 13, Hp, Wp): row r holds the map shifted by
    dy = r - 6 with edge padding; lanes padded to a 128 multiple (padding
    columns/rows never read)."""
    N, H, W = depth.shape
    wp = -(-(W + 2 * _KS) // 128) * 128
    dpad = jnp.pad(
        depth,
        ((0, 0), (_KS, _KS + hp - H), (_KS, wp - W - _KS)),
        mode="edge",
    )
    return jnp.stack([dpad[:, r: r + hp, :] for r in range(_NR)], axis=1)


def _bilateral_kernel(limits_ref, rows_ref, d_ref, bf_ref, w_ref, wr_ref):
    """One (sensor, window-row) step; outputs are revisited accumulators.

    limits_ref: (N, 2) [near, far] in SMEM
    rows_ref: (1, 1, H, Wp) the dy = r - 6 shifted map
    d_ref:    (1, H, W) center depth
    """
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    r = pl.program_id(2)

    @pl.when(r == 0)
    def _():
        bf_ref[0] = jnp.zeros_like(bf_ref[0])
        w_ref[0] = jnp.zeros_like(w_ref[0])
        wr_ref[0] = jnp.zeros_like(wr_ref[0])

    near = limits_ref[i, 0]
    far = limits_ref[i, 1]
    d = d_ref[0]
    H, W = d.shape
    drm = 0.35 * d / 4.5  # dist_range_max, pre_depth.fs:89-91 (_MAX_DEPTH)
    drm_safe = jnp.maximum(drm, 1e-20)
    dy = r.astype(jnp.float32) - _KS

    bf = bf_ref[0]
    w = w_ref[0]
    wr = wr_ref[0]
    for dx in range(-_KS, _KS + 1):
        s = rows_ref[0, 0, :, _KS + dx: _KS + dx + W]
        depth_range = jnp.abs(s - d)
        border = (s < near) | (s > far) | (depth_range > drm)
        gauss_space = 1.0 - jnp.sqrt(dy * dy + float(dx * dx)) / _KS
        gauss_range = 1.0 - jnp.minimum(depth_range, drm) / drm_safe
        w_s = jnp.where(border, 0.0, gauss_space * gauss_range)
        bf = bf + w_s * s
        w = w + w_s
        wr = wr + jnp.where(border, 0.0, gauss_range)
    bf_ref[0] = bf
    w_ref[0] = w
    wr_ref[0] = wr


def _quality_kernel(rows_ref, d_ref, border_ref, wr_ref):
    """One (sensor, window-row) quality-census step
    (pre_quality.fs:65-119)."""
    import jax.experimental.pallas as pl

    r = pl.program_id(2)

    @pl.when(r == 0)
    def _():
        border_ref[0] = jnp.zeros_like(border_ref[0])
        wr_ref[0] = jnp.zeros_like(wr_ref[0])

    d = d_ref[0]
    H, W = d.shape
    drm = 0.35 * d  # max_depth = 1.0 in normalized units
    drm_safe = jnp.maximum(drm, 1e-20)

    border = border_ref[0]
    wr = wr_ref[0]
    for dx in range(-_KS, _KS + 1):
        s = rows_ref[0, 0, :, _KS + dx: _KS + dx + W]
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
    (depth_bf_sum, weight_sum, range_weight_sum), each (N, H, W)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, W = depth_m.shape
    dp, hp = _pad_h(depth_m)
    rows = _shifted_rows(depth_m, hp)
    Wp = rows.shape[-1]
    out = jax.ShapeDtypeStruct((N, hp, W), jnp.float32)
    out_spec = pl.BlockSpec(
        (1, _STRIPE, W), lambda i, h, r: (i, h, 0), memory_space=pltpu.VMEM
    )
    res = pl.pallas_call(
        _bilateral_kernel,
        grid=(N, hp // _STRIPE, _NR),
        out_shape=(out, out, out),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, _STRIPE, Wp), lambda i, h, r: (i, r, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _STRIPE, W), lambda i, h, r: (i, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        interpret=interpret,
    )(depth_limits.astype(jnp.float32), rows, dp)
    return tuple(r_[:, :H] for r_ in res)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quality13_tpu(depth_norm: jnp.ndarray, interpret: bool = False):
    """(N, H, W) normalized depth -> (border_count, range_weight_sum)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, W = depth_norm.shape
    dp, hp = _pad_h(depth_norm)
    rows = _shifted_rows(depth_norm, hp)
    Wp = rows.shape[-1]
    out = jax.ShapeDtypeStruct((N, hp, W), jnp.float32)
    out_spec = pl.BlockSpec(
        (1, _STRIPE, W), lambda i, h, r: (i, h, 0), memory_space=pltpu.VMEM
    )
    res = pl.pallas_call(
        _quality_kernel,
        grid=(N, hp // _STRIPE, _NR),
        out_shape=(out, out),
        in_specs=[
            pl.BlockSpec((1, 1, _STRIPE, Wp), lambda i, h, r: (i, r, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _STRIPE, W), lambda i, h, r: (i, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(rows, dp)
    return tuple(r_[:, :H] for r_ in res)
