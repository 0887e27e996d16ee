"""Pallas TPU kernels for the per-frame march-volume bake.

The render's bake (TsdfPipeline.make_render_fn bake()) turns the fused TSDF
volume into the march table: a 1-voxel dilation for the surface-brick mask,
a K-round Chebyshev clearance field (skip sentinels), the brick-level far
field, and the bf16 pack. In jnp this is ~25 dense passes over the 8.8M-voxel
volume that XLA schedules as separate HBM round trips (~11 ms in-program,
scripts/profile_render3.py). These kernels keep a z-brick slab VMEM-resident
and do all rounds on-chip: HBM traffic drops to one volume read + one
half-size write per kernel.

Math is identical to the jnp path (tsdf_pipeline._dilate3 /
fine_safe_field / sentinel_volume): 1-step box dilations with zero
(no-wraparound) shift-and-pad semantics, safe = min(chebyshev_dist - 1, K),
sentinel encoding -(2 + max(fine_safe, brick_safe * brick_vox)).

Used on brick-aligned volumes with brick_vox >= skip rounds (the halo of
one neighboring z-brick tile covers the dilation reach); the jnp path
remains the reference implementation, the CPU fallback, and the dist/
shard-wise form (which needs explicit z-slab halos anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .stencil_pallas import have_pallas_tpu  # noqa: F401  (re-export)


def _dil3_tile(d, tmp_dtype):
    """One 3^3 box dilation on a VMEM-resident tile: per-axis max of the
    zero-padded +-1 shifts (matches tsdf_pipeline._dilate1 semantics)."""
    for ax in range(3):
        n = d.shape[ax]
        lo = [slice(None)] * 3
        lo[ax] = slice(1, None)
        hi = [slice(None)] * 3
        hi[ax] = slice(None, n - 1)
        zshape = list(d.shape)
        zshape[ax] = 1
        z = jnp.zeros(zshape, tmp_dtype)
        d = jnp.maximum(
            d,
            jnp.maximum(
                jnp.concatenate([d[tuple(lo)], z], axis=ax),
                jnp.concatenate([z, d[tuple(hi)]], axis=ax),
            ),
        )
    return d


@functools.partial(
    jax.jit, static_argnames=("brick_vox", "interpret")
)
def surface_occ_tpu(volume: jnp.ndarray, brick_vox: int,
                    interpret: bool = False) -> jnp.ndarray:
    """(Bz, By, Bx) bool surface-brick mask: any-pool of the 1-voxel
    dilated positive set (tsdf_pipeline._surface_brick_mask), one fused
    pass. Requires brick-aligned dims."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Z, Y, X = volume.shape
    v = brick_vox
    Bz, By, Bx = Z // v, Y // v, X // v
    mf = jnp.bfloat16

    def kernel(prev_ref, cur_ref, next_ref, out_ref):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        pos_p = (prev_ref[...] > 0.0).astype(mf)
        pos_c = (cur_ref[...] > 0.0).astype(mf)
        pos_n = (next_ref[...] > 0.0).astype(mf)
        # zero out the clamped boundary tiles (no wraparound)
        pos_p = jnp.where(i > 0, pos_p, jnp.zeros_like(pos_p))
        pos_n = jnp.where(i < n - 1, pos_n, jnp.zeros_like(pos_n))
        d = jnp.concatenate([pos_p[v - 1:], pos_c, pos_n[:1]], axis=0)
        d = _dil3_tile(d, mf)
        # z-max of the core slab only: Mosaic rejects lane-dim reshapes,
        # so the (By, v, Bx, v) any-pool happens on the tiny z-pooled
        # plane outside the kernel
        out_ref[0] = d[1: 1 + v].max(axis=0)

    plane = pl.pallas_call(
        kernel,
        grid=(Bz,),
        in_specs=[
            pl.BlockSpec((v, Y, X), lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, Y, X), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (v, Y, X),
                lambda i: (jnp.minimum(i + 1, pl.num_programs(0) - 1), 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Y, X), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bz, Y, X), mf),
        interpret=interpret,
    )(volume, volume, volume)
    return plane.reshape(Bz, By, v, Bx, v).max(axis=(2, 4)) > 0.0


@functools.partial(
    jax.jit,
    static_argnames=("brick_vox", "rounds", "out_dtype", "interpret"),
)
def sentinel_bake_tpu(
    volume: jnp.ndarray,        # (Z, Y, X) f32 fused TSDF
    bs_scaled: jnp.ndarray,     # (Bz, By, Bx) f32 brick_safe * brick_vox
    brick_vox: int,
    rounds: int,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sentinel-coded march volume in one fused pass: equivalent of
    fine_safe_field (``rounds`` box dilations) + sentinel_volume (far-field
    broadcast + encode) + the dtype cast of PackedVolume.from_volume.
    Requires brick-aligned dims and brick_vox >= rounds (the +-1-tile halo
    then covers the dilation reach)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Z, Y, X = volume.shape
    v = brick_vox
    Bz = Z // v
    assert v >= rounds, "halo of one z-brick tile must cover the reach"
    mf = jnp.bfloat16
    K = rounds
    # per-z-brick far-field plane, broadcast OUTSIDE the kernel (Mosaic
    # rejects lane-dim repeats); (Bz, Y, X) f32 is only volume/v bytes
    bs_plane = jnp.repeat(
        jnp.repeat(bs_scaled, v, axis=1), v, axis=2
    )

    def kernel(prev_ref, cur_ref, next_ref, bs_ref, out_ref):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        pos_p = (prev_ref[...] > 0.0).astype(mf)
        pos_c = (cur_ref[...] > 0.0).astype(mf)
        pos_n = (next_ref[...] > 0.0).astype(mf)
        pos_p = jnp.where(i > 0, pos_p, jnp.zeros_like(pos_p))
        pos_n = jnp.where(i < n - 1, pos_n, jnp.zeros_like(pos_n))
        d = jnp.concatenate([pos_p[v - K:], pos_c, pos_n[:K]], axis=0)
        safe = jnp.zeros((v, Y, X), mf)
        one = jnp.ones((), mf)
        for _ in range(K):
            d = _dil3_tile(d, mf)
            safe = safe + (one - d[K: K + v])
        field = jnp.maximum(safe.astype(jnp.float32), bs_ref[0][None])
        core = cur_ref[...]
        out_ref[...] = jnp.where(
            field > 0.0, -(2.0 + field), core
        ).astype(out_dtype)

    return pl.pallas_call(
        kernel,
        grid=(Bz,),
        in_specs=[
            pl.BlockSpec((v, Y, X), lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, Y, X), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (v, Y, X),
                lambda i: (jnp.minimum(i + 1, pl.num_programs(0) - 1), 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Y, X), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((v, Y, X), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z, Y, X), out_dtype),
        interpret=interpret,
    )(volume, volume, volume, bs_plane)
