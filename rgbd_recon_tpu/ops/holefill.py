"""Pull-push hole filling (inpaint + colorfill) over a mip pyramid.

Replicates the reference's multi-LOD fill (fillColors,
recon_integration.cpp:280-339) with its two kernels:

  pull  glsl/tsdf_inpaint.fs   LOD l -> l+1: 4x4 window (offsets -1..+2),
        invalid samples (alpha <= 0) dropped; among valid samples only those
        at or behind the average depth contribute (:75-85) — holes fill from
        the far side.
  push  glsl/tsdf_colorfill.fs LOD0 output: walk up the pyramid to the first
        valid level (:36-40); if the base level was invalid, blend the two
        coarser levels bilinearly (:42-52).

Design difference (documented, intentional): the reference packs all LODs
into one 1.5w x h atlas because GL wants a single texture (ViewLod,
framework/rendering/view_lod.cpp:24-61); here the pyramid is a plain list of
per-LOD arrays — the atlas packing is a GL artifact with no TPU benefit
(SURVEY.md §7 step 4). The reference's push-blend weight
``distance(pass_TexCoord, floor(pass_TexCoord))`` (tsdf_colorfill.fs:47) —
i.e. the screen-position norm — is reproduced verbatim for parity.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from .sampling import bilinear_2d


def pull(
    color: jnp.ndarray, depth: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One pull step: (H, W, 4), (H, W) -> (H//2, W//2, 4), (H//2, W//2).

    tsdf_inpaint.fs:34-90.
    """
    H, W = depth.shape
    H2, W2 = max(H // 2, 1), max(W // 2, 1)

    # offsets are -1..+2 around even texels: edge-pad by (1, 2) and read
    # strided slices — pure data movement XLA fuses, instead of the gathers
    # an integer-array index would lower to (~35x cheaper on TPU)
    def fetch(arr, dy, dx):
        pad_width = [(1, 2), (1, 2)] + [(0, 0)] * (arr.ndim - 2)
        p = jnp.pad(arr, pad_width, mode="edge")
        return p[1 + dy : 1 + dy + 2 * H2 : 2, 1 + dx : 1 + dx + 2 * W2 : 2]

    sum_rgb = jnp.zeros((H2, W2, 3), jnp.float32)
    sum_d = jnp.zeros((H2, W2), jnp.float32)
    cnt = jnp.zeros((H2, W2), jnp.float32)

    samples = []  # (rgb, d, valid) per offset; two-phase like the shader
    for dx in range(-1, 3):
        for dy in range(-1, 3):
            c = fetch(color, dy, dx)
            d = fetch(depth, dy, dx)
            valid = c[..., 3] > 0.0
            sum_d = sum_d + jnp.where(valid, d, 0.0)
            cnt = cnt + valid.astype(jnp.float32)
            samples.append((c[..., :3], d, valid))

    depth_av = sum_d / jnp.maximum(cnt, 1.0)

    total_rgb = jnp.zeros((H2, W2, 3), jnp.float32)
    total_d = jnp.zeros((H2, W2), jnp.float32)
    total_w = jnp.zeros((H2, W2), jnp.float32)
    for rgb, d, valid in samples:
        keep = valid & (d >= depth_av)  # :77 — fill from the far side
        total_rgb = total_rgb + jnp.where(keep[..., None], rgb, 0.0)
        total_d = total_d + jnp.where(keep, d, 0.0)
        total_w = total_w + keep.astype(jnp.float32)

    w = jnp.maximum(total_w, 1.0)
    out_rgb = total_rgb / w[..., None]
    out_d_filled = total_d / w

    # no valid sample: propagate the center depth; alpha -1 marks a fillable
    # hole, the (0,1,0,0) marker is background (:59-68)
    center_d = fetch(depth, 0, 0)
    hole = center_d < 1.0
    empty_rgb = jnp.where(
        hole[..., None],
        jnp.zeros((H2, W2, 3), jnp.float32),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], jnp.float32), (H2, W2, 3)),
    )
    empty_a = jnp.where(hole, -1.0, 0.0)

    has = cnt > 0
    rgb = jnp.where(has[..., None], out_rgb, empty_rgb)
    alpha = jnp.where(has, 1.0, empty_a)
    d_out = jnp.where(has, out_d_filled, center_d)
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1), d_out


def build_pyramid(
    color0: jnp.ndarray, depth0: jnp.ndarray, num_lods: int
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Repeated pull (the inpaint loop, recon_integration.cpp:286-309)."""
    colors, depths = [color0], [depth0]
    for _ in range(num_lods - 1):
        if min(depths[-1].shape) <= 1:
            break
        c, d = pull(colors[-1], depths[-1])
        colors.append(c)
        depths.append(d)
    return colors, depths


def push(colors: List[jnp.ndarray], depths: List[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Colorfill: produce the final full-res image (tsdf_colorfill.fs:30-55).

    Returns (rgba (H, W, 4), depth (H, W))."""
    H, W = depths[0].shape
    L = len(colors)

    ii = jnp.arange(W, dtype=jnp.int32)
    jj = jnp.arange(H, dtype=jnp.int32)

    # nearest-texel fetch of every level at this pixel (:36-40)
    fetched = []
    for l in range(L):
        Hl, Wl = depths[l].shape
        yl = jnp.clip(jj * Hl // H, 0, Hl - 1)
        xl = jnp.clip(ii * Wl // W, 0, Wl - 1)
        fetched.append(colors[l][yl][:, xl])
    stack = jnp.stack(fetched)  # (L, H, W, 4)

    valid = stack[..., 3] > 0.0
    # first valid level; if none, stays at L-1
    level = jnp.argmax(valid, axis=0).astype(jnp.int32)
    level = jnp.where(jnp.any(valid, axis=0), level, L - 1)

    base = jnp.take_along_axis(stack, level[None, ..., None], axis=0)[0]

    # bilinear samples of every level at the pixel's texcoord, for the
    # level>0 blend path (:42-52)
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    v = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    uu, vv = jnp.meshgrid(u, v)
    texcoord = jnp.stack([uu, vv], axis=-1)
    # level 0 is never selected as a blend source (l1 = level+1 >= 1), and
    # its full-res bilinear would be half the pyramid's gather cost — skip it
    bilin = jnp.stack(
        [jnp.zeros((H, W, 4), jnp.float32)]
        + [bilinear_2d(colors[l], texcoord) for l in range(1, L)]
    )

    l1 = jnp.clip(level + 1, 0, L - 1)
    l2 = jnp.clip(level + 2, 0, L - 1)
    c1 = jnp.take_along_axis(bilin, l1[None, ..., None], axis=0)[0]
    c2 = jnp.take_along_axis(bilin, l2[None, ..., None], axis=0)[0]
    # the reference's screen-position weight quirk (:47-48)
    w1 = jnp.sqrt(uu**2 + vv**2)
    w2 = 1.0 - w1
    blend = (c1 * w1[..., None] + c2 * w2[..., None]) / jnp.where(
        jnp.abs(w1 + w2)[..., None] < 1e-20, 1e-20, (w1 + w2)[..., None]
    )

    out = jnp.where((level > 0)[..., None], blend, base)
    return out, depths[0]


def fill_colors(
    color0: jnp.ndarray, depth0: jnp.ndarray, num_lods: int = 7
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full pull-push pass (ReconIntegration::fillColors,
    recon_integration.cpp:280-339)."""
    colors, depths = build_pyramid(color0, depth0, num_lods)
    return push(colors, depths)
