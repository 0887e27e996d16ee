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

from functools import lru_cache
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from .sampling import bilinear_2d


def pull(
    color: jnp.ndarray, depth: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One pull step: (H, W, 4), (H, W) -> (H//2, W//2, 4), (H//2, W//2).

    tsdf_inpaint.fs:34-90.
    """
    H, W = depth.shape
    H2, W2 = max(H // 2, 1), max(W // 2, 1)

    # Offsets are -1..+2 around even texels. A naive stride-2 slice per tap
    # costs a lane-shuffling strided read of the full map 16x per array;
    # instead split each array ONCE into its 4 even/odd phase planes (the
    # only strided reads), after which every tap is a contiguous slice of a
    # quarter-size plane — ~8x less strided traffic, identical values.
    def phases(arr):
        pad_width = [(1, 2 + 2 * H2 - H), (1, 2 + 2 * W2 - W)] + [(0, 0)] * (
            arr.ndim - 2
        )
        q = jnp.pad(arr, pad_width, mode="edge")  # (2*H2+3, 2*W2+3, ...)
        return [[q[by::2, bx::2] for bx in (0, 1)] for by in (0, 1)]

    def make_fetch(arr):
        ph = phases(arr)

        def fetch(dy, dx):
            # input row 2j + dy maps into phase (dy+1)%2 at offset (dy+1)//2
            sy, by = divmod(dy + 1, 2)
            sx, bx = divmod(dx + 1, 2)
            return ph[by][bx][sy : sy + H2, sx : sx + W2]

        return fetch

    fetch_c = make_fetch(color)
    fetch_d = make_fetch(depth)

    sum_d = jnp.zeros((H2, W2), jnp.float32)
    cnt = jnp.zeros((H2, W2), jnp.float32)

    samples = []  # (rgb, d, valid) per offset; two-phase like the shader
    for dx in range(-1, 3):
        for dy in range(-1, 3):
            c = fetch_c(dy, dx)
            d = fetch_d(dy, dx)
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
    center_d = fetch_d(0, 0)
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


@lru_cache(maxsize=64)
def _nearest_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) 0/1 row-selection matrix: out[i] = in[i * n_in // n_out]
    — the nearest-texel fetch of push() as a linear map."""
    m = np.zeros((n_out, n_in), np.float32)
    src = np.clip(np.arange(n_out) * n_in // n_out, 0, n_in - 1)
    m[np.arange(n_out), src] = 1.0
    return m


@lru_cache(maxsize=64)
def _bilinear_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix reproducing GL bilinear sampling of
    an n_in-texel axis at the n_out pixel centers (sampling.py semantics:
    x = c*n_in - 0.5, taps floor(x), floor(x)+1 clamped to the edge). Exact:
    bilinear sampling is linear in the texel values, so the matrix form is
    bit-equivalent up to f32 summation order."""
    m = np.zeros((n_out, n_in), np.float32)
    c = (np.arange(n_out, dtype=np.float64) + 0.5) / n_out
    x = c * n_in - 0.5
    x0 = np.floor(x)
    fx = x - x0
    i0 = np.clip(x0.astype(np.int64), 0, n_in - 1)
    i1 = np.clip(x0.astype(np.int64) + 1, 0, n_in - 1)
    rows = np.arange(n_out)
    np.add.at(m, (rows, i0), (1.0 - fx).astype(np.float32))
    np.add.at(m, (rows, i1), fx.astype(np.float32))
    return m


def _resample_matmul(img: jnp.ndarray, my: np.ndarray, mx: np.ndarray):
    """(Hl, Wl, C) -> (H, W, C) via separable interpolation matmuls on the
    MXU. my: (H, Hl), mx: (W, Wl). Replaces per-pixel gathers (4 rows per
    pixel per level through XLA's gather at ~140M rows/s) with two dense
    matmuls — the TPU-first formulation of texture upsampling."""
    Hl, Wl, C = img.shape
    a = jnp.einsum("hk,kwc->hwc", jnp.asarray(my), img,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("wk,hkc->hwc", jnp.asarray(mx), a,
                      preferred_element_type=jnp.float32)


def push(colors: List[jnp.ndarray], depths: List[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Colorfill: produce the final full-res image (tsdf_colorfill.fs:30-55).

    Returns (rgba (H, W, 4), depth (H, W)).

    All per-level resampling (nearest fetch :36-40, bilinear blend sources
    :42-52) is expressed as separable interpolation matmuls (exact — see
    _bilinear_matrix) so the pass runs on the MXU instead of the gather unit.
    """
    H, W = depths[0].shape
    L = len(colors)

    # nearest-texel fetch of every level at this pixel (:36-40)
    fetched = []
    for l in range(L):
        Hl, Wl = depths[l].shape
        if l == 0:
            fetched.append(colors[0])
        else:
            fetched.append(
                _resample_matmul(
                    colors[l], _nearest_matrix(H, Hl), _nearest_matrix(W, Wl)
                )
            )
    stack = jnp.stack(fetched)  # (L, H, W, 4)

    valid = stack[..., 3] > 0.0
    # first valid level; if none, stays at L-1
    level = jnp.argmax(valid, axis=0).astype(jnp.int32)
    level = jnp.where(jnp.any(valid, axis=0), level, L - 1)

    def select_level(arrs, lvl):
        # per-pixel level selection as an elementwise where-chain (L is
        # small/static) — fuses into the surrounding pass instead of
        # lowering to a full-screen gather row per pixel
        out = arrs[L - 1]
        for l in range(L - 2, -1, -1):
            out = jnp.where((lvl == l)[..., None], arrs[l], out)
        return out

    base = select_level(stack, level)

    # bilinear samples of every level at the pixel's texcoord, for the
    # level>0 blend path (:42-52); level 0 is never selected as a blend
    # source (l1 = level+1 >= 1)
    bilin = jnp.stack(
        [jnp.zeros((H, W, 4), jnp.float32)]
        + [
            _resample_matmul(
                colors[l],
                _bilinear_matrix(H, colors[l].shape[0]),
                _bilinear_matrix(W, colors[l].shape[1]),
            )
            for l in range(1, L)
        ]
    )

    l1 = jnp.clip(level + 1, 0, L - 1)
    l2 = jnp.clip(level + 2, 0, L - 1)
    c1 = select_level(bilin, l1)
    c2 = select_level(bilin, l2)
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    v = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    uu, vv = jnp.meshgrid(u, v)
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
