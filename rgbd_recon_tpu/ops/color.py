"""Color space conversion — RGB to CIE LAB.

Replicates glsl/inc_color.glsl exactly, *including* its quirk of dividing
texture values (already in [0,1]) by 255 again (inc_color.glsl:14-16). The
resulting compressed LAB scale is what the reference's color-consistency
thresholds (e.g. max_color_dist = 0.5 in pre_boundary.fs:19) are tuned
against, so parity requires keeping it.
"""

from __future__ import annotations

import jax.numpy as jnp

_WHITE_REFERENCE = (95.047, 100.000, 108.883)
_EPSILON = 0.008856
_KAPPA = 903.3


def _pivot_rgb(n):
    # inc_color.glsl:8-10
    return jnp.where(
        n > 0.04045,
        jnp.power(jnp.maximum((n + 0.055) / 1.055, 1e-12), 2.4),
        n / 12.92,
    ) * 100.0


def _pivot_xyz(n):
    # inc_color.glsl:27-29
    return jnp.where(
        n > _EPSILON,
        jnp.cbrt(jnp.maximum(n, 0.0)),
        (_KAPPA * n + 16.0) / 116.0,
    )


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB in [0, 1] -> (..., 3) LAB (reference-scaled).

    inc_color.glsl:45-47 via rgb_to_xyz (:12-25) and xyz_to_lab (:31-43).
    """
    n = _pivot_rgb(rgb / 255.0)
    r, g, b = n[..., 0], n[..., 1], n[..., 2]
    x = r * 0.4124 + g * 0.3576 + b * 0.1805
    y = r * 0.2126 + g * 0.7152 + b * 0.0722
    z = r * 0.0193 + g * 0.1192 + b * 0.9505

    px = _pivot_xyz(x / _WHITE_REFERENCE[0])
    py = _pivot_xyz(y / _WHITE_REFERENCE[1])
    pz = _pivot_xyz(z / _WHITE_REFERENCE[2])

    l = jnp.maximum(0.0, 116.0 * py - 16.0)
    a = 500.0 * (px - py)
    bb = 200.0 * (py - pz)
    return jnp.stack([l, a, bb], axis=-1)
