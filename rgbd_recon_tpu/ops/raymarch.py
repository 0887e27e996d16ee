"""TSDF raymarching — surface extraction + multi-sensor color blending.

Exact math of glsl/tsdf_raymarch.fs, restructured for TPU: the per-ray
while-loop with early exit (:92-110) becomes a fixed-trip ``lax.scan`` over
step index, vectorized over all pixels, with a per-ray active mask (rays that
already hit, or whose [t_near, t_far] interval is exhausted, are masked out).
This is the SURVEY.md §7 "hard parts" answer to divergent marching: dense
masked marching with a static step count; the secant refinement on sign
change (:98-101) is reproduced bit-for-bit.

Marching happens in volume-normalized coordinates [0,1]^3 with step length
``tsdf_limit / 2`` (:34), exactly like the reference (pass_Position and
CameraPos are volume-space there).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import bilinear_2d, trilinear_3d


@dataclasses.dataclass(frozen=True)
class ViewCamera:
    """Virtual render camera (the reference's gloost PerspectiveCamera +
    navigation, source/kinect_client.cpp:612-673)."""

    width: int
    height: int
    fov_y: float = 50.0         # degrees (kinect_client.cpp camera init)
    near: float = 0.1
    far: float = 20.0
    eye: Tuple[float, float, float] = (0.0, 1.2, 3.0)
    target: Tuple[float, float, float] = (0.0, 1.1, 0.0)
    up: Tuple[float, float, float] = (0.0, 1.0, 0.0)

    def rotation(self) -> np.ndarray:
        """Camera-to-world rotation, GL convention (x right, y up, z
        backward — camera looks along -z)."""
        eye = np.asarray(self.eye, np.float32)
        tgt = np.asarray(self.target, np.float32)
        fwd = tgt - eye
        fwd /= np.linalg.norm(fwd)
        up = np.asarray(self.up, np.float32)
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, fwd)
        return np.stack([right, true_up, -fwd], axis=1)

    def ray_directions_world(self) -> np.ndarray:
        """(H, W, 3) un-normalized world-space ray directions through each
        pixel center."""
        H, W = self.height, self.width
        aspect = W / H
        tan_half = np.tan(np.radians(self.fov_y) * 0.5)
        xs = ((np.arange(W, dtype=np.float32) + 0.5) / W * 2.0 - 1.0) * tan_half * aspect
        ys = (1.0 - (np.arange(H, dtype=np.float32) + 0.5) / H * 2.0) * tan_half
        xx, yy = np.meshgrid(xs, ys)
        dirs_cam = np.stack([xx, yy, -np.ones_like(xx)], axis=-1)
        return dirs_cam @ self.rotation().T

    def world_to_view(self, p: jnp.ndarray) -> jnp.ndarray:
        """World -> GL view space (camera at origin looking down -z)."""
        r = jnp.asarray(self.rotation())
        eye = jnp.asarray(np.asarray(self.eye, np.float32))
        return (p - eye) @ r

    def window_depth(self, view_z: jnp.ndarray) -> jnp.ndarray:
        """GL window-space depth in [0,1] from positive view distance
        (equivalent of tsdf_raymarch.fs:133's projection arithmetic)."""
        n, f = self.near, self.far
        z = jnp.maximum(view_z, n * 1.001)
        return jnp.clip((1.0 / n - 1.0 / z) / (1.0 / n - 1.0 / f), 0.0, 1.0)


def _intersect_unit_box(origin: jnp.ndarray, direction: jnp.ndarray):
    """Slab test against [0,1]^3 (tsdf_raymarch.fs:371-382). t is in units
    of |direction|."""
    inv = 1.0 / direction
    tbot = inv * (0.0 - origin)
    ttop = inv * (1.0 - origin)
    tmin = jnp.minimum(ttop, tbot)
    tmax = jnp.maximum(ttop, tbot)
    t0 = jnp.max(tmin, axis=-1)
    t1 = jnp.min(tmax, axis=-1)
    return t0, t1


def _nearest_sample(vol_flat: jnp.ndarray, shape, pos: jnp.ndarray):
    """Nearest-voxel volume sample: one gather row per position (vs 8 for
    trilinear — the dominant cost at XLA's ~140M gather-rows/s)."""
    D, H, W = shape
    xi = jnp.clip((pos[..., 0] * W).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip((pos[..., 1] * H).astype(jnp.int32), 0, H - 1)
    zi = jnp.clip((pos[..., 2] * D).astype(jnp.int32), 0, D - 1)
    return vol_flat[(zi * H + yi) * W + xi]


@dataclasses.dataclass(frozen=True)
class PackedVolume:
    """TSDF volume packed as x-pair rows for fast sampling.

    Two layouts:

    - ``half=False`` (default): row (z, y, x) holds
      (v[z,y,x], v[z,y,min(x+1,X-1)]) — overlapping pairs, so a nearest
      sample is ONE 2-wide row gather and a trilinear sample is FOUR (one
      per (z,y) corner pair) instead of eight scalar gathers.
    - ``half=True``: row (z, y, k) holds (v[z,y,2k], v[z,y,2k+1]) —
      non-overlapping pairs, HALVING the table (17.6 vs 35 MB bf16 at
      reference scale). Gather throughput falls off a cliff once the table
      leaves the fast size class (~256 M rows/s below ~32 MB vs ~156 M at
      34 MB, scripts/probe_gather_rates.py), so the march's per-step
      nearest fetch runs ~1.6x faster from the half table; a nearest
      sample is one row gather + a lane select on x&1. Trilinear x-taps
      can straddle rows (two gathers per corner pair), so the half layout
      is for the nearest-stepping march only.

    Built once per frame (reads + one write of the volume,
    bandwidth-bound)."""

    pairs: jnp.ndarray  # (Z*Y*X, 2) or (Z*Y*ceil(X/2), 2) when half
    shape: Tuple[int, int, int]
    half: bool = False

    @classmethod
    def from_volume(cls, volume: jnp.ndarray, dtype=None,
                    half: bool = False) -> "PackedVolume":
        """``dtype=jnp.bfloat16`` halves the table and keeps it in a faster
        gather size class (scripts/probe_gather_rates.py). TSDF values are
        +-limit so the absolute rounding error is ~limit * 2^-8 (~0.2 mm of
        surface position at reference scale); skip sentinels must use the
        INTEGER encoding (-(2 + steps), exact in bf16) rather than the
        scaled one."""
        if dtype is not None:
            volume = volume.astype(dtype)
        if half:
            Z, Y, X = volume.shape
            if X % 2:
                volume = jnp.concatenate([volume, volume[:, :, -1:]], axis=2)
            pairs = volume.reshape(Z, Y, -1, 2).reshape(-1, 2)
            return cls(pairs=pairs, shape=(Z, Y, X), half=True)
        nxt = jnp.concatenate([volume[:, :, 1:], volume[:, :, -1:]], axis=2)
        pairs = jnp.stack([volume, nxt], axis=-1).reshape(-1, 2)
        return cls(pairs=pairs, shape=tuple(volume.shape))

    def sample_nearest(self, pos: jnp.ndarray) -> jnp.ndarray:
        """GL NEAREST semantics sample at normalized pos (..., 3)."""
        return self.sample_nearest_p(pos[..., 0], pos[..., 1], pos[..., 2])

    def sample_nearest_p(self, px, py, pz) -> jnp.ndarray:
        """Planar-coordinate nearest sample: TPU lanes want (R,) component
        arrays, not (R, 3) (a 3-wide minor axis runs at 3/128 lane
        utilization and dominated the march's per-iteration cost)."""
        D, H, W = self.shape
        xi = jnp.clip((px * W).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip((py * H).astype(jnp.int32), 0, H - 1)
        zi = jnp.clip((pz * D).astype(jnp.int32), 0, D - 1)
        if self.half:
            W2 = self.pairs.shape[0] // (D * H)
            rows = self.pairs[(zi * H + yi) * W2 + (xi >> 1)]
            v = jnp.where(xi & 1, rows[..., 1], rows[..., 0])
            return v.astype(jnp.float32)
        rows = self.pairs[(zi * H + yi) * W + xi]
        return rows[..., 0].astype(jnp.float32)

    def sample_trilinear(self, pos: jnp.ndarray,
                         clamp_floor: float = None) -> jnp.ndarray:
        """GL LINEAR semantics sample (identical taps/weights to
        sampling.trilinear_3d) in 4 pair-row gathers. ``clamp_floor``
        clamps each tap from below before interpolation — used to neutralise
        the -2.0 skip sentinel of the marched volume (see
        TsdfPipeline: empty-brick skipping) back to the -limit truncation
        floor near skip-brick borders."""
        return self.sample_trilinear_p(
            pos[..., 0], pos[..., 1], pos[..., 2], clamp_floor=clamp_floor
        )

    def sample_trilinear_p(self, px, py, pz,
                           clamp_floor: float = None) -> jnp.ndarray:
        """Planar-coordinate trilinear sample (see sample_nearest_p)."""
        D, H, W = self.shape
        cx = px * W - 0.5
        cy = py * H - 0.5
        cz = pz * D - 0.5
        x0f, y0f, z0f = jnp.floor(cx), jnp.floor(cy), jnp.floor(cz)
        # left-edge clamp: both x taps resolve to texel 0 -> fx = 0
        fx = jnp.where(x0f < 0.0, 0.0, cx - x0f)
        fy = cy - y0f
        fz = cz - z0f
        x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
        y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
        y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, H - 1)
        z0 = jnp.clip(z0f.astype(jnp.int32), 0, D - 1)
        z1 = jnp.clip(z0f.astype(jnp.int32) + 1, 0, D - 1)

        if self.half:
            W2 = self.pairs.shape[0] // (D * H)
            x1 = jnp.clip(x0 + 1, 0, W - 1)

            def pair(z, y):
                base = (z * H + y) * W2
                r0 = self.pairs[base + (x0 >> 1)].astype(jnp.float32)
                r1 = self.pairs[base + (x1 >> 1)].astype(jnp.float32)
                a = jnp.where(x0 & 1, r0[..., 1], r0[..., 0])
                b = jnp.where(x1 & 1, r1[..., 1], r1[..., 0])
                if clamp_floor is not None:
                    a = jnp.maximum(a, clamp_floor)
                    b = jnp.maximum(b, clamp_floor)
                return a * (1.0 - fx) + b * fx
        else:
            def pair(z, y):
                r = self.pairs[(z * H + y) * W + x0].astype(jnp.float32)
                if clamp_floor is not None:
                    r = jnp.maximum(r, clamp_floor)
                return r[..., 0] * (1.0 - fx) + r[..., 1] * fx

        c00 = pair(z0, y0)
        c01 = pair(z0, y1)
        c10 = pair(z1, y0)
        c11 = pair(z1, y1)
        c0 = c00 * (1.0 - fy) + c01 * fy
        c1 = c10 * (1.0 - fy) + c11 * fy
        return c0 * (1.0 - fz) + c1 * fz

    def sample(self, pos: jnp.ndarray, mode: str) -> jnp.ndarray:
        if mode == "nearest":
            return self.sample_nearest(pos)
        return self.sample_trilinear(pos)


jax.tree_util.register_dataclass(
    PackedVolume, data_fields=["pairs"], meta_fields=["shape", "half"]
)


@dataclasses.dataclass(frozen=True)
class OctVolume:
    """Compact per-occupied-brick cell-corner table for the hit path.

    Row (slot, lz, ly, lx) holds the EIGHT corners of the trilinear cell
    anchored at voxel (z, y, x) of occupied brick ``slot`` (corner order
    dz*4 + dy*2 + dx, edge-clamped at the volume faces) — so an exact GL
    trilinear evaluation AND the analytic within-cell gradient cost ONE
    8-wide row gather (plus a tiny slot lookup) instead of the 4 pair-row
    gathers per sample + 6 nearest taps the round-3 hit path paid. Hit
    positions always anchor in a brick containing a 1-dilated positive
    voxel, which is exactly the surface-brick set the table covers; the
    rare off-table evaluation (a refine endpoint one voxel into a shell
    brick) falls back to the -limit clear value.

    The table covers ``capacity * brick_vox^3`` cells; in bf16 at reference
    scale (capacity 1280) that is ~20 MB — inside the fast gather class
    (scripts/probe_gather_rates.py)."""

    rows: jnp.ndarray   # (capacity * V, 8) cell corners
    slots: jnp.ndarray  # (num_bricks, 2) flat brick id -> slot, -1 invalid
    shape: Tuple[int, int, int]
    brick_vox: int

    def _cells(self, px, py, pz):
        """Anchor-cell decomposition: corner row + fractional weights."""
        D, H, W = self.shape
        v = self.brick_vox
        Bx = W // v
        By = H // v
        cx = px * W - 0.5
        cy = py * H - 0.5
        cz = pz * D - 0.5
        x0f, y0f, z0f = jnp.floor(cx), jnp.floor(cy), jnp.floor(cz)
        # GL clamp semantics: out-of-range anchors clamp to the edge cell
        # with zero fractional weight toward the missing tap (the +1 taps
        # are edge-duplicated in the table build)
        fx = jnp.clip(cx - x0f, 0.0, 1.0)
        fy = jnp.clip(cy - y0f, 0.0, 1.0)
        fz = jnp.clip(cz - z0f, 0.0, 1.0)
        fx = jnp.where(x0f < 0.0, 0.0, fx)
        fy = jnp.where(y0f < 0.0, 0.0, fy)
        fz = jnp.where(z0f < 0.0, 0.0, fz)
        x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
        y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
        z0 = jnp.clip(z0f.astype(jnp.int32), 0, D - 1)
        bid = ((z0 // v) * By + y0 // v) * Bx + x0 // v
        slot = self.slots[bid][..., 0]
        valid = slot >= 0
        local = ((z0 % v) * v + y0 % v) * v + x0 % v
        rows = self.rows[
            jnp.where(valid, slot, 0) * (v * v * v) + local
        ].astype(jnp.float32)
        return rows, valid, fx, fy, fz

    def sample_p(self, px, py, pz, fill: float):
        """Exact GL trilinear sample; ``fill`` where the cell is off-table
        (off-table cells contain no 1-dilated positive voxel, so the clear
        value -limit is the natural fill)."""
        c, valid, fx, fy, fz = self._cells(px, py, pz)
        c00 = c[..., 0] * (1 - fx) + c[..., 1] * fx
        c01 = c[..., 2] * (1 - fx) + c[..., 3] * fx
        c10 = c[..., 4] * (1 - fx) + c[..., 5] * fx
        c11 = c[..., 6] * (1 - fx) + c[..., 7] * fx
        val = (
            (c00 * (1 - fy) + c01 * fy) * (1 - fz)
            + (c10 * (1 - fy) + c11 * fy) * fz
        )
        return jnp.where(valid, val, fill)

    def gradient_p(self, px, py, pz):
        """Analytic gradient of the trilinear field within the anchor cell,
        in volume-normalized units — the fast-path surface normal (the
        trilinear field's true local slope; the reference's central
        differences of trilinear samples at +-step approximate the same
        quantity, glsl/tsdf_raymarch.fs:148-157)."""
        D, H, W = self.shape
        c, valid, fx, fy, fz = self._cells(px, py, pz)
        wy0, wy1 = (1 - fy), fy
        wz0, wz1 = (1 - fz), fz
        gx = (
            (c[..., 1] - c[..., 0]) * wy0 * wz0
            + (c[..., 3] - c[..., 2]) * wy1 * wz0
            + (c[..., 5] - c[..., 4]) * wy0 * wz1
            + (c[..., 7] - c[..., 6]) * wy1 * wz1
        ) * W
        wx0, wx1 = (1 - fx), fx
        gy = (
            ((c[..., 2] - c[..., 0]) * wx0 + (c[..., 3] - c[..., 1]) * wx1)
            * wz0
            + ((c[..., 6] - c[..., 4]) * wx0 + (c[..., 7] - c[..., 5]) * wx1)
            * wz1
        ) * H
        gz = (
            ((c[..., 4] - c[..., 0]) * wx0 + (c[..., 5] - c[..., 1]) * wx1)
            * wy0
            + ((c[..., 6] - c[..., 2]) * wx0 + (c[..., 7] - c[..., 3]) * wx1)
            * wy1
        ) * D
        g = jnp.stack([gx, gy, gz], axis=-1)
        return g, valid


jax.tree_util.register_dataclass(
    OctVolume, data_fields=["rows", "slots"],
    meta_fields=["shape", "brick_vox"],
)


def build_oct_bricks(
    volume: jnp.ndarray,     # (Z, Y, X) raw fused TSDF (pre-sentinel)
    occ: jnp.ndarray,        # (Bz, By, Bx) bool surface-brick mask
    brick_vox: int,
    capacity: int,
    limit,
    dtype=jnp.bfloat16,
) -> OctVolume:
    """Build the compact cell-corner table over the occupied bricks.

    Extraction rides aligned x-run rows: the dense volume viewed as
    (Z*Y*(X/v), v) rows makes each brick's extended (v+1)^3 block a
    gather of 2*(v+1)^2 wide rows — ~150k rows at reference scale, far
    from the 5M scalar gathers a per-corner fetch would cost. Requires the
    volume dims to be brick-aligned (true at reference scale); callers
    gate on that."""
    Z, Y, X = volume.shape
    v = brick_vox
    Bz, By, Bx = Z // v, Y // v, X // v
    B = Bz * By * Bx
    V = v * v * v

    occ_f = occ.reshape(-1)
    (ids,) = jnp.nonzero(occ_f, size=capacity, fill_value=B)
    slot_of = (
        jnp.full((B,), -1, jnp.int32)
        .at[ids]                       # fill ids == B fall out of range
        .set(jnp.arange(capacity, dtype=jnp.int32), mode="drop")
    )
    slots = jnp.stack([slot_of, slot_of], axis=-1)

    runs = volume.reshape(Z * Y * Bx, v)
    idc = jnp.minimum(ids, B - 1)
    bz = idc // (By * Bx)
    by = (idc // Bx) % By
    bx = idc % Bx
    ez = jnp.minimum(
        bz[:, None] * v + jnp.arange(v + 1), Z - 1
    )                                               # (K, v+1) edge-clamped
    ey = jnp.minimum(by[:, None] * v + jnp.arange(v + 1), Y - 1)
    row_own = (
        ez[:, :, None] * Y + ey[:, None, :]
    ) * Bx + bx[:, None, None]                       # (K, v+1, v+1)
    own = runs[row_own]                              # (K, v+1, v+1, v)
    # +x column: first element of the next run (edge-duplicate at the face)
    last_run = bx >= Bx - 1
    nxt = runs[row_own + jnp.where(last_run, 0, 1)[:, None, None]]
    xcol = jnp.where(last_run[:, None, None], own[..., -1], nxt[..., 0])
    ext = jnp.concatenate([own, xcol[..., None]], axis=-1)  # (K, v+1, v+1, v+1)

    corners = [
        ext[:, dz: dz + v, dy: dy + v, dx: dx + v]
        for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
    ]
    rows = jnp.stack(corners, axis=-1).reshape(capacity * V, 8).astype(dtype)
    return OctVolume(rows=rows, slots=slots, shape=(Z, Y, X), brick_vox=v)


def oct_refine_crossing(
    oct: OctVolume,
    pos0,
    dn,
    lo_t: jnp.ndarray,
    hi_t: jnp.ndarray,
    hit: jnp.ndarray,
    hit_pos: jnp.ndarray,
    limit,
    widen_steps: float = 0.0,
    widen_samples: int = 6,
) -> jnp.ndarray:
    """Trilinear secant refinement at the crossing bracket, evaluated from
    the compact oct table (2 row gathers instead of 8 pair-row gathers):
    same math as :func:`refine_crossing`.

    With ``widen_steps > 0`` the refine RE-BRACKETS the trilinear field
    instead of trusting the nearest-march bracket: the nearest-tap field is
    the trilinear field sampled at cell centers, so its zero crossing can
    sit up to ~half a voxel away from the trilinear crossing the reference
    marches (glsl/tsdf_raymarch.fs:85-101) — the dominant fast-mode
    accuracy penalty (ABLATION.md: 7.49 vs 5.56 mm RMSE). The widened
    refine samples the trilinear field at ``widen_samples`` points across
    ``[lo_t - widen*sd, hi_t + widen*sd]`` (one batched row gather), takes
    the FIRST sign change, and runs TWO secant iterations — recovering the
    trilinear crossing while paying trilinear cost only on the hit set
    (~100k rays) instead of every march sample (~2M)."""
    p0x, p0y, p0z = pos0
    dnx, dny, dnz = dn
    if widen_steps > 0.0 and widen_samples >= 3:
        sd = limit * 0.5
        K = int(widen_samples)
        span_lo = lo_t - widen_steps * sd
        span = (hi_t - lo_t) + 2.0 * widen_steps * sd
        ks = jnp.arange(K, dtype=jnp.float32) / (K - 1)
        tk = span_lo[..., None] + ks * span[..., None]       # (..., K)
        d = oct.sample_p(
            p0x[..., None] + dnx[..., None] * tk,
            p0y[..., None] + dny[..., None] * tk,
            p0z[..., None] + dnz[..., None] * tk,
            -limit,
        )
        rising = (d[..., 1:] > 0.0) & (d[..., :-1] <= 0.0)
        found = hit & jnp.any(rising, axis=-1)
        kstar = jnp.argmax(rising, axis=-1)                  # first crossing
        kints = jnp.arange(K - 1, dtype=jnp.int32)
        sel_lo = (kints == kstar[..., None]).astype(jnp.float32)
        d_lo = jnp.sum(d[..., :-1] * sel_lo, axis=-1)
        d_hi = jnp.sum(d[..., 1:] * sel_lo, axis=-1)
        step = span / (K - 1)
        t_lo = span_lo + kstar.astype(jnp.float32) * step
        t_hi = t_lo + step
        den = d_hi - d_lo
        ts = t_hi - (t_hi - t_lo) * (
            d_hi / jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
        )
        # second secant iteration: evaluate at ts, shrink the bracket to
        # whichever side keeps the sign change, secant again
        dm = oct.sample_p(
            p0x + dnx * ts, p0y + dny * ts, p0z + dnz * ts, -limit
        )
        up = dm > 0.0
        t_lo2 = jnp.where(up, t_lo, ts)
        d_lo2 = jnp.where(up, d_lo, dm)
        t_hi2 = jnp.where(up, ts, t_hi)
        d_hi2 = jnp.where(up, dm, d_hi)
        den2 = d_hi2 - d_lo2
        tstar = t_hi2 - (t_hi2 - t_lo2) * (
            d_hi2 / jnp.where(jnp.abs(den2) < 1e-20, 1e-20, den2)
        )
        refined = jnp.stack(
            [p0x + dnx * tstar, p0y + dny * tstar, p0z + dnz * tstar],
            axis=-1,
        )
        return jnp.where(found[..., None], refined, hit_pos)
    v1 = oct.sample_p(
        p0x + dnx * hi_t, p0y + dny * hi_t, p0z + dnz * hi_t, -limit
    )
    v0 = oct.sample_p(
        p0x + dnx * lo_t, p0y + dny * lo_t, p0z + dnz * lo_t, -limit
    )
    denom = v1 - v0
    ok = hit & (v1 > 0.0) & (v0 <= 0.0)
    tstar = hi_t - (hi_t - lo_t) * (
        v1 / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    )
    refined = jnp.stack(
        [p0x + dnx * tstar, p0y + dny * tstar, p0z + dnz * tstar], axis=-1
    )
    return jnp.where(ok[..., None], refined, hit_pos)


def march(
    volume: jnp.ndarray,         # (Z, Y, X) TSDF or PackedVolume
    cam_pos_vol: jnp.ndarray,    # (3,) camera in volume-normalized coords
    ray_dirs_vol: jnp.ndarray,   # (..., 3) directions in volume coords
    limit: float,
    max_steps: int,
    start_end: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    mode: str = "trilinear",
    refine_nearest: bool = True,
    sentinel_skip: bool = False,
    sentinel_scale: float = 1.0,
    resume=None,
    return_state: bool = False,
):
    """Core marching loop (tsdf_raymarch.fs:62-114).

    Args:
      start_end: optional per-pixel (start_pos (..., 3), ray_length (...))
        from the brick depth-interval pass (skipSpace path, :69-74).
      mode: "trilinear" — the reference's exact sampling; "nearest" — the
        TPU fast path: nearest-voxel stepping (1 pair-row gather per step)
        with a final trilinear secant re-refinement at the crossing. The
        crossing is localised to the same inter-step bracket in both modes
        whenever the trilinear field crosses zero within a voxel of the
        nearest-field crossing — true everywhere except sub-voxel grazing
        contacts.
      sentinel_skip: when True, samples below the -2.0 SKIP SENTINEL
        threshold encode a certified-safe advance STEP COUNT
        (value = -(2.0 + safe_steps), an exact small integer even in a
        bf16-packed volume; the pipeline bakes a per-frame Chebyshev
        distance-to-surface field into the marched volume) and the ray
        sphere-traces: advance = max(safe_steps * sentinel_scale, step)
        in one iteration, where ``sentinel_scale`` is the conservative
        voxel extent (1/max(shape)). Sentinel samples are clamped back to
        the -limit truncation floor for all density math, so hit logic
        matches reference semantics.
      resume: optional (t, prev_t, prev_density) per-ray state from an
        earlier march's return_state — continues those rays (the two-phase
        tail recompaction).
      return_state: also return (t, prev_t, prev_density, lo_t, hi_t,
        hit_t) where [lo_t, hi_t] brackets the crossing for hit rays and
        hit_t is the in-march secant zero (arc lengths from start_pos
        along the unit direction).

    Returns (hit (...) bool, hit_pos (..., 3), num_samples (...) int32
    [, state]).
    """
    packed = (
        volume
        if isinstance(volume, PackedVolume)
        else PackedVolume.from_volume(volume)
    )
    nearest = mode == "nearest"
    sd = limit * 0.5
    # PLANAR ray state: (R,) component arrays instead of (R, 3). A 3-wide
    # minor axis runs at 3/128 TPU lane utilization, and the position
    # update + index math execute every loop iteration — planar components
    # cut the per-iteration elementwise cost ~40x.
    if isinstance(ray_dirs_vol, tuple):
        dnx, dny, dnz = ray_dirs_vol        # already unit length
    else:
        dn_ = ray_dirs_vol / jnp.linalg.norm(
            ray_dirs_vol, axis=-1, keepdims=True
        )
        dnx, dny, dnz = dn_[..., 0], dn_[..., 1], dn_[..., 2]

    if start_end is None:
        cx0, cy0, cz0 = cam_pos_vol[0], cam_pos_vol[1], cam_pos_vol[2]

        def slab(c0, d):
            inv = 1.0 / (d * sd)
            tb = inv * (0.0 - c0)
            tt = inv * (1.0 - c0)
            return jnp.minimum(tb, tt), jnp.maximum(tb, tt)

        l0, h0 = slab(cx0, dnx)
        l1, h1 = slab(cy0, dny)
        l2, h2 = slab(cz0, dnz)
        t0 = jnp.maximum(jnp.maximum(l0, l1), l2)
        t1 = jnp.minimum(jnp.minimum(h0, h1), h2)
        is_t0 = t0 <= t1
        t_near = jnp.maximum(jnp.where(is_t0, t0, t1), 0.0)
        t_far = jnp.where(is_t0, t1, t0)
        pos0x = cx0 + dnx * sd * t_near
        pos0y = cy0 + dny * sd * t_near
        pos0z = cz0 + dnz * sd * t_near
        # rays that never rasterize the cube's back faces spawn no
        # fragments in the reference (tsdf_raymarch runs on cube geometry)
        ray_len = jnp.where(
            is_t0 & (t_far > t_near), (t_far - t_near) * sd, 0.0
        )
    else:
        pos0, ray_len = start_end
        if isinstance(pos0, tuple):
            pos0x, pos0y, pos0z = pos0
        else:
            pos0x, pos0y, pos0z = pos0[..., 0], pos0[..., 1], pos0[..., 2]

    batch = dnx.shape
    if resume is not None:
        t_init, prev_t_init, prev_init = resume
    else:
        t_init = jnp.zeros(batch, jnp.float32)
        prev_t_init = jnp.zeros(batch, jnp.float32)
        prev_init = jnp.full(batch, -limit, jnp.float32)  # :89

    init = (
        jnp.int32(0),
        jnp.zeros(batch, bool),                     # hit
        t_init,                                     # arc length from pos0
        prev_t_init,
        prev_init,                                  # prev density
        jnp.zeros(batch, jnp.float32),              # hit_t (secant)
        jnp.zeros(batch, jnp.float32),              # lo_t (bracket)
        jnp.zeros(batch, jnp.float32),              # hi_t
        jnp.zeros(batch, jnp.int32),                # num samples
    )

    # uniform early exit: the while_loop runs only as long as the SLOWEST
    # ray is still marching; per-ray divergence is the active mask, the
    # loop condition is the any-reduction the whole chip agrees on.
    def cond(carry):
        k, hit, t = carry[0], carry[1], carry[2]
        return (k < max_steps) & jnp.any((~hit) & (t <= ray_len) & (ray_len > 0.0))

    def body(carry):
        k, hit, t, prev_t, prev, hit_t, lo_t, hi_t, num = carry
        active = (~hit) & (t <= ray_len) & (ray_len > 0.0)
        px = pos0x + dnx * t
        py = pos0y + dny * t
        pz = pos0z + dnz * t
        if nearest:
            raw = packed.sample_nearest_p(px, py, pz)
        else:
            raw = packed.sample_trilinear_p(px, py, pz)
        density = jnp.maximum(raw, -limit)  # neutralise the skip sentinel
        found = active & (density > 0.0)
        denom = density - prev
        # secant zero of the (prev_t, t) bracket: equals the reference's
        # pos - step * density/(density - prev) for uniform steps
        tstar = t - (t - prev_t) * (
            density / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        )
        hit_t = jnp.where(found, tstar, hit_t)
        lo_t = jnp.where(found, prev_t, lo_t)
        hi_t = jnp.where(found, t, hi_t)
        if sentinel_skip:
            advance = jnp.where(
                raw < -1.5,
                jnp.maximum((-raw - 2.0) * sentinel_scale, sd),
                sd,
            )
        else:
            advance = sd
        num = jnp.where(active, num + 1, num)
        prev_t = jnp.where(active, t, prev_t)
        prev = jnp.where(active, density, prev)
        t = jnp.where(active, t + advance, t)
        return (k + 1, hit | found, t, prev_t, prev, hit_t, lo_t, hi_t, num)

    (_, hit, t, prev_t, prev, hit_t, lo_t, hi_t, num) = jax.lax.while_loop(
        cond, body, init
    )

    hit_pos = jnp.stack(
        [pos0x + dnx * hit_t, pos0y + dny * hit_t, pos0z + dnz * hit_t],
        axis=-1,
    )

    if nearest and refine_nearest:
        hit_pos = refine_crossing(
            packed, (pos0x, pos0y, pos0z), (dnx, dny, dnz), lo_t, hi_t,
            hit, hit_pos,
        )

    if return_state:
        return hit, hit_pos, num, (t, prev_t, prev, lo_t, hi_t, hit_t)
    return hit, hit_pos, num


def march_chunked(
    packed: "PackedVolume",
    pos0,                        # planar (px, py, pz) start positions
    dn,                          # planar (dx, dy, dz) unit directions
    limit,
    max_steps: int,
    ray_len: jnp.ndarray,        # (...) marchable arc length from pos0
    chunk: int,
    sentinel_skip: bool = False,
    sentinel_scale: float = 1.0,
    resume=None,
):
    """Chunked parallel nearest-march: each while iteration fetches
    ``chunk`` affinely-spaced samples per ray in ONE wide gather and
    locates the first sign change by reduction along the sample axis.

    The serial ``march`` loop issues one data-DEPENDENT gather per step,
    which runs at the in-loop gather rate (~55-80 M rows/s,
    scripts/probe_while_cost.py); within a chunk the sample positions are
    affine in the step index, so the whole chunk is one parallel gather at
    the streaming rate (~250 M rows/s from the half-packed table) — a
    ~3-4x cut of the march's dominant cost. Skip sentinels (the baked
    Chebyshev clearance field) still accelerate empty space: at each chunk
    boundary the next chunk starts at the FURTHEST point certified safe by
    any sample in the chunk (classic sphere tracing, applied per chunk
    instead of per step).

    Crossing semantics match ``march(mode="nearest")``: uniform ``sd``
    spacing inside a chunk gives brackets of exactly one step, and the
    secant zero of the (t_lo, t_hi) bracket reproduces
    glsl/tsdf_raymarch.fs:98-101 for uniform steps.

    Returns (hit, num, state) with state = (t, prev_t, prev, lo_t, hi_t,
    hit_t) — the same layout ``march(return_state=True)`` produces, so the
    pipeline's tail-recompaction stages can mix the two implementations.
    """
    sd = limit * 0.5
    C = int(chunk)
    n_chunks = -(-int(max_steps) // C)
    p0x, p0y, p0z = pos0
    dnx, dny, dnz = dn
    batch = dnx.shape
    ks = jnp.arange(C, dtype=jnp.float32)
    kints = jnp.arange(C, dtype=jnp.int32)

    if resume is not None:
        t_init, prev_t_init, prev_init = resume
    else:
        t_init = jnp.zeros(batch, jnp.float32)
        prev_t_init = jnp.zeros(batch, jnp.float32)
        prev_init = jnp.full(batch, -limit, jnp.float32)

    init = (
        jnp.int32(0),
        jnp.zeros(batch, bool),                     # hit
        t_init,
        prev_t_init,
        prev_init,
        jnp.zeros(batch, jnp.float32),              # hit_t
        jnp.zeros(batch, jnp.float32),              # lo_t
        jnp.zeros(batch, jnp.float32),              # hi_t
        jnp.zeros(batch, jnp.int32),                # num samples
    )

    def cond(carry):
        k, hit, t = carry[0], carry[1], carry[2]
        return (k < n_chunks) & jnp.any(
            (~hit) & (t <= ray_len) & (ray_len > 0.0)
        )

    def body(carry):
        k, hit, t, prev_t, prev, hit_t, lo_t, hi_t, num = carry
        active = (~hit) & (t <= ray_len) & (ray_len > 0.0)
        tk = t[..., None] + ks * sd                     # (..., C)
        raw = packed.sample_nearest_p(
            p0x[..., None] + dnx[..., None] * tk,
            p0y[..., None] + dny[..., None] * tk,
            p0z[..., None] + dnz[..., None] * tk,
        )                                               # one (..., C) gather
        density = jnp.maximum(raw, -limit)
        in_len = tk <= ray_len[..., None]
        pos = (density > 0.0) & in_len
        found = active & jnp.any(pos, axis=-1)
        kstar = jnp.argmax(pos, axis=-1)                # first positive
        # masked-sum selects (full-lane) instead of per-row take gathers
        sel = (kints == kstar[..., None]).astype(jnp.float32)
        d_hi = jnp.sum(density * sel, axis=-1)
        t_hi = t + kstar.astype(jnp.float32) * sd
        selm1 = (kints == (kstar - 1)[..., None]).astype(jnp.float32)
        d_lo_in = jnp.sum(density * selm1, axis=-1)
        first = kstar == 0
        d_lo = jnp.where(first, prev, d_lo_in)
        t_lo = jnp.where(first, prev_t, t_hi - sd)
        denom = d_hi - d_lo
        tstar = t_hi - (t_hi - t_lo) * (
            d_hi / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        )
        hit_t = jnp.where(found, tstar, hit_t)
        lo_t = jnp.where(found, t_lo, lo_t)
        hi_t = jnp.where(found, t_hi, hi_t)
        n_in = jnp.sum(in_len.astype(jnp.int32), axis=-1)
        num = num + jnp.where(
            active, jnp.where(found, kstar + 1, n_in), 0
        )
        # next-chunk start: one step past the last sample, or the furthest
        # point any sentinel sample certifies surface-free
        t_last = t + (C - 1) * sd
        if sentinel_skip:
            clr = (-raw - 2.0) * sentinel_scale
            certified = jnp.max(
                jnp.where(in_len & (raw < -1.5), tk + clr, -jnp.inf),
                axis=-1,
            )
            t_next = jnp.maximum(t_last + sd, certified)
        else:
            t_next = t_last + sd
        cont = active & ~found
        prev_t = jnp.where(cont, t_last, prev_t)
        prev = jnp.where(cont, density[..., C - 1], prev)
        t = jnp.where(cont, t_next, t)
        return (k + 1, hit | found, t, prev_t, prev, hit_t, lo_t, hi_t, num)

    (_, hit, t, prev_t, prev, hit_t, lo_t, hi_t, num) = jax.lax.while_loop(
        cond, body, init
    )
    return hit, num, (t, prev_t, prev, lo_t, hi_t, hit_t)


def refine_crossing(
    packed: "PackedVolume",
    pos0: jnp.ndarray,
    dn: jnp.ndarray,
    lo_t: jnp.ndarray,
    hi_t: jnp.ndarray,
    hit: jnp.ndarray,
    hit_pos: jnp.ndarray,
    clamp_floor: float = None,
) -> jnp.ndarray:
    """Trilinear secant re-refinement at the nearest-march crossing bracket
    [lo_t, hi_t]: reproduces the reference's secant on trilinear samples
    (tsdf_raymarch.fs:98-101) for hit rays. Separated out so callers that
    compact hits first (the pipeline) pay it only on the hit set.
    ``clamp_floor`` neutralises the skip sentinel of a marched volume.
    ``pos0``/``dn`` may be (..., 3) arrays or planar component tuples."""
    if isinstance(pos0, tuple):
        p0x, p0y, p0z = pos0
    else:
        p0x, p0y, p0z = pos0[..., 0], pos0[..., 1], pos0[..., 2]
    if isinstance(dn, tuple):
        dnx, dny, dnz = dn
    else:
        dnx, dny, dnz = dn[..., 0], dn[..., 1], dn[..., 2]
    v1 = packed.sample_trilinear_p(
        p0x + dnx * hi_t, p0y + dny * hi_t, p0z + dnz * hi_t,
        clamp_floor=clamp_floor,
    )
    v0 = packed.sample_trilinear_p(
        p0x + dnx * lo_t, p0y + dny * lo_t, p0z + dnz * lo_t,
        clamp_floor=clamp_floor,
    )
    denom = v1 - v0
    ok = hit & (v1 > 0.0) & (v0 <= 0.0)
    tstar = hi_t - (hi_t - lo_t) * (
        v1 / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    )
    refined = jnp.stack(
        [p0x + dnx * tstar, p0y + dny * tstar, p0z + dnz * tstar], axis=-1
    )
    return jnp.where(ok[..., None], refined, hit_pos)


def gradient_normal(volume, pos: jnp.ndarray, limit: float,
                    mode: str = "trilinear",
                    clamp_floor: float = None) -> jnp.ndarray:
    """Central-difference TSDF gradient, negated and normalized
    (get_gradient, tsdf_raymarch.fs:148-157). In volume-normalized space.
    mode="nearest" uses nearest-voxel samples (6 vs 24 pair-row gathers per
    position). Accepts a raw (Z, Y, X) volume or a PackedVolume."""
    packed = (
        volume
        if isinstance(volume, PackedVolume)
        else PackedVolume.from_volume(volume)
    )
    sd = limit * 0.5
    ex = jnp.array([sd, 0, 0], jnp.float32)
    ey = jnp.array([0, sd, 0], jnp.float32)
    ez = jnp.array([0, 0, sd], jnp.float32)

    def s(p):
        if mode == "nearest":
            v = packed.sample_nearest(p)
            return v if clamp_floor is None else jnp.maximum(v, clamp_floor)
        return packed.sample_trilinear(p, clamp_floor=clamp_floor)

    g = jnp.stack(
        [
            s(pos + ex) - s(pos - ex),
            s(pos + ey) - s(pos - ey),
            s(pos + ez) - s(pos - ez),
        ],
        axis=-1,
    )
    return -g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-20)


def _pack_pairs_2d(arrs, dtype=None) -> jnp.ndarray:
    """Stack per-sensor channel maps into x-pair-packed rows: row (i, y, x)
    holds the channels at x AND at x+1 (edge-clamped), so one row gather
    fetches both x-taps of a bilinear corner pair — 2 gathers per sample
    instead of 4 (gather cost on TPU is per ROW, near-independent of row
    width up to ~8 f32; scripts/probe_gather_rates.py). Kept (N, H*W, 2C)
    so consumers gather per-sensor slices — small tables gather ~2x faster
    than one concatenated table."""
    base = jnp.stack(arrs, axis=-1) if isinstance(arrs, (list, tuple)) else arrs
    if dtype is not None:
        # colors are 8-bit wire data — bf16 rows halve the gather table
        base = base.astype(dtype)
    N, H, W = base.shape[:3]
    nxt = jnp.concatenate([base[:, :, 1:], base[:, :, -1:]], axis=2)
    return jnp.concatenate([base, nxt], axis=-1).reshape(
        N, H * W, 2 * base.shape[-1]
    )


def _pair_bilinear(table, Ht, Wt, uv):
    """Bilinear sample from ONE sensor's x-pair-packed (Ht*Wt, 2C) table:
    2 row gathers (y0, y1) instead of 4 corner gathers; exact GL
    semantics."""
    cx = uv[..., 0] * Wt - 0.5
    cy = uv[..., 1] * Ht - 0.5
    x0f, y0f = jnp.floor(cx), jnp.floor(cy)
    fx = jnp.where(x0f < 0.0, 0.0, cx - x0f)[..., None]
    fy = (cy - y0f)[..., None]
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, Wt - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, Ht - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, Ht - 1)
    r0 = table[y0 * Wt + x0].astype(jnp.float32)
    r1 = table[y1 * Wt + x0].astype(jnp.float32)
    half = table.shape[-1] // 2
    c0 = r0[..., :half] * (1 - fx) + r0[..., half:] * fx
    c1 = r1[..., :half] * (1 - fx) + r1[..., half:] * fx
    return c0 * (1 - fy) + c1 * fy


def _blend_accumulate(i, col, depth, qual, z, in_frustum, limit, acc):
    """One sensor's contribution to the blend fold — the exact weight
    formula of blendColors (tsdf_raymarch.fs:303-338)."""
    total_c, total_w, total_c2, total_w2 = acc
    dist = jnp.abs(depth - z)
    qual = jnp.where((dist < limit) & in_frustum, qual, 0.0)
    w = qual / (dist + 0.01)
    total_c = total_c + col * w[..., None]
    total_w = total_w + w
    w2 = jnp.where(in_frustum, 1.0 / jnp.maximum(dist, 1e-20), 0.0)
    total_c2 = total_c2 + col * w2[..., None]
    total_w2 = total_w2 + w2
    return total_c, total_w, total_c2, total_w2


def _blend_finalize(acc):
    total_c, total_w, total_c2, total_w2 = acc
    use_primary = total_w > 0.0
    primary = total_c / jnp.maximum(total_w, 1e-20)[..., None]
    fallback = total_c2 / jnp.maximum(total_w2, 1e-20)[..., None]
    rgb = jnp.where(use_primary[..., None], primary, fallback)
    alpha = jnp.where(use_primary, 1.0, -1.0)
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def blend_colors_fast(
    sample_pos: jnp.ndarray,     # (..., 3) volume-normalized hit positions
    cv_xyz_inv: jnp.ndarray,     # (N, Dz, Hy, Wx, 4)
    cv_uv: jnp.ndarray,          # (N, D, Hv, Wv, 2)
    colors: jnp.ndarray,         # (N, Hc, Wc, 3)
    depths: jnp.ndarray,         # (N, H, W)
    qualities: jnp.ndarray,      # (N, H, W)
    limit: float,
):
    """TPU fast variant of :func:`blend_colors`: identical blend formula
    (quality/(dist+0.01) weights, inverse-distance fallback,
    tsdf_raymarch.fs:303-338) but the calibration-volume lookups are
    nearest-sampled (1 gather row each vs 8 for trilinear — the calibration
    volumes vary smoothly at voxel scale) and depth+quality are fetched
    together as packed rows. ~3x fewer gather rows per hit."""
    N = colors.shape[0]
    H, W = depths.shape[1:3]
    Hc, Wc = colors.shape[1:3]

    acc = (
        jnp.zeros(sample_pos.shape[:-1] + (3,), jnp.float32),
        jnp.zeros(sample_pos.shape[:-1], jnp.float32),
        jnp.zeros(sample_pos.shape[:-1] + (3,), jnp.float32),
        jnp.zeros(sample_pos.shape[:-1], jnp.float32),
    )
    dq4 = _pack_pairs_2d([depths, qualities])
    col8 = _pack_pairs_2d(
        jnp.concatenate([colors, jnp.zeros_like(colors[..., :1])], axis=-1),
        dtype=jnp.bfloat16,
    )

    def nearest_rows(vol, pos):
        D_, H_, W_, C_ = vol.shape
        xi = jnp.clip((pos[..., 0] * W_).astype(jnp.int32), 0, W_ - 1)
        yi = jnp.clip((pos[..., 1] * H_).astype(jnp.int32), 0, H_ - 1)
        zi = jnp.clip((pos[..., 2] * D_).astype(jnp.int32), 0, D_ - 1)
        return vol.reshape(-1, C_)[(zi * H_ + yi) * W_ + xi]

    for i in range(N):
        lookup = nearest_rows(cv_xyz_inv[i], sample_pos)
        pos_calib = lookup[..., :3]
        in_frustum = lookup[..., 3] > 0.99
        pos_color = nearest_rows(cv_uv[i], pos_calib)[..., :2]
        col = _pair_bilinear(col8[i], Hc, Wc, pos_color)[..., :3]
        dqv = _pair_bilinear(dq4[i], H, W, pos_calib[..., :2])
        acc = _blend_accumulate(
            i, col, dqv[..., 0], dqv[..., 1], pos_calib[..., 2], in_frustum,
            limit, acc,
        )

    return _blend_finalize(acc)


def _pack_quad_2d(base: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H*W, 4C): row (y, x) holds the C channels at
    ALL FOUR bilinear corners (x, y), (x+1, y), (x, y+1), (x+1, y+1),
    edge-clamped — one row gather fetches a complete bilinear footprint
    (gather cost on TPU is per row and near-flat in row width)."""
    if dtype is not None:
        base = base.astype(dtype)
    N, H, W, C = base.shape
    px = jnp.concatenate([base[:, :, 1:], base[:, :, -1:]], axis=2)
    row2 = jnp.concatenate([base, px], axis=-1)
    rdn = jnp.concatenate([row2[:, 1:], row2[:, -1:]], axis=1)
    return jnp.concatenate([row2, rdn], axis=-1).reshape(N, H * W, 4 * C)


def _quad_bilinear_p(table, Ht, Wt, u, v):
    """Bilinear sample from one sensor's quad-packed (Ht*Wt, 4C) table in
    ONE row gather; planar (u, v) inputs; exact GL semantics. Returns
    (..., C) f32."""
    cx = u * Wt - 0.5
    cy = v * Ht - 0.5
    x0f, y0f = jnp.floor(cx), jnp.floor(cy)
    fx = jnp.where(x0f < 0.0, 0.0, cx - x0f)[..., None]
    fy = jnp.where(y0f < 0.0, 0.0, cy - y0f)[..., None]
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, Wt - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, Ht - 1)
    r = table[y0 * Wt + x0].astype(jnp.float32)
    C = r.shape[-1] // 4
    c0 = r[..., :C] * (1 - fx) + r[..., C:2 * C] * fx
    c1 = r[..., 2 * C:3 * C] * (1 - fx) + r[..., 3 * C:] * fx
    return c0 * (1 - fy) + c1 * fy


def blend_colors_analytic(
    world_pos: jnp.ndarray,      # (..., 3) WORLD-space hit positions
    proj_models,                 # calib.sensors.ProjectionModels
    colors: jnp.ndarray,         # (N, Hc, Wc, 3)
    depths: jnp.ndarray,         # (N, H, W)
    qualities: jnp.ndarray,      # (N, H, W)
    limit: float,
    dq_taps: str = "nearest",
):
    """Fastest blend variant: the cv_xyz_inv and cv_uv lookups are replaced
    by the analytic per-sensor projection models (pure elementwise math,
    zero gather rows), leaving only the sensor-map fetches — per hit per
    sensor ONE quad-packed color row (all four bilinear corners) and one
    depth/quality row. Model evaluation and weights run on PLANAR (R,)
    component arrays (a 3-wide minor axis runs at 3/128 lane utilization).
    Exact for pinhole calibrations — the analytic projection is in fact
    *more* accurate than the k-NN/IDW-baked inverse volume it replaces;
    non-pinhole rigs fall back to blend_colors_fast via the fit-residual
    gate (PipelineConfig.projection_model).

    ``dq_taps="nearest"`` fetches the depth/quality WEIGHT maps at the
    nearest texel (the same approximation the integrate taps default to;
    the maps are bilateral-smoothed so the inter-pixel variation is
    sub-voxel). Colors stay bilinear."""
    N = colors.shape[0]
    H, W = depths.shape[1:3]
    Hc, Wc = colors.shape[1:3]
    px = world_pos[..., 0]
    py = world_pos[..., 1]
    pz = world_pos[..., 2]

    shape = px.shape
    tc = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
    tw = jnp.zeros(shape, jnp.float32)
    tc2 = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
    tw2 = jnp.zeros(shape, jnp.float32)

    col16 = _pack_quad_2d(
        jnp.concatenate([colors, jnp.zeros_like(colors[..., :1])], axis=-1),
        dtype=jnp.bfloat16,
    )
    if dq_taps == "nearest":
        dq2 = jnp.stack([depths, qualities], axis=-1).reshape(N, H * W, 2)
    else:
        dq8 = _pack_quad_2d(jnp.stack([depths, qualities], axis=-1))

    for i in range(N):
        u, v, d = proj_models.uvd_p(i, px, py, pz)
        in_frustum = (
            (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
            & (d >= 0.0) & (d <= 1.0)
        )
        cu, cv_ = proj_models.color_uv_p(i, px, py, pz)
        col = _quad_bilinear_p(col16[i], Hc, Wc, cu, cv_)
        if dq_taps == "nearest":
            xi = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
            yi = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
            dqv = dq2[i][yi * W + xi]
        else:
            dqv = _quad_bilinear_p(dq8[i], H, W, u, v)
        depth = dqv[..., 0]
        qual = dqv[..., 1]
        # exact weight formula of blendColors (tsdf_raymarch.fs:303-338)
        dist = jnp.abs(depth - d)
        qual = jnp.where((dist < limit) & in_frustum, qual, 0.0)
        w = qual / (dist + 0.01)
        w2 = jnp.where(in_frustum, 1.0 / jnp.maximum(dist, 1e-20), 0.0)
        for j in range(3):
            tc[j] = tc[j] + col[..., j] * w
            tc2[j] = tc2[j] + col[..., j] * w2
        tw = tw + w
        tw2 = tw2 + w2

    use_primary = tw > 0.0
    inv_w = 1.0 / jnp.maximum(tw, 1e-20)
    inv_w2 = 1.0 / jnp.maximum(tw2, 1e-20)
    rgb = [
        jnp.where(use_primary, tc[j] * inv_w, tc2[j] * inv_w2)
        for j in range(3)
    ]
    alpha = jnp.where(use_primary, 1.0, -1.0)
    return jnp.stack(rgb + [alpha], axis=-1)


def blend_colors(
    sample_pos: jnp.ndarray,     # (..., 3) volume-normalized hit positions
    cv_xyz_inv: jnp.ndarray,     # (N, Dz, Hy, Wx, 4)
    cv_uv: jnp.ndarray,          # (N, D, Hv, Wv, 2)
    colors: jnp.ndarray,         # (N, Hc, Wc, 3)
    depths: jnp.ndarray,         # (N, H, W)
    qualities: jnp.ndarray,      # (N, H, W)
    limit: float,
):
    """Per-sensor color lookup + quality/inverse-distance blending
    (blendColors, tsdf_raymarch.fs:303-338).

    Returns (..., 4) rgba; alpha 1 when quality blending applied, -1 when the
    inverse-distance fallback was used.
    """
    num_sensors = colors.shape[0]
    total_c = jnp.zeros(sample_pos.shape[:-1] + (3,), jnp.float32)
    total_w = jnp.zeros(sample_pos.shape[:-1], jnp.float32)
    total_c2 = jnp.zeros_like(total_c)
    total_w2 = jnp.zeros_like(total_w)

    for i in range(num_sensors):
        lookup = trilinear_3d(cv_xyz_inv[i], sample_pos)
        pos_calib = lookup[..., :3]
        in_frustum = lookup[..., 3] > 0.99  # see ops/tsdf.py validity note
        pos_color = trilinear_3d(cv_uv[i], pos_calib)[..., :2]
        col = bilinear_2d(colors[i], pos_color)
        depth = bilinear_2d(depths[i][..., None], pos_calib[..., :2])[..., 0]
        dist = jnp.abs(depth - pos_calib[..., 2])
        qual = bilinear_2d(qualities[i][..., None], pos_calib[..., :2])[..., 0]
        qual = jnp.where((dist < limit) & in_frustum, qual, 0.0)  # :317-321

        w = qual / (dist + 0.01)
        total_c = total_c + col * w[..., None]
        total_w = total_w + w
        w2 = jnp.where(in_frustum, 1.0 / jnp.maximum(dist, 1e-20), 0.0)
        total_c2 = total_c2 + col * w2[..., None]
        total_w2 = total_w2 + w2

    use_primary = total_w > 0.0
    primary = total_c / jnp.maximum(total_w, 1e-20)[..., None]
    fallback = total_c2 / jnp.maximum(total_w2, 1e-20)[..., None]
    rgb = jnp.where(use_primary[..., None], primary, fallback)
    alpha = jnp.where(use_primary, 1.0, -1.0)
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def blend_colors_normal(
    sample_pos: jnp.ndarray,     # (..., 3) volume-normalized hit positions
    world_pos: jnp.ndarray,      # (..., 3) world hit positions
    surf_normal: jnp.ndarray,    # (..., 3) get_gradient output at the hits
    proj_models,                 # ProjectionModels or None
    cv_xyz_inv: jnp.ndarray,
    cv_uv: jnp.ndarray,
    colors: jnp.ndarray,         # (N, Hc, Wc, 3)
    depths: jnp.ndarray,         # (N, H, W)
    normal_maps: jnp.ndarray,    # (N, H, W, 3) world-space sensor normals
    limit: float,
    variant: str = "deviation",
):
    """The reference's alternative blends (blendColors2,
    tsdf_raymarch.fs:266-301):

      variant="deviation":  weight_i = normalDev_i / dist_i  (:295, the
        active line) with normalDev_i = min(dot(-normal, normals_i), 0)
        (getNormalDev, :195-204 — the <= 0 weights are a faithful quirk);
        DELIBERATE DEVIATION: the reference never resets total_weight
        between blendColors2's two loops, so its denominator additionally
        carries the first loop's quality weights (:266-301) — an
        accumulator-reuse artifact of the shader, not a designed formula.
        We normalize by the deviation weights alone, which keeps the blend
        a true weighted average (the reference's colors are uniformly
        darkened by the stale quality sum);
      variant="best_two":   weight_i = normalTwo_i / dist_i  (:293, the
        commented "sharper" line) where normalTwo selects the two sensors
        with the most-negative deviation (getNormalTwo, :221-244).

    Returns (..., 4) rgba with alpha -1 (:300)."""
    N = colors.shape[0]
    H, W = depths.shape[1:3]
    Hc, Wc = colors.shape[1:3]
    dq4 = _pack_pairs_2d([depths, jnp.zeros_like(depths)])
    col8 = _pack_pairs_2d(
        jnp.concatenate([colors, jnp.zeros_like(colors[..., :1])], axis=-1)
    )
    nrm8 = _pack_pairs_2d(
        jnp.concatenate(
            [normal_maps, jnp.zeros_like(normal_maps[..., :1])], axis=-1
        )
    )

    def nearest_rows(vol, pos):
        D_, H_, W_, C_ = vol.shape
        xi = jnp.clip((pos[..., 0] * W_).astype(jnp.int32), 0, W_ - 1)
        yi = jnp.clip((pos[..., 1] * H_).astype(jnp.int32), 0, H_ - 1)
        zi = jnp.clip((pos[..., 2] * D_).astype(jnp.int32), 0, D_ - 1)
        return vol.reshape(-1, C_)[(zi * H_ + yi) * W_ + xi]

    devs, dists, cols = [], [], []
    for i in range(N):
        if proj_models is not None:
            uvd = proj_models.uvd(i, world_pos)
            pos_color = proj_models.color_uv(i, world_pos)
        else:
            uvd = nearest_rows(cv_xyz_inv[i], sample_pos)[..., :3]
            pos_color = nearest_rows(cv_uv[i], uvd)[..., :2]
        col = _pair_bilinear(col8[i], Hc, Wc, pos_color)[..., :3]
        depth = _pair_bilinear(dq4[i], H, W, uvd[..., :2])[..., 0]
        n_i = _pair_bilinear(nrm8[i], H, W, uvd[..., :2])[..., :3]
        dists.append(jnp.abs(depth - uvd[..., 2]))
        devs.append(
            jnp.minimum(jnp.sum(-surf_normal * n_i, axis=-1), 0.0)
        )
        cols.append(col)
    dev = jnp.stack(devs)          # (N, ...)
    dist = jnp.maximum(jnp.stack(dists), 1e-6)
    col = jnp.stack(cols)

    if variant == "best_two":
        # two most-negative deviations get weight 1 (getNormalTwo)
        order = jnp.argsort(dev, axis=0)
        sel = (
            jax.nn.one_hot(order[0], N, axis=0)
            + jax.nn.one_hot(order[1], N, axis=0)
        )
        w = sel / dist
    else:
        w = dev / dist

    total_w = jnp.sum(w, axis=0)
    rgb = jnp.sum(col * w[..., None], axis=0) / jnp.where(
        jnp.abs(total_w) < 1e-20, 1e-20, total_w
    )[..., None]
    # the reference returns alpha -1 unconditionally (:300), but our
    # colorfill treats alpha <= 0 as a fillable hole (tsdf_inpaint.fs:34),
    # which would erase every blended hit — mark pixels with an actual
    # weighted color as valid instead
    alpha = jnp.where(jnp.abs(total_w) > 1e-12, 1.0, -1.0)
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def blend_cameras(
    sample_pos: jnp.ndarray,
    cv_xyz_inv: jnp.ndarray,
    depths: jnp.ndarray,
    qualities: jnp.ndarray,
    limit: float,
):
    """Camera-influence debug view (blendCameras + getWeights,
    tsdf_raymarch.fs:159-174, 354-369): fixed per-camera palette from
    shading.glsl:24-30 blended by in-range quality."""
    palette = jnp.asarray(
        np.array(
            [
                [228, 26, 28], [55, 126, 184], [77, 175, 74],
                [152, 78, 163], [255, 127, 0],
            ],
            np.float32,
        )
        / 255.0
    )
    num_sensors = depths.shape[0]
    total_c = jnp.zeros(sample_pos.shape[:-1] + (3,), jnp.float32)
    total_w = jnp.zeros(sample_pos.shape[:-1], jnp.float32)
    for i in range(num_sensors):
        pos_calib = trilinear_3d(cv_xyz_inv[i], sample_pos)[..., :3]
        depth = bilinear_2d(depths[i][..., None], pos_calib[..., :2])[..., 0]
        dist = jnp.abs(depth - pos_calib[..., 2])
        qual = bilinear_2d(qualities[i][..., None], pos_calib[..., :2])[..., 0]
        qual = jnp.where(dist < limit, qual, 0.0)
        total_c = total_c + palette[i % 5] * qual[..., None]
        total_w = total_w + qual
    out = total_c / jnp.maximum(total_w, 1e-20)[..., None]
    return jnp.where(total_w[..., None] > 0.0, out, 1.0)


# ---------------------------------------------------------------------------
# Blinn-Phong shading (glsl/shading.glsl)
# ---------------------------------------------------------------------------

_LIGHT_POSITION = (1.5, 1.0, 1.0)       # view space (shading.glsl:5)
_LIGHT_DIFFUSE = (1.0, 0.9, 0.7)
_LIGHT_SPECULAR = (1.0, 1.0, 1.0)
_KS = 0.5
_SHININESS = 20.0
_SOLID_DIFFUSE = 0.5


def shade(view_pos: jnp.ndarray, view_normal: jnp.ndarray, diffuse: jnp.ndarray,
          shade_mode: int = 0, world_normal: jnp.ndarray = None) -> jnp.ndarray:
    """shading.glsl:32-69. view_pos/view_normal in GL view space."""
    if shade_mode == 0:
        return diffuse
    if shade_mode == 2:
        return world_normal if world_normal is not None else view_normal
    if shade_mode != 1:
        return jnp.ones_like(diffuse)

    light_pos = jnp.asarray(_LIGHT_POSITION, jnp.float32)
    to_light = light_pos - view_pos
    to_light = to_light / jnp.maximum(
        jnp.linalg.norm(to_light, axis=-1, keepdims=True), 1e-20
    )
    light_angle = jnp.sum(view_normal * to_light, axis=-1)
    lit = light_angle > 0.0

    diff = jnp.maximum(light_angle, 0.0)
    to_viewer = -view_pos / jnp.maximum(
        jnp.linalg.norm(view_pos, axis=-1, keepdims=True), 1e-20
    )
    halfway = to_light + to_viewer
    halfway = halfway / jnp.maximum(
        jnp.linalg.norm(halfway, axis=-1, keepdims=True), 1e-20
    )
    spec = jnp.power(jnp.maximum(jnp.sum(halfway * view_normal, axis=-1), 1e-20),
                     _SHININESS)
    a = (1.0 - light_angle) ** 2
    spec = spec * (1.0 - a**3)

    diff = jnp.where(lit, diff, 0.0)
    spec = jnp.where(lit, spec, 0.0)

    amb = jnp.asarray(_LIGHT_DIFFUSE, jnp.float32) * 0.2 * _SOLID_DIFFUSE
    out = (
        amb
        + jnp.asarray(_LIGHT_DIFFUSE, jnp.float32) * _SOLID_DIFFUSE * diff[..., None]
        + jnp.asarray(_LIGHT_SPECULAR, jnp.float32) * _KS * spec[..., None]
    )
    return out
