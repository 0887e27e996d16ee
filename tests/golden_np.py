"""Independent NumPy pipeline for the golden full-chain fixture.

A from-scratch NumPy composition of the reference's core math —
tsdf_integration.vs:23-58 fused with tsdf_raymarch.fs:62-157 marching,
secant refinement, blendColors (:303-338), window depth, and the
tsdf_inpaint/tsdf_colorfill pull-push — written directly from the GLSL
spec with plain vectorized numpy (no jax imports). tests/test_golden.py
generates a committed fixture from this pipeline and regression-tests the
JAX exact-parity mode against it: the closest available stand-in for
recorded reference sequences (the reference binaries cannot run here).
"""

from __future__ import annotations

import numpy as np


# -- GL sampling ------------------------------------------------------------

def trilinear_3d(vol: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """GL LINEAR + clamp-to-edge 3D sampling. vol (D, H, W, C), pos
    (..., 3) normalized (x, y, z) -> (..., C)."""
    D, H, W, C = vol.shape
    x = pos[..., 0] * W - 0.5
    y = pos[..., 1] * H - 0.5
    z = pos[..., 2] * D - 0.5
    x0, y0, z0 = np.floor(x), np.floor(y), np.floor(z)
    fx = np.where(x0 < 0.0, 0.0, x - x0)[..., None]
    fy = np.where(y0 < 0.0, 0.0, y - y0)[..., None]
    fz = np.where(z0 < 0.0, 0.0, z - z0)[..., None]

    def tap(zi, yi, xi):
        zi = np.clip(zi.astype(np.int64), 0, D - 1)
        yi = np.clip(yi.astype(np.int64), 0, H - 1)
        xi = np.clip(xi.astype(np.int64), 0, W - 1)
        return vol[zi, yi, xi]

    c000 = tap(z0, y0, x0)
    c001 = tap(z0, y0, x0 + 1)
    c010 = tap(z0, y0 + 1, x0)
    c011 = tap(z0, y0 + 1, x0 + 1)
    c100 = tap(z0 + 1, y0, x0)
    c101 = tap(z0 + 1, y0, x0 + 1)
    c110 = tap(z0 + 1, y0 + 1, x0)
    c111 = tap(z0 + 1, y0 + 1, x0 + 1)
    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def bilinear_2d(img: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """GL LINEAR + clamp 2D sampling. img (H, W, C), uv (..., 2)."""
    H, W, C = img.shape
    x = uv[..., 0] * W - 0.5
    y = uv[..., 1] * H - 0.5
    x0, y0 = np.floor(x), np.floor(y)
    fx = np.where(x0 < 0.0, 0.0, x - x0)[..., None]
    fy = np.where(y0 < 0.0, 0.0, y - y0)[..., None]

    def tap(yi, xi):
        yi = np.clip(yi.astype(np.int64), 0, H - 1)
        xi = np.clip(xi.astype(np.int64), 0, W - 1)
        return img[yi, xi]

    c0 = tap(y0, x0) * (1 - fx) + tap(y0, x0 + 1) * fx
    c1 = tap(y0 + 1, x0) * (1 - fx) + tap(y0 + 1, x0 + 1) * fx
    return c0 * (1 - fy) + c1 * fy


# -- TSDF integration (tsdf_integration.vs:23-58) ---------------------------

def integrate(vol_shape, cv_xyz_inv, depths, quals, sils, limit,
              carve_sil_threshold=1.0, phantom_hull=False):
    """Dense fused TSDF volume (Z, Y, X) f32."""
    Z, Y, X = vol_shape
    zi, yi, xi = np.meshgrid(
        np.arange(Z), np.arange(Y), np.arange(X), indexing="ij"
    )
    pos = np.stack(
        [(xi + 0.5) / X, (yi + 0.5) / Y, (zi + 0.5) / Z], axis=-1
    ).astype(np.float32)

    tsd = np.full(vol_shape, limit, np.float32)
    total_w = np.zeros(vol_shape, np.float32)
    N = depths.shape[0]
    for i in range(N):
        look = trilinear_3d(cv_xyz_inv[i], pos)
        pc = look[..., :3]
        in_frustum = look[..., 3] > 0.99
        uv = pc[..., :2]
        sil = bilinear_2d(sils[i][..., None], uv)[..., 0]
        depth = bilinear_2d(depths[i][..., None], uv)[..., 0]
        qual = bilinear_2d(quals[i][..., None], uv)[..., 0]

        carve = (sil < carve_sil_threshold) & (tsd >= limit) & in_frustum
        sdist = pc[..., 2] - depth
        behind = (sdist <= -limit) & in_frustum
        skip = (sdist >= limit) | ~in_frustum
        new_w = total_w + qual
        updated = np.where(
            new_w > 0.0,
            (tsd * total_w + qual * sdist) / np.maximum(new_w, 1e-20),
            tsd,
        )
        tsd_next = np.where(behind, -limit, np.where(skip, tsd, updated))
        w_next = np.where(behind | skip, total_w, new_w)
        tsd = np.where(carve, -limit, tsd_next)
        total_w = np.where(carve, total_w, w_next)

    if not phantom_hull:
        tsd = np.where((total_w <= 0.0) & (tsd >= limit), -limit, tsd)
    return tsd.astype(np.float32)


# -- raymarch + shade (tsdf_raymarch.fs) ------------------------------------

def _camera_rotation(eye, target, up=(0.0, 1.0, 0.0)):
    eye = np.asarray(eye, np.float32)
    fwd = np.asarray(target, np.float32) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float32))
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    return np.stack([right, true_up, -fwd], axis=1)


def render(volume, maps_color, maps_depth, maps_quality,
           cv_xyz_inv, cv_uv, bbox_min, bbox_max,
           width, height, eye, target, fov_y, near, far,
           limit, num_lods, max_steps):
    """Dense full-screen trilinear march + secant + quality blend +
    window depth + pull-push colorfill. Returns (color (H, W, 3),
    depth (H, W), hit (H, W) bool)."""
    H, W = height, width
    bbox_min = np.asarray(bbox_min, np.float32)
    bbox_size = np.asarray(bbox_max, np.float32) - bbox_min
    eye = np.asarray(eye, np.float32)
    rot = _camera_rotation(eye, target)
    eye_vol = (eye - bbox_min) / bbox_size
    tan_half = np.tan(np.radians(fov_y) * 0.5)
    aspect = W / H
    sd = limit * 0.5

    xs = ((np.arange(W, dtype=np.float32) + 0.5) / W * 2 - 1) * tan_half * aspect
    ys = (1.0 - (np.arange(H, dtype=np.float32) + 0.5) / H * 2) * tan_half
    xx, yy = np.meshgrid(xs, ys)
    dirs_cam = np.stack([xx, yy, -np.ones_like(xx)], axis=-1)
    dirs_w = dirs_cam @ rot.T
    dv = dirs_w / bbox_size
    dn = dv / np.linalg.norm(dv, axis=-1, keepdims=True)

    # slab test in units of sd (march() start_end=None path)
    inv = 1.0 / (dn * sd)
    tb = inv * (0.0 - eye_vol)
    tt = inv * (1.0 - eye_vol)
    t0 = np.max(np.minimum(tb, tt), axis=-1)
    t1 = np.min(np.maximum(tb, tt), axis=-1)
    is_t0 = t0 <= t1
    t_near = np.maximum(np.where(is_t0, t0, t1), 0.0)
    t_far = np.where(is_t0, t1, t0)
    pos0 = eye_vol + dn * (sd * t_near)[..., None]
    ray_len = np.where(is_t0 & (t_far > t_near), (t_far - t_near) * sd, 0.0)

    vol4 = volume[..., None]

    def sample(p):
        return trilinear_3d(vol4, p)[..., 0]

    t = np.zeros((H, W), np.float32)
    prev_t = np.zeros((H, W), np.float32)
    prev = np.full((H, W), -limit, np.float32)
    hit = np.zeros((H, W), bool)
    hit_t = np.zeros((H, W), np.float32)
    for _ in range(max_steps):
        active = (~hit) & (t <= ray_len) & (ray_len > 0.0)
        if not active.any():
            break
        p = pos0 + dn * t[..., None]
        density = np.maximum(sample(p), -limit)
        found = active & (density > 0.0)
        denom = density - prev
        tstar = t - (t - prev_t) * (
            density / np.where(np.abs(denom) < 1e-20, 1e-20, denom)
        )
        hit_t = np.where(found, tstar, hit_t)
        prev_t = np.where(active, t, prev_t)
        prev = np.where(active, density, prev)
        t = np.where(active, t + sd, t)
        hit |= found

    hit_pos = pos0 + dn * hit_t[..., None]

    # central-difference gradient (get_gradient, :148-157)
    g = np.stack(
        [
            sample(hit_pos + np.array([sd, 0, 0], np.float32))
            - sample(hit_pos - np.array([sd, 0, 0], np.float32)),
            sample(hit_pos + np.array([0, sd, 0], np.float32))
            - sample(hit_pos - np.array([0, sd, 0], np.float32)),
            sample(hit_pos + np.array([0, 0, sd], np.float32))
            - sample(hit_pos - np.array([0, 0, sd], np.float32)),
        ],
        axis=-1,
    )
    # (normals only shade in modes != 0; textured mode ignores them)

    # blendColors (:303-338)
    N = maps_color.shape[0]
    tc = np.zeros((H, W, 3), np.float32)
    tw = np.zeros((H, W), np.float32)
    tc2 = np.zeros((H, W, 3), np.float32)
    tw2 = np.zeros((H, W), np.float32)
    for i in range(N):
        look = trilinear_3d(cv_xyz_inv[i], hit_pos)
        pc = look[..., :3]
        in_frustum = look[..., 3] > 0.99
        pos_color = trilinear_3d(cv_uv[i], pc)[..., :2]
        col = bilinear_2d(maps_color[i], pos_color)
        depth = bilinear_2d(maps_depth[i][..., None], pc[..., :2])[..., 0]
        dist = np.abs(depth - pc[..., 2])
        qual = bilinear_2d(maps_quality[i][..., None], pc[..., :2])[..., 0]
        qual = np.where((dist < limit) & in_frustum, qual, 0.0)
        w = qual / (dist + 0.01)
        tc += col * w[..., None]
        tw += w
        w2 = np.where(in_frustum, 1.0 / np.maximum(dist, 1e-20), 0.0)
        tc2 += col * w2[..., None]
        tw2 += w2
    use = tw > 0.0
    rgb = np.where(
        use[..., None], tc / np.maximum(tw, 1e-20)[..., None],
        tc2 / np.maximum(tw2, 1e-20)[..., None],
    )
    rgba = np.concatenate(
        [rgb, np.where(use, 1.0, -1.0)[..., None]], axis=-1
    )
    rgba = np.where(hit[..., None], rgba, 0.0)

    # window depth (projection arithmetic of :133)
    world_pos = hit_pos * bbox_size + bbox_min
    view_pos = (world_pos - eye) @ rot
    view_z = np.maximum(-view_pos[..., 2], near * 1.001)
    depth_win = np.clip(
        (1.0 / near - 1.0 / view_z) / (1.0 / near - 1.0 / far), 0.0, 1.0
    )
    depth_win = np.where(hit, depth_win, 1.0).astype(np.float32)

    # pull-push colorfill
    color_out, depth_out = fill_colors(rgba.astype(np.float32),
                                       depth_win, num_lods)
    shown = depth_out < 1.0
    color = np.where(shown[..., None], color_out[..., :3], 0.0)
    return color.astype(np.float32), depth_out.astype(np.float32), hit, g


# -- pull-push (tsdf_inpaint.fs / tsdf_colorfill.fs) ------------------------

def _pull(color, depth):
    H, W = depth.shape
    H2, W2 = max(H // 2, 1), max(W // 2, 1)
    # edge-pad so offsets -1..+2 around even texels stay in range
    cp = np.pad(color, ((1, 2 + 2 * H2 - H), (1, 2 + 2 * W2 - W), (0, 0)),
                mode="edge")
    dp = np.pad(depth, ((1, 2 + 2 * H2 - H), (1, 2 + 2 * W2 - W)),
                mode="edge")

    def fetch_c(dy, dx):
        return cp[1 + dy: 1 + dy + 2 * H2: 2, 1 + dx: 1 + dx + 2 * W2: 2]

    def fetch_d(dy, dx):
        return dp[1 + dy: 1 + dy + 2 * H2: 2, 1 + dx: 1 + dx + 2 * W2: 2]

    sum_d = np.zeros((H2, W2), np.float32)
    cnt = np.zeros((H2, W2), np.float32)
    samples = []
    for dx in range(-1, 3):
        for dy in range(-1, 3):
            c = fetch_c(dy, dx)
            d = fetch_d(dy, dx)
            valid = c[..., 3] > 0.0
            sum_d += np.where(valid, d, 0.0)
            cnt += valid
            samples.append((c, d, valid))
    depth_av = sum_d / np.maximum(cnt, 1.0)

    tot = np.zeros((H2, W2, 3), np.float32)
    total_d = np.zeros((H2, W2), np.float32)
    total_w = np.zeros((H2, W2), np.float32)
    for c, d, valid in samples:
        keep = valid & (d >= depth_av)
        tot += np.where(keep[..., None], c[..., :3], 0.0)
        total_d += np.where(keep, d, 0.0)
        total_w += keep
    w = np.maximum(total_w, 1.0)
    center_d = fetch_d(0, 0)
    hole = center_d < 1.0
    has = cnt > 0
    out = np.zeros((H2, W2, 4), np.float32)
    out[..., 0] = np.where(has, tot[..., 0] / w, 0.0)
    out[..., 1] = np.where(has, tot[..., 1] / w, np.where(hole, 0.0, 1.0))
    out[..., 2] = np.where(has, tot[..., 2] / w, 0.0)
    out[..., 3] = np.where(has, 1.0, np.where(hole, -1.0, 0.0))
    d_out = np.where(has, total_d / w, center_d)
    return out, d_out.astype(np.float32)


def _nearest_fetch(img, H, W):
    Hl, Wl = img.shape[:2]
    yi = np.clip(np.arange(H) * Hl // H, 0, Hl - 1)
    xi = np.clip(np.arange(W) * Wl // W, 0, Wl - 1)
    return img[yi][:, xi]


def _bilinear_fetch(img, H, W):
    Hl, Wl = img.shape[:2]
    u = (np.arange(W, dtype=np.float32) + 0.5) / W
    v = (np.arange(H, dtype=np.float32) + 0.5) / H
    uu, vv = np.meshgrid(u, v)
    return bilinear_2d(img, np.stack([uu, vv], axis=-1))


def fill_colors(rgba0, depth0, num_lods):
    colors, depths = [rgba0], [depth0]
    for _ in range(num_lods - 1):
        if min(depths[-1].shape) <= 1:
            break
        c, d = _pull(colors[-1], depths[-1])
        colors.append(c)
        depths.append(d)
    L = len(colors)
    H, W = depth0.shape

    fetched = [colors[0]] + [
        _nearest_fetch(colors[l], H, W) for l in range(1, L)
    ]
    valid = np.stack([f[..., 3] > 0.0 for f in fetched])
    level = np.argmax(valid, axis=0).astype(np.int64)
    level = np.where(valid.any(axis=0), level, L - 1)

    base = np.take_along_axis(
        np.stack(fetched), level[None, ..., None], axis=0
    )[0]

    bilin = [np.zeros((H, W, 4), np.float32)] + [
        _bilinear_fetch(colors[l], H, W) for l in range(1, L)
    ]
    bs = np.stack(bilin)
    l1 = np.clip(level + 1, 0, L - 1)
    l2 = np.clip(level + 2, 0, L - 1)
    c1 = np.take_along_axis(bs, l1[None, ..., None], axis=0)[0]
    c2 = np.take_along_axis(bs, l2[None, ..., None], axis=0)[0]
    u = (np.arange(W, dtype=np.float32) + 0.5) / W
    v = (np.arange(H, dtype=np.float32) + 0.5) / H
    uu, vv = np.meshgrid(u, v)
    w1 = np.sqrt(uu**2 + vv**2)
    w2 = 1.0 - w1
    denom = np.where(np.abs(w1 + w2) < 1e-20, 1e-20, w1 + w2)
    filled = level > 0
    out = np.where(
        filled[..., None],
        (c1 * w1[..., None] + c2 * w2[..., None]) / denom[..., None],
        base,
    )
    return out.astype(np.float32), depth0
