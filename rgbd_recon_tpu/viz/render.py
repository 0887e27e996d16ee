"""Offline visualization — the GUI texture viewer's equivalents.

The reference shows every intermediate map in ImGui windows
(kinect_client.cpp:486-518) and visualizes the TSDF volume as colored voxel
points (ReconCalibs, framework/reconstruction/recon_calibs.cpp). Headless
equivalents: PNG dumps of sensor maps, normal/depth colorizations, and TSDF
slice images with the same sign-coloring convention as calib_vis.fs
(red outside / green inside / blue at +limit).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def save_image(path, array) -> None:
    """Save a float [0,1] (H,W,3|1) or uint8 array as PNG."""
    from PIL import Image

    a = np.asarray(array)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0.0, 1.0) * 255).astype(np.uint8)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    Image.fromarray(a).save(str(path))


def colorize_depth(depth, lo=None, hi=None) -> np.ndarray:
    """Normalized grayscale of a depth map; invalid (<=0) shown red."""
    d = np.asarray(depth, np.float32)
    valid = d > 0
    if lo is None:
        lo = d[valid].min() if valid.any() else 0.0
    if hi is None:
        hi = d[valid].max() if valid.any() else 1.0
    g = np.clip((d - lo) / max(hi - lo, 1e-9), 0, 1)
    img = np.stack([g, g, g], axis=-1)
    img[~valid] = [0.6, 0.1, 0.1]
    return img


def colorize_normals(normals) -> np.ndarray:
    """World normals -> RGB in [0,1] (the standard n*0.5+0.5 view)."""
    return np.asarray(normals) * 0.5 + 0.5


def sensor_map_gallery(maps, out_dir, sensor: int = 0) -> list:
    """Dump one sensor's full map set (the texture-viewer set:
    color, lab, processed depth, quality, normal, silhouette)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = []

    def w(name, img):
        p = out / f"sensor{sensor}_{name}.png"
        save_image(p, img)
        written.append(p)

    w("color", np.asarray(maps.color[sensor]))
    lab = np.asarray(maps.lab[sensor])
    w("lab", (lab - lab.min()) / max(lab.max() - lab.min(), 1e-9))
    w("depth", colorize_depth(np.asarray(maps.depth[sensor][..., 0])))
    q = np.asarray(maps.quality[sensor])
    w("quality", q / max(q.max(), 1e-9))
    w("normal", colorize_normals(np.asarray(maps.normal[sensor])))
    w("silhouette", np.asarray(maps.silhouette[sensor]))
    return written


def tsdf_slice_image(volume, axis: int = 0, index: int = None, limit: float = 0.01):
    """Color a TSDF slice like calib_vis.fs: red where carved/outside
    (-limit), blue where empty (+limit), green band near the surface."""
    v = np.asarray(volume)
    if index is None:
        index = v.shape[axis] // 2
    sl = np.take(v, index, axis=axis)
    img = np.zeros(sl.shape + (3,), np.float32)
    t = np.clip(sl / limit, -1.0, 1.0)
    img[..., 0] = np.clip(-t, 0, 1)          # inside/carved -> red
    img[..., 2] = np.clip(t, 0, 1)           # far outside -> blue
    img[..., 1] = np.clip(1.0 - np.abs(t), 0, 1)  # surface band -> green
    return img
