"""Per-pass timing of the preprocess chain at reference scale on TPU."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

from rgbd_recon_tpu.core.cache import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from rgbd_recon_tpu.calib import build_synthetic_calibration
from rgbd_recon_tpu.core import BoundingBox, PipelineConfig
from rgbd_recon_tpu.ops import preprocess as pp
from rgbd_recon_tpu.sensors import (
    SyntheticScene, default_test_rig, render_rig_frames,
)


def sync(*arrays):
    for a in arrays:
        np.asarray(jax.device_get(jnp.ravel(a)[0]))


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:45s} {dt:10.2f} ms", flush=True)
    return out


bbox = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
rig = default_test_rig(num_sensors=4, depth_size=(512, 424),
                       color_size=(1280, 1080), bbox=bbox)
print("baking calibration...", flush=True)
calib = build_synthetic_calibration(rig, bbox, cv_res=(128, 256, 128),
                                    inv_res=(200, 220, 200))
scene = SyntheticScene(spheres=[((0.0, 1.1, 0.0), 0.55), ((0.4, 0.6, 0.3), 0.25)])
frames = render_rig_frames(scene, rig)

vm = lambda f, axes: jax.jit(jax.vmap(f, in_axes=axes))

morph = vm(pp.morph_dilate, (0,))
d_m = timeit("morph (3x3 x2, 4 sensors)", morph, frames.depths)

bil = vm(
    lambda d, c, cx, cu, dl: pp.bilateral_lab(
        d, c, cx, cu, calib.bbox_min, calib.bbox_max, dl, True),
    (0, 0, 0, 0, 0),
)
out = timeit("bilateral+lab (13x13)", bil, d_m, frames.colors,
             calib.cv_xyz, calib.cv_uv, calib.depth_limits)
depth2, lab = out

bnd = vm(lambda d, l: pp.boundary(d, l, True), (0, 0))
out2 = timeit("boundary (5x5, 5ch)", bnd, depth2, lab)
depth2b, sil = out2

nrm_f = vm(pp.normals, (0, 0))
nrm = timeit("normals", nrm_f, depth2b, calib.cv_xyz)

qual_f = vm(pp.quality, (0, 0, 0, 0))
timeit("quality (13x13)", qual_f, depth2b, nrm, calib.cv_xyz,
       calib.camera_positions)
