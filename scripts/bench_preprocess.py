"""Per-pass timing of the preprocess chain at reference scale on TPU,
matching the pipeline's actual staged structure (pixel models + Pallas
stencils + brick marking)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from rgbd_recon_tpu.core.cache import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from rgbd_recon_tpu.calib import build_synthetic_calibration
from rgbd_recon_tpu.core import BoundingBox, PipelineConfig
from rgbd_recon_tpu.ops import preprocess as pp
from rgbd_recon_tpu.ops import stencil_pallas as sp
from rgbd_recon_tpu.recon import TsdfPipeline
from rgbd_recon_tpu.sensors import (
    SyntheticScene, default_test_rig, render_rig_frames,
)


def sync(*arrays):
    for a in arrays:
        np.asarray(jax.device_get(jnp.ravel(a)[0]))


def timeit(name, fn, *args, iters=10):
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
cfg = PipelineConfig(voxel_size=0.01, brick_size=0.1, tsdf_limit=0.01)
pipe = TsdfPipeline(calib, cfg, bbox)
pm = pipe._get_pixel_models(frames.depths.shape[1:3])

# whole preprocess (incl. brick marking) as the pipeline runs it
pre = timeit("preprocess FULL (pipeline)", lambda f: pipe.preprocess(f),
             frames)
maps, counts = pre

vm = lambda f, axes: jax.jit(jax.vmap(f, in_axes=axes))  # noqa: E731

morph = vm(pp.morph_dilate, (0,))
d_m = timeit("  morph (3x3 x2)", morph, frames.depths)

timeit("  pallas bilateral13", sp.bilateral13_tpu, d_m, calib.depth_limits)
timeit("  pallas quality13", sp.quality13_tpu, maps.depth[..., 0])

pmt = (pm.ray_a, pm.ray_b, pm.uv_p, pm.uv_q, pm.uv_r)
bil = jax.jit(
    jax.vmap(
        lambda d, c, dl, pm_: pp.bilateral_lab(
            d, c, None, None, calib.bbox_min, calib.bbox_max, dl, True,
            pixel_model=pm_),
        in_axes=(0, 0, 0, 0),
    )
)
out = timeit("  bilateral+lab combine (jnp, pixel model)", bil, d_m,
             frames.colors, calib.depth_limits, pmt)
depth2, lab = out

bnd = vm(lambda d, l: pp.boundary(d, l, True), (0, 0))
out2 = timeit("  boundary (5x5, 5ch)", bnd, depth2, lab)
depth2b, sil = out2

nrm_f = jax.jit(jax.vmap(
    lambda d, pm_: pp.normals(d, None, pixel_model=pm_), in_axes=(0, 0)))
nrm = timeit("  normals (pixel model)", nrm_f, depth2b, pmt)

qual_f = jax.jit(jax.vmap(
    lambda d, n, cp, pm_: pp.quality(d, n, None, cp, pixel_model=pm_),
    in_axes=(0, 0, 0, 0)))
timeit("  quality combine (jnp, pixel model)", qual_f, depth2b, nrm,
       calib.camera_positions, pmt)

mark = jax.jit(lambda m: pipe._mark_bricks(calib, pm, m))
timeit("  mark bricks", mark, maps)

# LAB color bilinear alone (the big gather in bilateral_lab)
from rgbd_recon_tpu.ops.sampling import bilinear_2d


@jax.jit
def color_sample(colors, d):
    def one(c, dn, p_, q_, r_):
        ze = jnp.where((dn <= 0.0) | (dn >= 1.0), 1.0, dn)[..., None]
        uv = (p_ + q_ * ze) / (1.0 + r_ * ze)
        return bilinear_2d(c, uv)

    return jax.vmap(one)(colors, d, pm.uv_p, pm.uv_q, pm.uv_r)


timeit("  color bilinear fetch alone", color_sample, frames.colors,
       maps.depth[..., 0])
