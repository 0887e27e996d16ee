"""Diagnose the surface-accuracy tail: where do high-error rays land?"""
import os
import sys
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

from rgbd_recon_tpu.core.cache import enable_compile_cache
enable_compile_cache()
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from rgbd_recon_tpu.calib.sensors import build_synthetic_calibration
from rgbd_recon_tpu.core.config import PipelineConfig
from rgbd_recon_tpu.core.grid import BoundingBox
from rgbd_recon_tpu.ops.raymarch import ViewCamera
from rgbd_recon_tpu.recon import TsdfPipeline
from rgbd_recon_tpu.sensors.synthetic import (
    SyntheticScene, default_test_rig, render_rig_frames,
)
from rgbd_recon_tpu.ops import raymarch as rm

BBOX = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
SPHERE = ((0.0, 1.1, 0.0), 0.55)

import time
t = time.perf_counter()
def tick(msg):
    global t
    print(f"[{time.perf_counter()-t:7.1f}s] {msg}", flush=True)
    t = time.perf_counter()

rig = default_test_rig(num_sensors=4, bbox=BBOX)
calib = build_synthetic_calibration(rig, BBOX, cv_res=(24, 32, 24), inv_res=(40, 44, 40))
tick("calibration baked")
scene = SyntheticScene(spheres=[SPHERE])
frames = render_rig_frames(scene, rig)
tick("frames rendered")
cfg = PipelineConfig(voxel_size=0.05, brick_size=0.25, tsdf_limit=0.02, num_lods=5)
pipe = TsdfPipeline(calib, cfg, BBOX)
tick("pipeline built")
volume, maps, counts = pipe.fuse(frames)
volume.block_until_ready()
tick("fused")

# --- volume-level check: compare TSDF against analytic sdf at voxel centers
vol = np.asarray(volume)
from rgbd_recon_tpu.ops.tsdf import voxel_centers
centers = np.asarray(voxel_centers(vol.shape))
world = BBOX.denormalize(centers)
true_sd = scene.sdf(world)
band = np.abs(true_sd) < cfg.tsdf_limit * 0.75
print("volume shape", vol.shape, "band voxels", band.sum())
# reference sign: sdist = pos_calib.z - depth -> positive BEHIND surface
# (inside object). our true_sd: sphere sdf positive outside. so vol ~ -true_sd
err = vol[band] - (-true_sd[band])
print("TSDF in-band err: mean %.4f  std %.4f  p90(|err|) %.4f"
      % (err.mean(), err.std(), np.percentile(np.abs(err), 90)))

lim = cfg.tsdf_limit
vb = vol[band]
at_neg = vb <= -lim * 0.999
at_pos = vb >= lim * 0.999
print("in-band voxels: %d  at -limit (carved/behind): %d  at +limit "
      "(unwritten): %d  real: %d" % (band.sum(), at_neg.sum(), at_pos.sum(),
                                     (~at_neg & ~at_pos).sum()))
real = ~at_neg & ~at_pos
err_real = vb[real] - (-true_sd[band][real])
print("real-valued in-band err: mean %.4f std %.4f" %
      (err_real.mean(), err_real.std()))

# where are the carved in-band voxels? (height slices)
zi, yi, xi = np.nonzero(band)
heights = world[band][:, 1]
for tag, m in [("carved", at_neg), ("unwritten", at_pos)]:
    if m.sum():
        h = heights[m]
        print(f"{tag}: n={m.sum()} y-range {h.min():.2f}..{h.max():.2f} "
              f"mean {h.mean():.2f}")

cam = ViewCamera(width=64, height=56, eye=(0.0, 1.2, 2.5), target=(0.0, 1.1, 0.0))
eye_vol = jnp.asarray(BBOX.normalize(np.asarray(cam.eye, np.float32)))
dirs = jnp.asarray(cam.ray_directions_world() / BBOX.size)
hit, hit_pos, _ = rm.march(volume, eye_vol, dirs, cfg.tsdf_limit, 400)
hit = np.asarray(hit)
world_h = BBOX.denormalize(np.asarray(hit_pos))
sd = np.abs(scene.sdf(world_h[hit]))
print("hits", hit.sum(), "median", np.median(sd), "p90", np.percentile(sd, 90),
      "max", sd.max())

# error image: coarse 16x16 max-pooled view (mm)
img = np.zeros(hit.shape)
img[hit] = sd
Hh, Ww = img.shape
ph, pw = Hh // 8, Ww // 8
pooled = img[: ph * 8, : pw * 8].reshape(8, ph, 8, pw).max(axis=(1, 3))
np.set_printoptions(linewidth=200, suppress=True)
print("max err (mm) per image block:")
print((pooled * 1000).astype(int))

# trace the worst ray
bad = np.unravel_index(np.argmax(img), img.shape)
print("worst ray pixel", bad, "err", img[bad])
d0 = np.asarray(dirs)[bad]
e0 = np.asarray(eye_vol)
step = d0 / np.linalg.norm(d0) * (cfg.tsdf_limit * 0.5)
from rgbd_recon_tpu.ops.sampling import trilinear_3d as tri
samples = []
for k in range(400):
    p = e0 + step * k
    if (p < 0).any() or (p > 1).any():
        continue
    v = float(np.asarray(tri(volume[..., None], jnp.asarray(p))).ravel()[0])
    w = BBOX.denormalize(p)
    samples.append((k, v, float(scene.sdf(w[None])[0])))
prev = -cfg.tsdf_limit
for k, v, s in samples:
    mark = " <-- CROSS" if (prev <= 0.0 < v) else ""
    print(f"  k={k:3d} tsdf={v:+.4f} true_sd={s:+.3f}{mark}")
    prev = v
