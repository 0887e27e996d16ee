"""Headline benchmark: fused frames/s at 4 sensors (bricked TSDF).

Reference-scale configuration (BASELINE.md):
  4 sensors, 512x424 depth maps, bbox 2 x 2.2 x 2 m, 1 cm voxels
  (200x220x200 = 8.8M), 10 cm bricks, tsdf_limit 0.01, raymarched render.

Prints ONE JSON line:
  {"metric": "fused_fps_4sensors", "value": N, "unit": "frames/s",
   "vs_baseline": N}
vs_baseline is against the reference's real-time target of 30 fused
frames/s per host (BASELINE.md "Target").

Per-stage breakdown (the reference's timer taxonomy) goes to stderr and
bench_stages.csv.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: first-round compiles are the dominant
    # cost through the remote-compile transport; the env-var route is not
    # honored under the tunneled TPU plugin (core/cache.py)
    from rgbd_recon_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from rgbd_recon_tpu.bench import TimerDatabase

    def sync(*arrays):
        """True device sync: fetch one element to host. block_until_ready
        alone does not flush through tunneled-device transports."""
        for a in arrays:
            np.asarray(jax.device_get(a.ravel()[0]))
    from rgbd_recon_tpu.calib import build_synthetic_calibration
    from rgbd_recon_tpu.core import BoundingBox, PipelineConfig
    from rgbd_recon_tpu.ops.raymarch import ViewCamera
    from rgbd_recon_tpu.recon import TsdfPipeline
    from rgbd_recon_tpu.sensors import (
        SyntheticScene,
        default_test_rig,
        render_rig_frames,
    )

    bbox = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
    rig = default_test_rig(
        num_sensors=4, depth_size=(512, 424), color_size=(1280, 1080), bbox=bbox
    )
    print("baking calibration volumes...", file=sys.stderr)
    calib = build_synthetic_calibration(
        rig, bbox, cv_res=(128, 256, 128), inv_res=(200, 220, 200)
    )
    scene = SyntheticScene(
        spheres=[((0.0, 1.1, 0.0), 0.55), ((0.4, 0.6, 0.3), 0.25)]
    )
    print("rendering synthetic frames...", file=sys.stderr)
    frames = render_rig_frames(scene, rig)

    cfg = PipelineConfig(
        voxel_size=0.01, brick_size=0.1, tsdf_limit=0.01, num_lods=7
    )
    pipe = TsdfPipeline(calib, cfg, bbox)
    camera = ViewCamera(width=1280, height=720, eye=(0.0, 1.3, 2.6),
                        target=(0.0, 1.1, 0.0))
    renderer = pipe.make_renderer(camera)

    db = TimerDatabase()

    t0 = time.perf_counter()
    print("compiling fuse...", file=sys.stderr)
    volume, maps, counts = pipe.fuse(frames)
    sync(volume)
    print(f"fuse compiled+ran in {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    print("compiling render...", file=sys.stderr)
    out = renderer(volume, maps, counts)
    sync(out.color)
    print(f"render compiled+ran in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    iters = 10
    # fused update (preprocess + bricks + integrate): the headline loop
    t0 = time.perf_counter()
    for _ in range(iters):
        volume, maps, counts = pipe.fuse(frames)
    sync(volume)
    db.timer("2integrate+1preprocess").add((time.perf_counter() - t0) / iters)
    # stage splits
    for _ in range(iters):
        with db.time("1preprocess"):
            maps2, counts2 = pipe.preprocess(frames)
            sync(maps2.quality)
        with db.time("2integrate"):
            v2 = pipe.integrate(maps2, counts2)
            sync(v2)
        with db.time("3recon"):
            o2 = renderer(volume, maps, counts)
            sync(o2.color)

    # full frame: fuse + render
    t0 = time.perf_counter()
    for _ in range(iters):
        volume, maps, counts = pipe.fuse(frames)
        out = renderer(volume, maps, counts)
    sync(volume, out.color)
    full_dt = (time.perf_counter() - t0) / iters
    db.timer("frame").add(full_dt)

    fused_dt = db.timer("2integrate+1preprocess").mean
    fps = 1.0 / fused_dt
    full_fps = 1.0 / full_dt

    print(db.write_csv("bench_stages.csv"), file=sys.stderr)
    print(f"fused fps: {fps:.2f}  full-frame fps (incl. render): {full_fps:.2f}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "fused_fps_4sensors",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "full_frame_fps": round(full_fps, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
