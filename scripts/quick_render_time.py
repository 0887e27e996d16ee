"""Quick render timing at reference scale with config overrides from env.

RGBD_OVERRIDES='interval_step_frac=0.75,march_phase1_steps=8' python ...
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    from rgbd_recon_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from rgbd_recon_tpu.calib import build_synthetic_calibration
    from rgbd_recon_tpu.core import BoundingBox, PipelineConfig
    from rgbd_recon_tpu.ops.raymarch import ViewCamera
    from rgbd_recon_tpu.recon import TsdfPipeline
    from rgbd_recon_tpu.sensors import (
        SyntheticScene,
        default_test_rig,
        render_rig_frames,
    )

    def sync(*arrays):
        for a in arrays:
            np.asarray(jax.device_get(a.ravel()[0]))

    overrides = {}
    for kv in os.environ.get("RGBD_OVERRIDES", "").split(","):
        if "=" not in kv:
            continue
        k, _, v = kv.partition("=")
        cur = getattr(PipelineConfig(), k)
        if isinstance(cur, str):
            overrides[k] = v
        elif isinstance(cur, bool):
            overrides[k] = v.lower() in ("1", "true", "yes")
        else:
            overrides[k] = type(cur)(float(v))

    bbox = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
    rig = default_test_rig(
        num_sensors=4, depth_size=(512, 424), color_size=(1280, 1080), bbox=bbox
    )
    calib = build_synthetic_calibration(
        rig, bbox, cv_res=(128, 256, 128), inv_res=(200, 220, 200)
    )
    scene = SyntheticScene(
        spheres=[((0.0, 1.1, 0.0), 0.55), ((0.4, 0.6, 0.3), 0.25)]
    )
    frames = render_rig_frames(scene, rig)
    cfg = dataclasses.replace(
        PipelineConfig(voxel_size=0.01, brick_size=0.1, tsdf_limit=0.01,
                       num_lods=7),
        **overrides,
    )
    pipe = TsdfPipeline(calib, cfg, bbox)
    camera = ViewCamera(width=1280, height=720, eye=(0.0, 1.3, 2.6),
                        target=(0.0, 1.1, 0.0))
    renderer = pipe.make_renderer(camera)
    t0 = time.perf_counter()
    volume, maps, counts = pipe.fuse(frames)
    sync(volume)
    print(f"fuse compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = renderer(volume, maps, counts)
    sync(out.color)
    print(f"render compile+run {time.perf_counter()-t0:.1f}s", flush=True)

    for name, fn in (
        ("fuse", lambda: pipe.fuse(frames)[0]),
        ("render", lambda: renderer(volume, maps, counts).color),
    ):
        fn()
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(10):
            r = fn()
        sync(r)
        print(f"{name:8s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms",
              flush=True)
    print("hits:", int(np.asarray(out.hit).sum()),
          "overflow:", np.asarray(out.overflow).tolist(), flush=True)


if __name__ == "__main__":
    main()
