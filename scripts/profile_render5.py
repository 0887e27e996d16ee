"""Round-5 focused render phase split: march vs refine/grad vs blend.

Each config times the full render_blocks program; differences between
configs isolate phase cost (the phases live in one XLA program, so this
is the only reliable split through the tunneled-device transport).
"""

import dataclasses
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

    def bench(name, fn, *args, iters=10):
        r = fn(*args)
        sync(jax.tree_util.tree_leaves(r)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        sync(jax.tree_util.tree_leaves(r)[0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        extra = ""
        if hasattr(r, "hit"):
            extra = (f"  hits={int(np.asarray(r.hit).sum())}"
                     f" ovf={np.asarray(r.overflow).tolist()}")
        print(f"{name:44s} {dt:9.2f} ms{extra}", file=sys.stderr, flush=True)
        return dt, r

    bbox = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
    rig = default_test_rig(
        num_sensors=4, depth_size=(512, 424), color_size=(1280, 1080),
        bbox=bbox,
    )
    calib = build_synthetic_calibration(
        rig, bbox, cv_res=(128, 256, 128), inv_res=(200, 220, 200)
    )
    scene = SyntheticScene(
        spheres=[((0.0, 1.1, 0.0), 0.55), ((0.4, 0.6, 0.3), 0.25)]
    )
    frames = render_rig_frames(scene, rig)
    cfg = PipelineConfig(
        voxel_size=0.01, brick_size=0.1, tsdf_limit=0.01, num_lods=7
    )
    pipe = TsdfPipeline(calib, cfg, bbox)
    camera = ViewCamera(width=1280, height=720, eye=(0.0, 1.3, 2.6),
                        target=(0.0, 1.1, 0.0))
    volume, maps, counts = pipe.fuse(frames)
    sync(volume)

    def render_with(**kw):
        cfg2 = dataclasses.replace(cfg, **kw)
        p2 = TsdfPipeline.__new__(TsdfPipeline)
        p2.__dict__.update(pipe.__dict__)
        p2.config = cfg2
        return p2.make_renderer(camera)

    bench("A defaults", render_with(), volume, maps, counts)
    bench("B blend-skip", render_with(debug_skip="blend"),
          volume, maps, counts)
    bench("C blend+grad+refine-skip",
          render_with(debug_skip="blend,refine,grad"),
          volume, maps, counts)
    bench("D holefill off", render_with(colorfill=False),
          volume, maps, counts)


if __name__ == "__main__":
    main()
