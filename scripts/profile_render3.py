"""Differential render ablations (round 5): in-program stage costs via
config-variant renders, all compiled+measured in one run.

Run: python scripts/profile_render3.py
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

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

    def bench(name, fn, *args, iters=10, out=False):
        r = fn(*args)
        sync(jax.tree_util.tree_leaves(r)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        sync(jax.tree_util.tree_leaves(r)[0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        extra = ""
        if out and hasattr(r, "hit"):
            extra = (f"  hits={int(np.asarray(r.hit).sum())}"
                     f" ovf={np.asarray(r.overflow).tolist()}")
        print(f"{name:44s} {dt:9.2f} ms{extra}", file=sys.stderr, flush=True)
        return dt, r

    bbox = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
    rig = default_test_rig(
        num_sensors=4, depth_size=(512, 424), color_size=(1280, 1080),
        bbox=bbox,
    )
    print("baking calibration volumes...", file=sys.stderr)
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

    tA, outA = bench("A defaults (serial pooled fsurf)",
                     render_with(), volume, maps, counts, out=True)

    # B: march from a PREBAKED volume (bake excluded from the timed loop)
    render_fn, cam0 = pipe.make_render_fn(camera)
    limit = jnp.float32(cfg.tsdf_limit)
    baked = jax.jit(lambda v, ct: render_fn.bake(v, ct, limit))(
        volume, counts)
    pm = pipe._get_projection_models()
    fb = jax.jit(lambda b, m, cl, cm, p, l:
                 render_fn.render_from_baked(b, m, cl, cm, p, l))
    tB, outB = bench("B from prebaked (A minus bake)", fb,
                     baked, maps, calib, cam0, pm, limit, out=True)

    bench("C phase1=0 (single serial march)",
          render_with(march_phase1_steps=0), volume, maps, counts, out=True)
    bench("D shade2 nofill (march only-ish)",
          render_with(shade_mode=2, colorfill=False),
          volume, maps, counts, out=True)
    bench("E rayc=0.15", render_with(ray_compaction=0.15),
          volume, maps, counts, out=True)
    bench("F per-block brackets (serial)",
          render_with(bracket_per_block=True), volume, maps, counts,
          out=True)
    bench("G fine_rounds=3", render_with(skip_fine_rounds=3),
          volume, maps, counts, out=True)
    bench("H margin=2 bmax=12",
          render_with(bracket_margin_steps=2.0, bracket_max_steps=12.0),
          volume, maps, counts, out=True)
    bench("I hitc=0.58 p1=12",
          render_with(hit_compaction=0.58, march_phase1_steps=12),
          volume, maps, counts, out=True)


if __name__ == "__main__":
    main()
