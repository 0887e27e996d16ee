"""March-phase diagnostics at reference scale: active blocks, unfinished
rays after phase 1, sample-count distribution, and timing of march phases
with varied configs. Run: python scripts/profile_march.py"""

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

    def bench(name, fn, *args, iters=10):
        r = fn(*args)
        sync(jax.tree_util.tree_leaves(r)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        sync(jax.tree_util.tree_leaves(r)[0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:44s} {dt:9.2f} ms", file=sys.stderr, flush=True)
        return dt, r

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

    cfg = PipelineConfig(
        voxel_size=0.01, brick_size=0.1, tsdf_limit=0.01, num_lods=7
    )
    pipe = TsdfPipeline(calib, cfg, bbox)
    camera = ViewCamera(width=1280, height=720, eye=(0.0, 1.3, 2.6),
                        target=(0.0, 1.1, 0.0))

    volume, maps, counts = pipe.fuse(frames)
    sync(volume)

    # stats from a default render
    renderer = pipe.make_renderer(camera)
    out = renderer(volume, maps, counts)
    num = np.asarray(out.num_samples)
    hit = np.asarray(out.hit)
    print(f"hit pixels: {hit.sum()} / {hit.size} ({100*hit.mean():.1f}%)",
          file=sys.stderr)
    nz = num[num > 0]
    print(f"marched rays: {nz.size}  steps mean={nz.mean():.1f} "
          f"p50={np.percentile(nz,50):.0f} p90={np.percentile(nz,90):.0f} "
          f"p99={np.percentile(nz,99):.0f} max={nz.max()}", file=sys.stderr)
    print(f"total gather-rows in march ~= {num.sum()/1e6:.2f}M",
          file=sys.stderr)
    occ = np.asarray(jax.jit(pipe._surface_brick_mask)(volume))
    print(f"surface bricks: {occ.sum()} / {occ.size}", file=sys.stderr)
    nocc = np.asarray((np.asarray(counts) > cfg.min_voxels_per_brick).sum())
    print(f"occupied(marked) bricks: {nocc} (capacity {cfg.brick_capacity})",
          file=sys.stderr)

    def render_with(**kw):
        cfg2 = dataclasses.replace(cfg, **kw)
        p2 = TsdfPipeline.__new__(TsdfPipeline)
        p2.__dict__.update(pipe.__dict__)
        p2.config = cfg2
        return p2.make_renderer(camera)

    bench("render defaults", renderer, volume, maps, counts)
    for rc in (0.15, 0.10):
        bench(f"render ray_compaction={rc}",
              render_with(ray_compaction=rc), volume, maps, counts)
    for p1 in (10, 40, 80):
        bench(f"render march_phase1_steps={p1}",
              render_with(march_phase1_steps=p1), volume, maps, counts)
    bench("render single-phase (p1=0)",
          render_with(march_phase1_steps=0), volume, maps, counts)
    for ds in (8,):
        bench(f"render interval_downsample={ds}",
              render_with(interval_downsample=ds), volume, maps, counts)
    bench("render hit_compaction=0.25",
          render_with(hit_compaction=0.25), volume, maps, counts)
    bench("render interval_step_frac=0.125",
          render_with(interval_step_frac=0.125), volume, maps, counts)


if __name__ == "__main__":
    main()
