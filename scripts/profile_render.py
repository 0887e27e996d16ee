"""Profile the render path's sub-stages at reference scale on the real chip.

Breaks the 3recon time into: surface-brick mask, skip-field bake,
PackedVolume build, holefill pull / push, and differential renders with
stages toggled off. Run on the TPU: python scripts/profile_render.py
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
    from rgbd_recon_tpu.ops import holefill as hf
    from rgbd_recon_tpu.ops.raymarch import PackedVolume, ViewCamera
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
        print(f"{name:36s} {dt:9.2f} ms", file=sys.stderr, flush=True)
        return dt, r

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
    frames = render_rig_frames(scene, rig)

    cfg = PipelineConfig(
        voxel_size=0.01, brick_size=0.1, tsdf_limit=0.01, num_lods=7
    )
    pipe = TsdfPipeline(calib, cfg, bbox)
    camera = ViewCamera(width=1280, height=720, eye=(0.0, 1.3, 2.6),
                        target=(0.0, 1.1, 0.0))
    renderer = pipe.make_renderer(camera)

    volume, maps, counts = pipe.fuse(frames)
    sync(volume)

    # --- sub-stage timings -------------------------------------------------
    t_mask, occ = bench("surface_brick_mask",
                        jax.jit(pipe._surface_brick_mask), volume)

    # the per-frame Chebyshev skip-field bake (tsdf_pipeline.py render_blocks)
    vol_shape = pipe.volume_grid.shape

    def skip_bake(volume):
        K = 12
        h_min = 1.0 / max(vol_shape)
        dil = volume > 0.0

        def dilate1(m, ax):
            sl_lo = [slice(None)] * 3
            sl_lo[ax] = slice(1, None)
            sl_hi = [slice(None)] * 3
            sl_hi[ax] = slice(None, -1)
            pad_lo = [(0, 0)] * 3
            pad_lo[ax] = (0, 1)
            pad_hi = [(0, 0)] * 3
            pad_hi[ax] = (1, 0)
            return (
                m
                | jnp.pad(m[tuple(sl_lo)], pad_lo)
                | jnp.pad(m[tuple(sl_hi)], pad_hi)
            )

        safe_steps = jnp.zeros(vol_shape, jnp.float32)
        for _ in range(K):
            for ax in (0, 1, 2):
                dil = dilate1(dil, ax)
            safe_steps = safe_steps + (~dil).astype(jnp.float32)
        return jnp.where(safe_steps > 0.0, -(2.0 + safe_steps * h_min), volume)

    t_bake, vol_m = bench("skip_field_bake(K=12)", jax.jit(skip_bake), volume)
    t_pack, _ = bench("PackedVolume build",
                      jax.jit(lambda v: PackedVolume.from_volume(v).pairs),
                      vol_m)

    # holefill split
    H, W = 720, 1280
    out = renderer(volume, maps, counts)
    sync(out.color)
    rgba0 = jnp.where(out.hit[..., None],
                      jnp.concatenate([out.color,
                                       jnp.ones_like(out.color[..., :1])], -1),
                      0.0)
    dwin0 = out.depth

    pull_f = jax.jit(lambda c, d: hf.build_pyramid(c, d, cfg.num_lods))
    t_pull, pyr = bench("holefill pull (7 LODs)", pull_f, rgba0, dwin0)
    cs, ds_ = pull_f(rgba0, dwin0)
    push_f = jax.jit(lambda cs, ds: hf.push(list(cs), list(ds)))
    t_push, _ = bench("holefill push", push_f, cs, ds_)

    # full render and differential toggles
    t_full, _ = bench("render (defaults)", renderer, volume, maps, counts)

    def render_with(**kw):
        cfg2 = dataclasses.replace(cfg, **kw)
        p2 = TsdfPipeline.__new__(TsdfPipeline)
        p2.__dict__.update(pipe.__dict__)
        p2.config = cfg2
        return p2.make_renderer(camera)

    t_nofill, _ = bench("render colorfill=False",
                        render_with(colorfill=False), volume, maps, counts)
    t_noskip, _ = bench("render march_empty_skip=False",
                        render_with(march_empty_skip=False),
                        volume, maps, counts)
    t_shade0, _ = bench("render shade_mode=2 (no blend)",
                        render_with(shade_mode=2, colorfill=False),
                        volume, maps, counts)

    print("\nsummary:", file=sys.stderr)
    print(f"  full render          {t_full:8.2f}", file=sys.stderr)
    print(f"  holefill (diff)      {t_full - t_nofill:8.2f}", file=sys.stderr)
    print(f"  blend (diff, approx) {t_nofill - t_shade0:8.2f}", file=sys.stderr)
    print(f"  skip bake (direct)   {t_bake:8.2f}", file=sys.stderr)
    print(f"  mask+bake+pack       {t_mask + t_bake + t_pack:8.2f}",
          file=sys.stderr)
    print(f"  march+rest           "
          f"{t_nofill - t_mask - t_bake - t_pack:8.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()
