"""Profile the fuse-side stages (preprocess / mark / integrate internals)
at reference scale on the real chip: where do the 36 ms go and which knob
closes the gap to the 33.3 ms (30 fps) budget.

Run: python scripts/profile_fuse.py
"""

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
    from rgbd_recon_tpu.ops import tsdf
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
    volume, maps, counts = pipe.fuse(frames)
    sync(volume)
    n_occ = int(np.sum(np.asarray(counts) > cfg.min_voxels_per_brick))
    print(f"occupied bricks: {n_occ} / capacity {cfg.brick_capacity}",
          file=sys.stderr)

    pm = pipe._get_pixel_models(frames.depths.shape[1:3])

    bench("fuse (preprocess+mark+integrate)",
          lambda: pipe.fuse(frames)[0])
    bench("preprocess+mark", lambda: pipe.preprocess(frames)[0])
    bench("integrate", lambda: pipe.integrate(maps, counts))

    # mark alone (inside its own program)
    mark_f = jax.jit(lambda m: pipe._mark_bricks(calib, pm, m))
    bench("mark_bricks (solo)", mark_f, maps)

    # integrate internals
    ids_f = jax.jit(lambda cts: tsdf.occupied_brick_ids(
        cts, cfg.min_voxels_per_brick, cfg.brick_capacity))
    _, ids = bench("occupied_brick_ids", ids_f, counts)

    proj = pipe.projections
    gather_f = jax.jit(
        lambda p, i: p[:, jnp.minimum(i, p.shape[1] - 1)]
    )
    bench("projection block gather (N,K,V,4)", gather_f, proj, ids)

    # map-row gather at integrate's scale: N*K*V nearest rows from the
    # per-sensor (H*W, 4) tables
    N, B, V, _ = proj.shape
    H, W = maps.depth.shape[1:3]
    K = cfg.brick_capacity

    def map_gather(proj_, ids_, depth):
        p = proj_[:, jnp.minimum(ids_, B - 1)]
        p4 = jnp.stack([depth[..., 0]] * 4, axis=-1).reshape(N, H * W, 4)
        pp = jnp.moveaxis(p, -1, 0)
        xi = jnp.clip((pp[0] * W).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip((pp[1] * H).astype(jnp.int32), 0, H - 1)
        idx = yi * W + xi
        return jnp.stack([p4[i][idx[i]] for i in range(N)])

    bench("proj gather + map rows (integrate core)",
          jax.jit(map_gather), proj, ids, maps.depth)

    # the fold + scatter on top
    int_full = jax.jit(lambda m, cts: pipe._integrate_impl(
        calib, pipe.projections, m, cts, jnp.float32(cfg.tsdf_limit)))
    bench("integrate (solo jit)", int_full, maps, counts)

    # preprocess chain without marking
    import functools

    from rgbd_recon_tpu.ops.preprocess import preprocess_frames

    pp_only = jax.jit(functools.partial(
        preprocess_frames, morph=True, bilateral=True, refine=True,
    ))

    def pp_call():
        return preprocess_frames(
            frames.depths, frames.colors, calib.cv_xyz, calib.cv_uv,
            calib.bbox_min, calib.bbox_max, calib.depth_limits,
            calib.camera_positions, morph=True, bilateral=True,
            refine=True, pixel_models=pm,
        ).depth

    bench("preprocess chain (no mark)", jax.jit(pp_call))


if __name__ == "__main__":
    main()
