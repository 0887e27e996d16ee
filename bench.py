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

    # per-pass taxonomy inside the chains (the reference's timer names:
    # NetKinectArray.cpp:211-216, recon_integration.cpp:146-148) — each
    # pass timed as its own program, so the numbers carry dispatch overhead
    # the fused chains do not; they expose intra-chain regressions.
    import jax.numpy as jnp

    from rgbd_recon_tpu.ops import holefill as hf
    from rgbd_recon_tpu.ops import preprocess as pp
    from rgbd_recon_tpu.ops import stencil_pallas as sp

    pmod = pipe._get_pixel_models(frames.depths.shape[1:3])
    morph_f = jax.jit(jax.vmap(pp.morph_dilate))
    bil_f = lambda d: sp.bilateral13_tpu(d, calib.depth_limits)  # noqa: E731
    qual_f = jax.jit(sp.quality13_tpu)
    bnd_f = jax.jit(jax.vmap(lambda d, l: pp.boundary(d, l, True)))
    pmt = None
    if pmod is not None:
        pmt = (pmod.ray_a, pmod.ray_b, pmod.uv_p, pmod.uv_q, pmod.uv_r)
    nrm_f = jax.jit(jax.vmap(
        lambda d, pm_: pp.normals(d, None, pixel_model=pm_)))
    mark_f = jax.jit(lambda m: pipe._mark_bricks(calib, pmod, m))
    fill_f = jax.jit(lambda c, d: hf.fill_colors(c, d, cfg.num_lods))
    rgba0 = jnp.zeros(out.color.shape[:2] + (4,), jnp.float32)
    dwin0 = jnp.ones(out.color.shape[:2], jnp.float32)

    passes = [
        ("morph", lambda: morph_f(frames.depths)),
        ("bilateral", lambda: bil_f(maps.raw_depth)),
        ("boundary", lambda: bnd_f(maps.depth, maps.lab)),
        ("normal", lambda: nrm_f(maps.depth, pmt)),
        ("quality", lambda: qual_f(maps.depth[..., 0])),
        ("brickdraw", lambda: mark_f(maps)),
        ("holefill", lambda: fill_f(rgba0, dwin0)),
    ]
    # amortize over 10 calls per sample: the tunneled device's dispatch+
    # sync round trip (~20 ms) would otherwise swamp these sub-10ms passes
    for name, fn in passes:
        sync(jax.tree_util.tree_leaves(fn())[0])
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                r = fn()
            sync(jax.tree_util.tree_leaves(r)[0])
            db.timer(name).add((time.perf_counter() - t0) / 10)

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
