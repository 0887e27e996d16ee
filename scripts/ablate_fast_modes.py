"""Fast-mode accuracy/performance ablation (round-5 verdict item 6).

One table: surface RMSE (analytic-sphere oracle, bench.py's formulation)
plus fused-step and render times, for each fast-path knob toggled to its
reference-exact setting INDIVIDUALLY from the fast defaults. Shows what
each approximation buys and costs; writes ABLATION.md.

Run on the TPU: python scripts/ablate_fast_modes.py
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

    bbox = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
    rig = default_test_rig(
        num_sensors=4, depth_size=(512, 424), color_size=(1280, 1080),
        bbox=bbox,
    )
    print("baking calibration volumes...", file=sys.stderr)
    calib = build_synthetic_calibration(
        rig, bbox, cv_res=(128, 256, 128), inv_res=(200, 220, 200)
    )
    SPHERE_C = (0.0, 1.1, 0.0)
    SPHERE_R = 0.55
    scene = SyntheticScene(spheres=[(SPHERE_C, SPHERE_R)])
    frames = render_rig_frames(scene, rig)
    base = PipelineConfig(
        voxel_size=0.01, brick_size=0.1, tsdf_limit=0.01, num_lods=7
    )
    camera = ViewCamera(width=1280, height=720, eye=(0.0, 1.3, 2.6),
                        target=(0.0, 1.1, 0.0))

    def surface_rmse_mm(render_out, cam):
        hit = np.asarray(render_out.hit)
        depth_win = np.asarray(render_out.depth)
        n, f = cam.near, cam.far
        view_z = 1.0 / (1.0 / n - depth_win * (1.0 / n - 1.0 / f))
        dirs = cam.ray_directions_world()
        eye = np.asarray(cam.eye, np.float32)
        oc = eye - np.asarray(SPHERE_C, np.float32)
        b = np.sum(dirs * oc, axis=-1)
        a = np.sum(dirs * dirs, axis=-1)
        disc = b * b - a * (np.dot(oc, oc) - SPHERE_R**2)
        ok = hit & (disc > 0.0)
        t_true = (-b - np.sqrt(np.maximum(disc, 0.0))) / a
        err = (view_z - t_true)[ok] * np.linalg.norm(dirs[ok], axis=-1)
        err = err[np.isfinite(err)]
        return float(np.sqrt(np.mean(err**2)) * 1000.0)

    variants = [
        ("fast defaults", {}),
        ("march trilinear+nolskip",
         dict(march_mode="trilinear", march_empty_skip=False)),
        ("integrate_taps bilinear", dict(integrate_taps="bilinear")),
        ("mark_stride 1", dict(mark_stride=1)),
        ("march_dtype f32", dict(march_dtype="float32")),
        ("projection_model off", dict(projection_model=False)),
        ("oct_hit_table off", dict(oct_hit_table=False)),
        ("reference-exact (all)",
         dict(march_mode="trilinear", march_empty_skip=False,
              integrate_taps="bilinear", mark_stride=1,
              projection_model=False, march_dtype="float32")),
    ]

    rows = []
    for name, kw in variants:
        cfg = dataclasses.replace(base, **kw)
        pipe = TsdfPipeline(calib, cfg, bbox)
        renderer = pipe.make_renderer(camera)
        volume, maps, counts = pipe.fuse(frames)
        out = renderer(volume, maps, counts)
        sync(out.color)

        def timed(fn, iters=10):
            fn()
            sync(jax.tree_util.tree_leaves(fn())[0])
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn()
            sync(jax.tree_util.tree_leaves(r)[0])
            return (time.perf_counter() - t0) / iters * 1e3

        fuse_ms = timed(lambda: pipe.fuse(frames)[0])
        render_ms = timed(lambda: renderer(volume, maps, counts).color)
        rmse = surface_rmse_mm(out, camera)
        rows.append((name, rmse, fuse_ms, render_ms))
        print(f"{name:28s} rmse {rmse:6.2f} mm  fuse {fuse_ms:7.2f} ms  "
              f"render {render_ms:7.2f} ms", file=sys.stderr, flush=True)

    lines = [
        "# Fast-mode accuracy/performance ablation",
        "",
        "Reference scale (4 sensors, 512x424, 1 cm voxels, 720p render);",
        "analytic-sphere surface RMSE (bench.py oracle). Each row toggles",
        "ONE fast knob to its reference-exact setting from the fast",
        "defaults; the last row is the full reference-exact parity mode.",
        "",
        "| variant | surface RMSE (mm) | fused step (ms) | render (ms) |",
        "|---|---|---|---|",
    ]
    for name, rmse, fuse_ms, render_ms in rows:
        lines.append(
            f"| {name} | {rmse:.2f} | {fuse_ms:.1f} | {render_ms:.1f} |"
        )
    lines += [
        "",
        f"Device: {jax.devices()[0]}.",
    ]
    with open("/root/repo/ABLATION.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote ABLATION.md", file=sys.stderr)


if __name__ == "__main__":
    main()
