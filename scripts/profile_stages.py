"""Directly time the jitted render sub-stages at reference scale."""
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
        SyntheticScene, default_test_rig, render_rig_frames,
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
        bbox=bbox)
    calib = build_synthetic_calibration(
        rig, bbox, cv_res=(128, 256, 128), inv_res=(200, 220, 200))
    frames = render_rig_frames(
        SyntheticScene(spheres=[((0.0, 1.1, 0.0), 0.55)]), rig)
    cfg = PipelineConfig(voxel_size=0.01, brick_size=0.1, tsdf_limit=0.01,
                         num_lods=7)
    pipe = TsdfPipeline(calib, cfg, bbox)
    camera = ViewCamera(width=1280, height=720, eye=(0.0, 1.3, 2.6),
                        target=(0.0, 1.1, 0.0))
    volume, maps, counts = pipe.fuse(frames)
    sync(volume)

    render_fn, cam0 = pipe.make_render_fn(camera)
    limit = jnp.float32(cfg.tsdf_limit)

    bake_j = jax.jit(lambda v, c_, l: render_fn.bake(v, c_, l)[0].pairs)
    t_bake, _ = bench("bake (sentinels+occ+bsafe+pack)", bake_j,
                      volume, counts, limit)

    baked_j = jax.jit(render_fn.bake)
    baked = baked_j(volume, counts, limit)
    sync(baked[0].pairs)

    pmods = pipe._get_projection_models()

    from_baked_j = jax.jit(
        lambda b, m, cal, cm, l: render_fn.render_from_baked(
            b, m, cal, cm, pmods, l).color)
    t_fb, _ = bench("render_from_baked (march+shade+fill)", from_baked_j,
                    baked, maps, pipe.calib, cam0, limit)

    full_j = jax.jit(
        lambda v, m, c_, cal, cm, l: render_fn(
            v, m, c_, cal, cm, pmods, l).color)
    t_full, _ = bench("full render", full_j,
                      volume, maps, counts, pipe.calib, cam0, limit)

    # ---- inline replicas of the scan + block-march stages ---------------
    import numpy as _np
    c = cfg
    H, W = camera.height, camera.width
    tan_half = float(_np.tan(_np.radians(camera.fov_y) * 0.5))
    aspect = W / H
    bbox_size = _np.asarray(bbox.size, _np.float32)
    vol_shape = pipe.volume_grid.shape
    Z, Y, X = vol_shape
    bv = pipe.brick_vox
    h_min = 1.0 / max(vol_shape)
    brick_norm = bv * h_min
    step_len = c.interval_step_frac * brick_norm
    n_scan = int(_np.ceil(_np.sqrt(3.0) / step_len)) + 2
    ds = c.interval_downsample
    Hp, Wp = -(-H // ds) * ds, -(-W // ds) * ds
    Hb, Wb = Hp // ds, Wp // ds
    NB = Hb * Wb

    def ray_dirs(cam, hh, ww, stride=1):
        xs = ((jnp.arange(0, ww, stride, dtype=jnp.float32) + 0.5) / W * 2.0 - 1.0)
        ys = 1.0 - (jnp.arange(0, hh, stride, dtype=jnp.float32) + 0.5) / H * 2.0
        xx, yy = jnp.meshgrid(xs * tan_half * aspect, ys * tan_half)
        dirs_cam = jnp.stack([xx, yy, -jnp.ones_like(xx)], axis=-1)
        dirs_world = dirs_cam @ cam.rot.T
        dirs_vol = dirs_world / jnp.asarray(bbox_size)
        return dirs_vol / jnp.linalg.norm(dirs_vol, axis=-1, keepdims=True)

    def scan_only(occ, bsafe, cam):
        Bz, By, Bx = occ.shape
        field = jnp.where(occ, -1.0, jnp.where(bsafe == 0.0, 0.0, 1.0)).reshape(-1)
        # aabb
        def lohi(any_ax, n, vox_per, true_n):
            idx = jnp.arange(n)
            lo = jnp.min(jnp.where(any_ax, idx, n))
            hi = jnp.max(jnp.where(any_ax, idx, -1))
            return (lo.astype(jnp.float32) * vox_per / true_n,
                    jnp.minimum((hi + 1).astype(jnp.float32) * vox_per / true_n, 1.0))
        zlo, zhi = lohi(occ.any(axis=(1, 2)), Bz, bv, Z)
        ylo, yhi = lohi(occ.any(axis=(0, 2)), By, bv, Y)
        xlo, xhi = lohi(occ.any(axis=(0, 1)), Bx, bv, X)
        box_min = jnp.stack([xlo, ylo, zlo]); box_max = jnp.stack([xhi, yhi, zhi])
        dn = ray_dirs(cam, Hp, Wp)
        dirs_c = dn[ds // 2::ds, ds // 2::ds][::2, ::2]
        inv = 1.0 / dirs_c
        tbot = inv * (box_min - cam.eye_vol)
        ttop = inv * (box_max - cam.eye_vol)
        s0 = jnp.max(jnp.minimum(ttop, tbot), axis=-1)
        s1 = jnp.min(jnp.maximum(ttop, tbot), axis=-1)
        valid = (s0 <= s1) & (s1 > 0.0)
        s0 = jnp.maximum(s0, 0.0)
        s1 = jnp.where(valid, s1, -1.0)
        ks = jnp.arange(n_scan, dtype=jnp.float32)
        spacing = jnp.minimum((s1 - s0) / (n_scan - 1), step_len)
        t = s0[..., None] + ks * spacing[..., None]
        pos = cam.eye_vol + dirs_c[..., None, :] * t[..., None]
        bx = jnp.clip((pos[..., 0] * X).astype(jnp.int32) // bv, 0, Bx - 1)
        by = jnp.clip((pos[..., 1] * Y).astype(jnp.int32) // bv, 0, By - 1)
        bz = jnp.clip((pos[..., 2] * Z).astype(jnp.int32) // bv, 0, Bz - 1)
        sv = field[(bz * By + by) * Bx + bx]
        inside = valid[..., None] & (t <= s1[..., None])
        tgt = (sv < 0.5) & inside
        surf = (sv < -0.5) & inside
        big = jnp.float32(_np.inf)
        first = jnp.min(jnp.where(tgt, t, big), axis=-1)
        last = jnp.max(jnp.where(surf, t, -big), axis=-1)
        return first.sum() + last.sum()

    bench("scan only (parallel, half-block)", jax.jit(scan_only),
          baked[1], baked[2], cam0)

    def raygen_only(cam):
        return ray_dirs(cam, Hp, Wp).sum()

    bench("ray_dirs full-res", jax.jit(raygen_only), cam0)

    # fused side
    t_fuse, _ = bench("fuse (preprocess+integrate)",
                      lambda f: pipe.fuse(f)[0], frames)
    maps2, counts2 = pipe.preprocess(frames)
    sync(maps2.quality)
    t_int, _ = bench("integrate solo", pipe.integrate, maps2, counts2)
    t_pre, _ = bench("preprocess solo", lambda f: pipe.preprocess(f)[0],
                     frames)

    out = jax.jit(
        lambda v, m, c_, cal, cm, l: render_fn(
            v, m, c_, cal, cm, pipe._get_projection_models(), l))(
        volume, maps, counts, pipe.calib, cam0, limit)
    print(f"hits {int(np.asarray(out.hit).sum())} "
          f"overflow {np.asarray(out.overflow)}", file=sys.stderr)
    print(f"summary: bake {t_bake:.1f}  from_baked {t_fb:.1f}  "
          f"full {t_full:.1f}  fuse {t_fuse:.1f}", file=sys.stderr)


if __name__ == "__main__":
    main()
