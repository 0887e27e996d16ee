"""The flagship reconstruction pipeline: preprocess -> integrate -> raymarch.

Equivalent of the reference's mode-1 path (ReconIntegration,
framework/reconstruction/recon_integration.cpp) plus the per-frame driver
logic of kinect_client.cpp:583-716 (draw3d), as one functional, jittable
step:

  frames --preprocess (5-pass chain)--> sensor maps
         --brick marking (scatter-add)--> occupancy mask
         --TSDF integration (masked dense)--> volume
         --raymarch + blend + shade--> image
         --pull-push colorfill--> final frame

Everything below `step()` is pure: state (the TSDF volume) flows in and out
explicitly, so the same step works single-chip, vmapped, or sharded by
dist/ over a device mesh.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..calib.sensors import CalibrationSet
from ..core.config import PipelineConfig
from ..core.grid import BoundingBox, BrickGrid, VolumeGrid
from ..ops import bricks as brick_ops
from ..ops import holefill, raymarch, tsdf
from ..ops.preprocess import SensorMaps, preprocess_frames
from ..ops.sampling import trilinear_3d
from ..sensors.frames import FrameSet


@struct.dataclass
class RenderOutput:
    """Final render + debug maps (the reference's screen + texture viewer)."""

    color: jnp.ndarray        # (H, W, 3) final shaded image
    depth: jnp.ndarray        # (H, W) window depth [0,1]
    hit: jnp.ndarray          # (H, W) bool surface mask
    num_samples: jnp.ndarray  # (H, W) raymarch step counts (stats image)


class TsdfPipeline:
    """Builds and owns the jitted step functions for one scene setup.

    The constructor captures everything *static* (grids, resolutions,
    config) in Python; all device arrays — the calibration set and the
    precomputed projections — flow through the jitted functions as explicit
    pytree ARGUMENTS, never as closure captures. Closure-captured arrays are
    baked into the lowered module as constants; at reference scale
    (cv_xyz_inv alone is ~280 MB for 4 sensors) that makes the program
    unserializable and wastes HBM. Public methods supply the pipeline's own
    arrays, so callers keep the simple `fuse(frames)` surface.
    """

    def __init__(
        self,
        calib: CalibrationSet,
        config: PipelineConfig = None,
        bbox: BoundingBox = None,
    ):
        self.config = config or PipelineConfig()
        self.bbox = bbox or calib.bbox
        self.calib = calib
        self.volume_grid = VolumeGrid(bbox=self.bbox, voxel_size=self.config.voxel_size)
        self.brick_grid = BrickGrid(
            bbox=self.bbox,
            brick_size=self.config.brick_size,
            min_voxels=self.config.min_voxels_per_brick,
        )
        # Brick-compact integration (ops/tsdf.py, integrate_bricks) needs the
        # brick edge to be an integer number of voxels — true for the
        # reference defaults (10 cm bricks / 1 cm voxels).
        ratio = self.config.brick_size / self.config.voxel_size
        self.brick_vox = int(round(ratio))
        self.compact = (
            self.config.bricking
            and abs(ratio - self.brick_vox) < 1e-6
            and self.brick_vox >= 1
            and tsdf.brick_layout(self.volume_grid.shape, self.brick_vox)[0]
            == self.brick_grid.shape
        )

        # frame-invariant per-voxel projections (ops/tsdf.py): one gather at
        # setup instead of one per frame
        if self.compact:
            self.projections = tsdf.bake_projections_bricks(
                self.calib.cv_xyz_inv, self.volume_grid.shape, self.brick_vox
            )
        elif self.config.precompute_projections:
            self.projections = tsdf.bake_projections(
                self.calib.cv_xyz_inv, self.volume_grid.shape
            )
        else:
            self.projections = None
        self._preprocess = jax.jit(self._preprocess_impl)
        self._integrate = jax.jit(self._integrate_impl)
        self._fuse = jax.jit(self._fuse_impl)
        self._pixel_models_cache = {}

    def _get_pixel_models(self, depth_hw):
        """Per-pixel calibration closed forms for this depth resolution
        (calib.sensors.PixelModels), derived once and cached. Returns None
        when disabled or when the fit residual exceeds ~1 depth pixel."""
        if not self.config.pixel_ray_model:
            return None
        key = tuple(depth_hw)
        if key not in self._pixel_models_cache:
            from ..calib.sensors import derive_pixel_models

            models, residual = derive_pixel_models(
                self.calib.cv_xyz, self.calib.cv_uv, key
            )
            # residual is in normalized (u,v,d)/world units; ~2e-3 is about
            # one pixel at reference sensor resolution
            if residual > 2e-3:
                print(
                    f"pixel-ray model residual {residual:.2e} too large; "
                    "falling back to calibration-volume lookups"
                )
                models = None
            self._pixel_models_cache[key] = models
        return self._pixel_models_cache[key]

    # -- stages (pure over their array arguments) ---------------------------

    def _preprocess_impl(
        self, calib: CalibrationSet, pixel_models, frames: FrameSet
    ) -> Tuple[SensorMaps, jnp.ndarray]:
        c = self.config
        maps = preprocess_frames(
            frames.depths,
            frames.colors,
            calib.cv_xyz,
            calib.cv_uv,
            calib.bbox_min,
            calib.bbox_max,
            calib.depth_limits,
            calib.camera_positions,
            morph=c.morph,
            bilateral=c.bilateral and c.processed,
            refine=c.refine,
            pixel_models=pixel_models,
        )
        counts = self._mark_bricks(calib, pixel_models, maps)
        return maps, counts

    def _mark_bricks(
        self, calib: CalibrationSet, pixel_models, maps: SensorMaps
    ) -> jnp.ndarray:
        """Brick occupancy from valid depth pixels (the pre_normal.fs side
        effect, glsl/pre_normal.fs:32-34 + inc_bricks.glsl:40-58)."""
        N, H, W = maps.depth.shape[:3]
        d_all = maps.depth[..., 0]
        valids = (d_all > 0.0) & (d_all < 1.0)
        if pixel_models is not None:
            worlds = pixel_models.world(d_all)
        else:
            u = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
            v = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
            uu, vv = jnp.meshgrid(u, v)

            def world_of(cv_xyz_i, d):
                return trilinear_3d(cv_xyz_i, jnp.stack([uu, vv, d], axis=-1))

            worlds = jax.vmap(world_of)(calib.cv_xyz, d_all)
        return brick_ops.mark_bricks(
            worlds,
            valids,
            calib.bbox_min,
            self.config.brick_size,
            self.brick_grid.res,
        )

    def _voxel_mask(self, brick_counts: jnp.ndarray):
        c = self.config
        if not c.bricking:
            return None
        occ = brick_ops.occupied_mask(brick_counts, c.min_voxels_per_brick)
        return brick_ops.expand_mask_to_voxel_grid(
            occ,
            self.volume_grid.shape,
            tuple(float(s) for s in self.bbox.size),
            c.brick_size,
        )

    def _integrate_impl(
        self,
        calib: CalibrationSet,
        projections,
        maps: SensorMaps,
        brick_counts: jnp.ndarray,
    ) -> jnp.ndarray:
        c = self.config
        if self.compact:
            ids = tsdf.occupied_brick_ids(
                brick_counts, c.min_voxels_per_brick, c.brick_capacity
            )
            return tsdf.integrate_bricks(
                projections,
                ids,
                maps.depth[..., 0],
                maps.quality,
                maps.silhouette,
                c.tsdf_limit,
                self.volume_grid.shape,
                self.brick_vox,
                carve_sil_threshold=c.carve_sil_threshold,
                phantom_hull=c.phantom_hull,
            )
        return tsdf.integrate(
            self.volume_grid.shape,
            calib.cv_xyz_inv,
            maps.depth[..., 0],
            maps.quality,
            maps.silhouette,
            c.tsdf_limit,
            voxel_mask=self._voxel_mask(brick_counts),
            projections=projections,
            carve_sil_threshold=c.carve_sil_threshold,
            phantom_hull=c.phantom_hull,
        )

    def _fuse_impl(
        self, calib: CalibrationSet, projections, pixel_models,
        frames: FrameSet
    ) -> Tuple[jnp.ndarray, SensorMaps, jnp.ndarray]:
        maps, counts = self._preprocess_impl(calib, pixel_models, frames)
        volume = self._integrate_impl(calib, projections, maps, counts)
        return volume, maps, counts

    # -- public API --------------------------------------------------------

    def preprocess(self, frames: FrameSet):
        pm = self._get_pixel_models(frames.depths.shape[1:3])
        return self._preprocess(self.calib, pm, frames)

    def integrate(self, maps: SensorMaps, brick_counts: jnp.ndarray) -> jnp.ndarray:
        return self._integrate(self.calib, self.projections, maps, brick_counts)

    def fuse(self, frames: FrameSet):
        """One fused frame update: preprocess + mark + integrate.

        Dispatched as the two stage programs rather than one monolithic jit:
        XLA's fusion search on the combined stencil-chain + volume-integrate
        program takes ~10x longer to compile for no measured runtime win
        (intermediates stay on device either way). `fuse_single_program()`
        exposes the monolith for callers that want one dispatch.
        """
        pm = self._get_pixel_models(frames.depths.shape[1:3])
        maps, counts = self._preprocess(self.calib, pm, frames)
        volume = self._integrate(self.calib, self.projections, maps, counts)
        return volume, maps, counts

    def fuse_single_program(self, frames: FrameSet):
        """The whole frame update as ONE jitted XLA program."""
        pm = self._get_pixel_models(frames.depths.shape[1:3])
        return self._fuse(self.calib, self.projections, pm, frames)

    def make_render_fn(
        self,
        camera: raymarch.ViewCamera,
        max_steps: Optional[int] = None,
    ):
        """Build the raw render function + its ray grid.

        Returns ``(render, dirs_vol)`` where
        ``render(volume, maps, brick_counts, calib, dirs_vol)`` is pure and
        unjitted — the form the dist/ layer traces inside its own sharded
        step (all large arrays are arguments, nothing big is captured).
        """
        c = self.config
        bbox_size = np.asarray(self.bbox.size, np.float32)
        eye_vol = jnp.asarray(
            self.bbox.normalize(np.asarray(camera.eye, np.float32))
        )
        dirs_world = camera.ray_directions_world()
        dirs_vol_host = jnp.asarray(dirs_world / bbox_size)

        if max_steps is None:
            # worst case: volume diagonal at limit/2 normalized steps
            max_steps = int(np.ceil(np.sqrt(3.0) / (c.tsdf_limit * 0.5)))
        num_lods = c.num_lods

        rot = jnp.asarray(camera.rotation())
        eye_w = jnp.asarray(np.asarray(camera.eye, np.float32))
        bbox_sz = jnp.asarray(bbox_size)

        def render(volume, maps: SensorMaps, brick_counts, calib, dirs_vol):
            bbox_min = calib.bbox_min
            H, W = dirs_vol.shape[:2]
            start_end = None
            if c.skip_space and brick_counts is not None and c.bricking:
                occ = brick_ops.occupied_mask(brick_counts, c.min_voxels_per_brick)
                start_end = raymarch_brick_interval(
                    occ, eye_vol, dirs_vol, self.brick_grid.res,
                    downsample=c.interval_downsample,
                )

            # ray compaction: only pixels whose brick interval is nonempty
            # march and shade (typically 20-40% of the screen); results
            # scatter back into the full image before colorfill. Fixed
            # capacity keeps shapes static for jit.
            compact_rays = (
                c.ray_compaction > 0.0 and start_end is not None
            )
            if compact_rays:
                M = H * W
                cap = -(-int(M * c.ray_compaction) // 128) * 128
                pos0_f = start_end[0].reshape(M, 3)
                len_f = start_end[1].reshape(M)
                dirs_f = dirs_vol.reshape(M, 3)
                (ray_idx,) = jnp.nonzero(len_f > 0.0, size=cap, fill_value=M)
                safe = jnp.minimum(ray_idx, M - 1)
                dirs_b = dirs_f[safe]
                se_b = (pos0_f[safe],
                        jnp.where(ray_idx < M, len_f[safe], 0.0))
            else:
                dirs_b = dirs_vol
                se_b = start_end

            two_phase = compact_rays and c.march_phase1_steps > 0
            if two_phase:
                # phase 1: every compacted ray marches a few steps (most
                # surface hits land within ~20 steps of the brick-interval
                # start); phase 2 re-compacts the few long-interval rays
                # (grazing/limb) to 1/4 width so the while_loop's uniform
                # iteration count stops taxing the whole wavefront
                sd = c.tsdf_limit * 0.5
                # the brick interval starts up to pad_t coarse half-brick
                # steps before the hull (conservative padding, see
                # raymarch_brick_interval); phase 1 must cover that lead-in
                # plus the configured surface-search budget
                step_len = 0.5 / max(self.brick_grid.res)
                pad_t = 3.0 if c.interval_downsample > 1 else 2.0
                p1 = c.march_phase1_steps + int(np.ceil(pad_t * step_len / sd))
                hit, hit_pos, num, prev = raymarch.march(
                    volume, eye_vol, dirs_b, c.tsdf_limit, p1, se_b,
                    mode=c.march_mode, return_prev=True,
                )
                pos0_b, len_b = se_b
                max_num = jnp.ceil(len_b / sd).astype(jnp.int32)
                unfinished = (~hit) & (max_num > p1)
                cap2 = max(cap // 4, 128)
                C1 = dirs_b.shape[0]
                (idx2,) = jnp.nonzero(unfinished, size=cap2, fill_value=C1)
                safe2 = jnp.minimum(idx2, C1 - 1)
                dn_b = dirs_b / jnp.linalg.norm(
                    dirs_b, axis=-1, keepdims=True
                )
                pos2 = (pos0_b + dn_b * (sd * p1))[safe2]
                len2 = jnp.where(
                    idx2 < C1, jnp.maximum(len_b[safe2] - sd * p1, 0.0), 0.0
                )
                hit2, hit_pos2, num2 = raymarch.march(
                    volume, eye_vol, dirs_b[safe2], c.tsdf_limit,
                    max_steps - p1, (pos2, len2), mode=c.march_mode,
                    prev0=prev[safe2],
                )
                hit = hit.at[idx2].set(hit2, mode="drop")
                hit_pos = hit_pos.at[idx2].set(hit_pos2, mode="drop")
                num = num.at[idx2].add(num2, mode="drop")
            else:
                hit, hit_pos, num = raymarch.march(
                    volume, eye_vol, dirs_b, c.tsdf_limit, max_steps, se_b,
                    mode=c.march_mode,
                )

            # normals: volume-space gradient -> world via inverse-transpose
            # of the (diagonal) vol_to_world scale (recon_integration.cpp:200)
            grad = raymarch.gradient_normal(
                volume, hit_pos, c.tsdf_limit, mode=c.march_mode
            )
            n_world = grad / bbox_sz
            n_world = n_world / jnp.maximum(
                jnp.linalg.norm(n_world, axis=-1, keepdims=True), 1e-20
            )

            world_pos = hit_pos * bbox_sz + bbox_min
            view_pos = (world_pos - eye_w) @ rot
            view_normal = n_world @ rot

            if c.shade_mode == 3:
                rgb = raymarch.blend_cameras(
                    hit_pos,
                    calib.cv_xyz_inv,
                    maps.depth[..., 0],
                    maps.quality,
                    c.tsdf_limit,
                )
                rgba = jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1)
            else:
                blend = (
                    raymarch.blend_colors_fast
                    if c.march_mode == "nearest"
                    else raymarch.blend_colors
                )
                rgba = blend(
                    hit_pos,
                    calib.cv_xyz_inv,
                    calib.cv_uv,
                    maps.color,
                    maps.depth[..., 0],
                    maps.quality,
                    c.tsdf_limit,
                )
                shaded = raymarch.shade(
                    view_pos,
                    view_normal,
                    rgba[..., :3],
                    shade_mode=c.shade_mode,
                    world_normal=n_world,
                )
                rgba = jnp.concatenate([shaded, rgba[..., 3:]], axis=-1)

            depth_win = camera.window_depth(-view_pos[..., 2])
            depth_win = jnp.where(hit, depth_win, 1.0)
            rgba = jnp.where(hit[..., None], rgba, 0.0)

            if compact_rays:
                # scatter compacted results back to the full image
                rgba = (
                    jnp.zeros((M, 4), jnp.float32)
                    .at[ray_idx].set(rgba, mode="drop")
                    .reshape(H, W, 4)
                )
                depth_win = (
                    jnp.ones((M,), jnp.float32)
                    .at[ray_idx].set(depth_win, mode="drop")
                    .reshape(H, W)
                )
                hit = (
                    jnp.zeros((M,), bool)
                    .at[ray_idx].set(hit, mode="drop")
                    .reshape(H, W)
                )
                num = (
                    jnp.zeros((M,), jnp.int32)
                    .at[ray_idx].set(num, mode="drop")
                    .reshape(H, W)
                )

            if c.colorfill:
                filled, depth_out = holefill.fill_colors(rgba, depth_win, num_lods)
                color = filled[..., :3]
            else:
                color = rgba[..., :3]
                depth_out = depth_win

            # background compositing: the reference relies on the colorfill
            # pass writing gl_FragDepth = 1.0 for empty pixels, which fails
            # the GL_LESS depth test against the cleared buffer
            # (tsdf_inpaint.fs:35, view clear) — equivalent dense mask here.
            shown = depth_out < 1.0
            color = jnp.where(shown[..., None], color, 0.0)

            return RenderOutput(
                color=color, depth=depth_out, hit=hit, num_samples=num
            )

        return render, dirs_vol_host

    def make_renderer(
        self,
        camera: raymarch.ViewCamera,
        max_steps: Optional[int] = None,
        jit_compile: bool = True,
    ):
        """Returns render(volume, maps, brick_counts) -> RenderOutput for a
        fixed virtual camera (rays are static w.r.t. the camera), jitted by
        default. The camera's ray grid and the calibration set are threaded
        through the jitted function as arguments (see class docstring)."""
        render, dirs_vol = self.make_render_fn(camera, max_steps)
        inner = jax.jit(render) if jit_compile else render

        def renderer(volume, maps: SensorMaps, brick_counts=None):
            return inner(volume, maps, brick_counts, self.calib, dirs_vol)

        return renderer


def raymarch_brick_interval(
    occupied: jnp.ndarray,     # (Bz, By, Bx) bool
    cam_pos_vol: jnp.ndarray,  # (3,)
    ray_dirs_vol: jnp.ndarray,  # (H, W, 3)
    brick_res: tuple,
    downsample: int = 1,
):
    """TPU-native space skipping: per-pixel [start, end] marching interval
    from the occupied-brick mask.

    Replaces the reference's rasterized brick-hull depth peel
    (drawDepthLimits, recon_integration.cpp:409-429 + glsl/bricks.{vs,gs,fs}
    MIN-blending) with a coarse masked march over the brick grid: sample the
    occupancy mask at ~half-brick steps along each ray; the first and last
    occupied samples bound the fine march.

    Occupancy is nearest-sampled (exact brick membership, one gather row per
    ray-step — trilinear would cost 8x here for a slightly dilated hull that
    the ±1-brick interval padding below already provides).

    ``downsample`` > 1 marches the coarse scan on a strided ray grid and
    broadcasts conservative (3x3 min/max-pooled, extra-padded) intervals to
    the full grid — a 16x cheaper pass for a slightly wider fine-march
    interval. Intervals vary smoothly across neighboring rays (the brick
    hull is watertight at brick scale), so pooling over the adjacent coarse
    rays brackets every fine ray.
    """
    mask_flat = occupied.astype(jnp.float32).reshape(-1)
    Bz, By, Bx = occupied.shape
    full_dirs = ray_dirs_vol
    if downsample > 1:
        ray_dirs_vol = ray_dirs_vol[::downsample, ::downsample]
    dn = ray_dirs_vol / jnp.linalg.norm(ray_dirs_vol, axis=-1, keepdims=True)

    # coarse step: half of the smallest normalized brick extent
    step_len = 0.5 / max(brick_res)
    step_vec = dn * step_len

    t0, t1 = _box01(cam_pos_vol, step_vec)
    valid_box = t0 <= t1
    t_near = jnp.maximum(jnp.where(valid_box, t0, 0.0), 0.0)
    t_far = jnp.where(valid_box, t1, 0.0)
    n_steps = int(np.ceil(np.sqrt(3.0) / step_len)) + 2

    batch = ray_dirs_vol.shape[:-1]
    big = jnp.full(batch, np.inf, jnp.float32)
    init = (big, jnp.full(batch, -np.inf, jnp.float32))

    def body(carry, k):
        first, last = carry
        t = t_near + k.astype(jnp.float32)
        inside = (t <= t_far) & valid_box
        pos = cam_pos_vol + step_vec * t[..., None]
        # nearest-brick occupancy (floor indexing like get_id/index_3d)
        xi = jnp.clip((pos[..., 0] * Bx).astype(jnp.int32), 0, Bx - 1)
        yi = jnp.clip((pos[..., 1] * By).astype(jnp.int32), 0, By - 1)
        zi = jnp.clip((pos[..., 2] * Bz).astype(jnp.int32), 0, Bz - 1)
        occ = mask_flat[(zi * By + yi) * Bx + xi] > 0.0
        occ = occ & inside
        first = jnp.where(occ & (t < first), t, first)
        last = jnp.where(occ & (t > last), t, last)
        return (first, last), None

    (first, last), _ = jax.lax.scan(body, init, jnp.arange(n_steps, dtype=jnp.int32))

    # pad one brick (2 half-brick steps) each side so boundary surfaces
    # are not clipped by the coarse sampling
    pad = 2.0

    if downsample > 1:
        # conservative 3x3 min/max pooling over the coarse grid, then
        # broadcast to the full grid; one extra pad step absorbs the
        # sub-block direction variation
        def pool(x, op):
            p = jnp.pad(x, 1, mode="edge")
            out = x
            for dy in (0, 1, 2):
                for dx in (0, 1, 2):
                    out = op(out, p[dy : dy + x.shape[0], dx : dx + x.shape[1]])
            return out

        first = pool(first, jnp.minimum)
        last = pool(last, jnp.maximum)
        H, W = full_dirs.shape[:2]
        s = downsample

        def up(x):
            x = jnp.repeat(jnp.repeat(x, s, axis=0), s, axis=1)
            x = jnp.pad(
                x,
                ((0, max(0, H - x.shape[0])), (0, max(0, W - x.shape[1]))),
                mode="edge",
            )
            return x[:H, :W]

        first = up(first)
        last = up(last)
        t_near = up(t_near)
        t_far = up(t_far)
        pad = pad + 1.0
        dn_full = full_dirs / jnp.linalg.norm(
            full_dirs, axis=-1, keepdims=True
        )
        step_vec = dn_full * step_len

    found = jnp.isfinite(first) & jnp.isfinite(last)
    t_start = jnp.where(found, jnp.maximum(first - pad, t_near), 0.0)
    t_end = jnp.where(found, jnp.minimum(last + pad, t_far), 0.0)
    start_pos = cam_pos_vol + step_vec * t_start[..., None]
    ray_len = jnp.maximum(t_end - t_start, 0.0) * step_len
    return start_pos, ray_len


def _box01(origin, direction):
    inv = 1.0 / direction
    tbot = inv * (0.0 - origin)
    ttop = inv * (1.0 - origin)
    tmin = jnp.minimum(ttop, tbot)
    tmax = jnp.maximum(ttop, tbot)
    return jnp.max(tmin, axis=-1), jnp.min(tmax, axis=-1)
