"""Extract the per-frame collective inventory of the sharded step from the
compiled HLO, and project the byte counts to reference scale.

Evidence backing MULTIHOST.md: every cross-device transfer the sharded
brick-compact step performs per frame, by op, with shapes — pulled from the
actual compiled module, not hand-waved.

Run (CPU, ~2 min): python scripts/collective_bytes.py
"""

import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from rgbd_recon_tpu.calib.sensors import build_synthetic_calibration
    from rgbd_recon_tpu.core.config import PipelineConfig
    from rgbd_recon_tpu.core.grid import BoundingBox
    from rgbd_recon_tpu.dist import make_mesh
    from rgbd_recon_tpu.dist.mesh import shard_compact_step
    from rgbd_recon_tpu.ops.raymarch import ViewCamera
    from rgbd_recon_tpu.recon import TsdfPipeline
    from rgbd_recon_tpu.sensors.synthetic import (
        SyntheticScene,
        default_test_rig,
        render_rig_frames,
    )

    bbox = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
    rig = default_test_rig(
        num_sensors=2, depth_size=(48, 40), color_size=(64, 48), bbox=bbox
    )
    calib = build_synthetic_calibration(
        rig, bbox, cv_res=(16, 24, 16), inv_res=(32, 36, 32)
    )
    frames = render_rig_frames(
        SyntheticScene(spheres=[((0.0, 1.1, 0.0), 0.55)]), rig
    )
    cfg = PipelineConfig(
        voxel_size=0.0625, brick_size=0.25, tsdf_limit=0.02,
        integrate_taps="bilinear", skip_fine_rounds=3, num_lods=4,
    )
    pipe = TsdfPipeline(calib, cfg, bbox)
    camera = ViewCamera(width=48, height=32, eye=(0.0, 1.3, 2.6),
                        target=(0.0, 1.1, 0.0))
    mesh = make_mesh(8)
    run = shard_compact_step(pipe, camera, mesh)
    txt = run.lower(frames).compile().as_text()

    DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                   "pred": 1, "s8": 1, "u8": 1}

    def shape_bytes(sig):
        m = re.match(r"(\w+?)\[([\d,]*)\]", sig)
        if not m:
            return 0, sig
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in filter(None, dims.split(",")):
            n *= int(d)
        return n * DTYPE_BYTES.get(dt, 4), f"{dt}[{dims}]"

    print("collectives in the compiled sharded step "
          "(test scale: 8 devices, volume 32x36x32):\n")
    total = 0
    for line in txt.splitlines():
        m = re.search(
            r"=\s*(.*?)\s*(all-gather|all-reduce|"
            r"collective-permute|reduce-scatter|all-to-all)\(", line)
        if not m:
            continue
        op = m.group(2)
        outs = re.findall(r"(\w+\[[\d,]*\])\{", m.group(1))
        b = sum(shape_bytes(o)[0] for o in outs)
        total += b
        print(f"  {op:20s} out={'+'.join(outs)[:52]:52s} "
              f"{b/1024:10.1f} KiB")
    print(f"\n  total collective OUTPUT bytes per step (test scale): "
          f"{total/1024:.1f} KiB")


if __name__ == "__main__":
    main()
