"""IO layer tests: stream files, native pump, feed, ZMQ wire format."""

import threading
import time

import numpy as np
import pytest

from rgbd_recon_tpu.io import (
    FeedbackState,
    FrameFeed,
    StreamReader,
    StreamWriter,
    frame_wire_size,
)


def _write_stream(path, n_frames, depth_size=(8, 6), color_size=(10, 8)):
    dw, dh = depth_size
    cw, ch = color_size
    rng = np.random.default_rng(0)
    frames = []
    with StreamWriter(path) as w:
        for i in range(n_frames):
            color = rng.uniform(size=(ch, cw, 3)).astype(np.float32)
            depth = np.full((dh, dw), 1.0 + i, np.float32)
            w.write_frame(color, depth)
            frames.append((color, depth))
    return frames


def test_stream_roundtrip(tmp_path):
    path = tmp_path / "s0.stream"
    frames = _write_stream(path, 3)
    r = StreamReader(path, depth_size=(8, 6), color_size=(10, 8))
    assert r.num_frames == 3
    for i in range(3):
        color, depth = r.read_frame()
        np.testing.assert_array_equal(depth, frames[i][1])
        np.testing.assert_allclose(color, frames[i][0], atol=1 / 255.0)
    # loops
    _, depth = r.read_frame()
    np.testing.assert_array_equal(depth, frames[0][1])


def test_stream_wire_size_matches_reference():
    # NetKinectArray.cpp:120-144 raw mode: color WxHx3 bytes, depth WxHx4
    cb, db = frame_wire_size((512, 424), (1280, 1080))
    assert cb == 1280 * 1080 * 3
    assert db == 512 * 424 * 4


def test_native_pump(tmp_path):
    native = pytest.importorskip("rgbd_recon_tpu.io.native")
    if not native.available():
        pytest.skip("native lib not built")
    path = tmp_path / "s1.stream"
    frames = _write_stream(path, 5)
    pump = native.NativeStreamPump(
        path, depth_size=(8, 6), color_size=(10, 8), fps=200.0
    )
    assert pump.num_frames == 5
    got = None
    deadline = time.time() + 5
    while got is None and time.time() < deadline:
        got = pump.latest()
    assert got is not None
    ts, color, depth = got
    # frame contents must be one of the written frames
    matches = [np.array_equal(depth, f[1]) for f in frames]
    assert any(matches)
    time.sleep(0.1)
    assert pump.frames_pumped > 2  # pump keeps running (looping)
    pump.close()


def test_frame_feed_drop_to_latest():
    produced = []
    lock = threading.Lock()
    counter = [0]

    def source():
        with lock:
            counter[0] += 1
            i = counter[0]
        if i > 50:
            time.sleep(0.01)
            return None
        return (float(i), np.zeros((1, 2, 2, 3), np.float32),
                np.full((1, 2, 2), float(i), np.float32))

    feed = FrameFeed(source)
    time.sleep(0.3)  # let the pump outrun the consumer
    fs = feed.get()
    assert fs is not None
    # consumer skipped ahead: the frame it sees is late in the sequence
    assert float(np.asarray(fs.depths)[0, 0, 0]) > 5.0
    feed.close()


def test_feedback_state_roundtrip():
    fb = FeedbackState(recon_mode=2, stream_slot=1)
    fb.model_mat = np.arange(16, dtype=np.float32).reshape(4, 4)
    data = fb.pack()
    fb2 = FeedbackState.unpack(data)
    assert fb2.recon_mode == 2
    assert fb2.stream_slot == 1
    np.testing.assert_array_equal(fb2.model_mat, fb.model_mat)


def test_zmq_source_end_to_end():
    """Publish one reference-format message over inproc-ish tcp and receive
    it through ZmqFrameSource."""
    zmq = pytest.importorskip("zmq")
    from rgbd_recon_tpu.io import ZmqFrameSource

    depth_size, color_size = (4, 3), (5, 4)
    cb, db = frame_wire_size(depth_size, color_size)
    ctx = zmq.Context.instance()
    pub = ctx.socket(zmq.PUB)
    port = pub.bind_to_random_port("tcp://127.0.0.1")

    src = ZmqFrameSource(
        f"tcp://127.0.0.1:{port}", num_sensors=2,
        depth_size=depth_size, color_size=color_size,
    )
    time.sleep(0.3)  # let SUB connect

    import struct

    colors = (np.arange(2 * cb) % 255).astype(np.uint8)
    depths = np.arange(2 * db // 4, dtype="<f4")
    msg = struct.pack("<d", 42.5)
    for i in range(2):
        msg += colors[i * cb:(i + 1) * cb].tobytes()
        msg += depths[i * (db // 4):(i + 1) * (db // 4)].tobytes()

    got = None
    deadline = time.time() + 5
    while got is None and time.time() < deadline:
        pub.send(msg)
        time.sleep(0.05)
        got = src.latest()
    src.close()
    pub.close(0)
    assert got is not None
    ts, c, d = got
    assert ts == 42.5
    assert c.shape == (2, 4, 5, 3)
    assert d.shape == (2, 3, 4)
    np.testing.assert_array_equal(
        d[0].ravel(), depths[: db // 4]
    )


def test_compressed_stream_roundtrip_through_pipeline(tmp_path):
    """Record DXT1 + u8-depth streams, read them back through the
    compression-aware StreamReader, and fuse the decoded frames — the wire
    format end-to-end (NetKinectArray.cpp:120-156, 511-542)."""
    import jax.numpy as jnp

    from rgbd_recon_tpu.calib import build_synthetic_calibration
    from rgbd_recon_tpu.core import BoundingBox, PipelineConfig
    from rgbd_recon_tpu.io.stream import (
        FrameCompression, StreamReader, StreamWriter, frame_wire_size,
    )
    from rgbd_recon_tpu.recon import TsdfPipeline
    from rgbd_recon_tpu.sensors import (
        SyntheticScene, default_test_rig, render_rig_frames,
    )
    from rgbd_recon_tpu.sensors.frames import FrameSet

    bbox = BoundingBox(min=(-1.0, 0.0, -1.0), max=(1.0, 2.2, 1.0))
    rig = default_test_rig(num_sensors=2, depth_size=(48, 40),
                           color_size=(64, 48), bbox=bbox)
    frames = render_rig_frames(
        SyntheticScene(spheres=[((0.0, 1.1, 0.0), 0.55)]), rig
    )
    comp = FrameCompression(rgb=1, depth_u8=True,
                            near=rig.sensors[0].depth.near,
                            far=rig.sensors[0].depth.far)

    paths = []
    for i in range(2):
        p = tmp_path / f"s{i}.stream"
        with StreamWriter(p, compression=comp) as w:
            for _ in range(2):
                w.write_frame(np.asarray(frames.colors[i]),
                              np.asarray(frames.depths[i]))
        paths.append(p)

    cb, db_ = frame_wire_size((48, 40), (64, 48), comp)
    assert paths[0].stat().st_size == 2 * (cb + db_)
    # DXT1 is 8 bytes / 4x4 block = 1/6 of raw RGB24
    assert cb == 64 * 48 // 16 * 8

    colors, depths = [], []
    for p in paths:
        r = StreamReader(p, depth_size=(48, 40), color_size=(64, 48),
                         compression=comp)
        c, d = r.read_frame()
        colors.append(c)
        depths.append(d)
    colors = np.stack(colors)
    depths = np.stack(depths)

    # decode quality: DXT1 block compression is lossy on the synthetic
    # noise texture — bound the bulk; u8 depth within the sqrt quantization
    # step; invalid (0) depths stay invalid
    cerr = np.abs(colors - np.asarray(frames.colors))
    assert cerr.mean() < 0.05, cerr.mean()
    assert np.quantile(cerr, 0.99) < 0.35
    valid = np.asarray(frames.depths) > 0.5
    err = np.abs(depths - np.asarray(frames.depths))[valid]
    assert err.max() < 0.05, err.max()
    assert (depths[~valid] == 0).all()

    calib = build_synthetic_calibration(rig, bbox, cv_res=(16, 24, 16),
                                        inv_res=(24, 28, 24))
    cfg = PipelineConfig(voxel_size=0.05, brick_size=0.25, tsdf_limit=0.02,
                         num_lods=4)
    pipe = TsdfPipeline(calib, cfg, bbox)
    fs = FrameSet(colors=jnp.asarray(colors), depths=jnp.asarray(depths),
                  timestamp=jnp.float32(0.0))
    volume, maps, counts = pipe.fuse(fs)
    assert int((np.asarray(counts) > cfg.min_voxels_per_brick).sum()) > 5
    assert np.isfinite(np.asarray(volume)).all()


def test_dxt5_roundtrip():
    from rgbd_recon_tpu.io.dxt import decode_dxt5, encode_dxt5_opaque

    x = np.linspace(0, 1, 20)
    y = np.linspace(0, 1, 16)
    xx, yy = np.meshgrid(x, y)
    img = (np.stack([xx, yy, xx * yy], axis=-1) * 255).astype(np.uint8)
    out = decode_dxt5(encode_dxt5_opaque(img), 20, 16)
    assert out.shape == (16, 20, 4)
    assert (out[..., 3] == 255).all()
    # smooth gradients survive block compression to a few quantization steps
    assert np.abs(out[..., :3].astype(int) - img.astype(int)).mean() < 8


def test_native_stream_reader_matches_python(tmp_path):
    """The GIL-free in-order native reader (the app's replay hot path)
    decodes byte-identically to the Python StreamReader."""
    native = pytest.importorskip("rgbd_recon_tpu.io.native")
    if not native.available():
        pytest.skip("native lib not built")
    from rgbd_recon_tpu.io.stream import StreamReader, StreamWriter

    rng = np.random.default_rng(7)
    path = tmp_path / "s.stream"
    w = StreamWriter(path)
    frames = []
    for _ in range(3):
        color = rng.random((12, 16, 3)).astype(np.float32)
        depth = (rng.random((8, 10)) * 4).astype(np.float32)
        w.write_frame(color, depth)
        frames.append((color, depth))
    w.close()

    py = StreamReader(path, depth_size=(10, 8), color_size=(16, 12))
    nat = native.NativeStreamReader(path, depth_size=(10, 8),
                                    color_size=(16, 12))
    assert nat.num_frames == 3
    for _ in range(5):  # loops past EOF in order, like FileBuffer
        cp, dp = py.read_frame()
        cn, dn = nat.read_frame()
        np.testing.assert_array_equal(cn, cp)
        np.testing.assert_array_equal(dn, dp)
    nat.close()


def test_native_stream_reader_compressed_matches_python(tmp_path):
    """Compressed (DXT1 color + u8 depth) streams replay through the
    native GIL-free ring with consumer-side decode, byte-identical to the
    Python reader (round 4 verdict: the DXT path — the reference's real
    wire format — must ride the native pump too)."""
    native = pytest.importorskip("rgbd_recon_tpu.io.native")
    if not native.available():
        pytest.skip("native lib not built")
    from rgbd_recon_tpu.io.stream import (
        FrameCompression, StreamReader, StreamWriter,
    )

    rng = np.random.default_rng(11)
    comp = FrameCompression(rgb=1, depth_u8=True, near=0.5, far=4.5)
    path = tmp_path / "c.stream"
    w = StreamWriter(path, compression=comp)
    for _ in range(3):
        color = rng.random((12, 16, 3)).astype(np.float32)
        depth = (0.5 + rng.random((8, 10)) * 3.5).astype(np.float32)
        w.write_frame(color, depth)
    w.close()

    py = StreamReader(path, depth_size=(10, 8), color_size=(16, 12),
                      compression=comp)
    nat = native.NativeStreamReader(path, depth_size=(10, 8),
                                    color_size=(16, 12), compression=comp)
    assert nat.num_frames == 3
    for _ in range(5):
        cp, dp = py.read_frame()
        cn, dn = nat.read_frame()
        np.testing.assert_array_equal(cn, cp)
        np.testing.assert_array_equal(dn, dp)
    nat.close()


def test_native_pump_compressed(tmp_path):
    """The background pump thread also carries compressed wire frames."""
    native = pytest.importorskip("rgbd_recon_tpu.io.native")
    if not native.available():
        pytest.skip("native lib not built")
    import time

    from rgbd_recon_tpu.io.stream import FrameCompression, StreamWriter

    rng = np.random.default_rng(13)
    comp = FrameCompression(rgb=5, depth_u8=False)
    path = tmp_path / "p.stream"
    w = StreamWriter(path, compression=comp)
    color = rng.random((12, 16, 3)).astype(np.float32)
    depth = (rng.random((8, 10)) * 4).astype(np.float32)
    w.write_frame(color, depth)
    w.close()

    pump = native.NativeStreamPump(
        path, depth_size=(10, 8), color_size=(16, 12), fps=120.0,
        compression=comp,
    )
    got = None
    for _ in range(100):
        got = pump.latest()
        if got is not None:
            break
        time.sleep(0.02)
    pump.close()
    assert got is not None
    _, c, d = got
    assert c.shape == (12, 16, 3) and d.shape == (8, 10)
    np.testing.assert_allclose(d, depth, atol=1e-6)
