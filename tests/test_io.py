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
