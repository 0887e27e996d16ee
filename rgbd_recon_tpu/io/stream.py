""".stream file replay — deterministic offline frame source.

Replicates the reference's recording replay (NetKinectArray::readFromFiles,
framework/NetKinectArray.cpp:724-764 + framework/io/FileBuffer.cpp): one
headerless file per sensor, each frame = [color bytes][depth bytes] with
sizes fixed by the calibration (m_colorsize = Wc*Hc*3 for raw RGB24,
m_depthsize = W*H*4 float32), read in a loop (FileBuffer read wraps at EOF,
FileBuffer.cpp:108-128).

The native C++ reader (io/native.py, native/framering.cpp) provides the same
interface off the GIL; this module is the pure-Python reference
implementation and the format definition.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np


def frame_wire_size(depth_size: Tuple[int, int], color_size: Tuple[int, int]) -> Tuple[int, int]:
    """(color_bytes, depth_bytes) per frame per sensor, raw-RGB24 +
    float32-depth mode (NetKinectArray.cpp:120-144)."""
    dw, dh = depth_size
    cw, ch = color_size
    return cw * ch * 3, dw * dh * 4


class StreamReader:
    """Looping per-sensor stream file reader."""

    def __init__(self, path, depth_size: Tuple[int, int], color_size: Tuple[int, int],
                 loop: bool = True):
        self.path = Path(path)
        self.depth_size = depth_size    # (W, H)
        self.color_size = color_size
        self.color_bytes, self.depth_bytes = frame_wire_size(depth_size, color_size)
        self.frame_bytes = self.color_bytes + self.depth_bytes
        self._data = self.path.read_bytes()
        if len(self._data) < self.frame_bytes:
            raise ValueError(
                f"{path}: {len(self._data)} bytes < one frame ({self.frame_bytes})"
            )
        self.num_frames = len(self._data) // self.frame_bytes
        self.loop = loop
        self._pos = 0

    def read_frame(self) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (color (H, W, 3) float32 [0,1], depth (H, W) float32 m)."""
        if self._pos >= self.num_frames:
            if not self.loop:
                raise EOFError(self.path)
            self._pos = 0
        off = self._pos * self.frame_bytes
        self._pos += 1
        cw, ch = self.color_size
        dw, dh = self.depth_size
        color = np.frombuffer(
            self._data, np.uint8, count=self.color_bytes, offset=off
        ).reshape(ch, cw, 3).astype(np.float32) / 255.0
        depth = np.frombuffer(
            self._data, "<f4", count=dw * dh, offset=off + self.color_bytes
        ).reshape(dh, dw).copy()
        return color, depth


class StreamWriter:
    """Writer producing reference-layout stream files (for recording
    synthetic or live sequences)."""

    def __init__(self, path):
        self._f = open(path, "wb")

    def write_frame(self, color: np.ndarray, depth: np.ndarray) -> None:
        c = np.clip(np.asarray(color) * 255.0, 0, 255).astype(np.uint8)
        self._f.write(c.tobytes())
        self._f.write(np.asarray(depth, "<f4").tobytes())

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
