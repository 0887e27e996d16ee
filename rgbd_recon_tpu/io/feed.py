"""Host -> device frame feed: the double-PBO equivalent.

The reference overlaps network receive with GPU upload via a mutex-guarded
double pixel buffer (framework/double_pixel_buffer.cpp + NetKinectArray
update, SURVEY.md §2.10). The TPU equivalent: a background thread pulls
frames from any source into a latest-frame slot; the training/render loop
calls `get()` which device_puts the newest frame while the previous step's
device work is still in flight (JAX async dispatch gives the overlap; the
drop-to-latest slot gives the HWM=1 backpressure).
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Optional

import numpy as np


class FrameFeed:
    """Drop-to-latest frame pump feeding device buffers."""

    def __init__(self, source: Callable[[], Optional[tuple]], poll_s: float = 0.001):
        """source() returns (timestamp, colors, depths) or None."""
        self._source = source
        self._lock = threading.Lock()
        self._latest = None
        self._seq = 0
        self._consumed = 0
        self._running = True
        self._poll_s = poll_s
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while self._running:
            item = self._source()
            if item is None:
                time.sleep(self._poll_s)
                continue
            with self._lock:
                self._latest = item
                self._seq += 1

    def get(self, block: bool = True, timeout: float = 5.0):
        """Newest unseen frame as a device-resident FrameSet, or None.

        Drops intermediate frames (only the latest is kept), exactly like
        the reference's HWM=1 subscription."""
        import jax.numpy as jnp

        from ..sensors.frames import FrameSet

        deadline = time.monotonic() + timeout
        while True:
            with self._lock:
                if self._seq > self._consumed:
                    self._consumed = self._seq
                    ts, colors, depths = self._latest
                    break
                item = None
            if not block or time.monotonic() > deadline:
                return None
            time.sleep(self._poll_s)
        return FrameSet(
            colors=jnp.asarray(np.asarray(colors, np.float32)),
            depths=jnp.asarray(np.asarray(depths, np.float32)),
            timestamp=jnp.asarray(np.float32(ts)),
        )

    @property
    def frames_produced(self) -> int:
        return self._seq

    def close(self):
        self._running = False
        self._thread.join(timeout=2.0)
