from .stream import StreamReader, StreamWriter, frame_wire_size
from .feed import FrameFeed
from .network import ZmqFrameSource, FeedbackReceiver, FeedbackState

__all__ = [
    "StreamReader",
    "StreamWriter",
    "frame_wire_size",
    "FrameFeed",
    "ZmqFrameSource",
    "FeedbackReceiver",
    "FeedbackState",
]
