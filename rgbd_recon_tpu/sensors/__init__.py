from .synthetic import SyntheticScene, render_rig_frames, default_test_rig
from .frames import FrameSet

__all__ = ["SyntheticScene", "render_rig_frames", "default_test_rig", "FrameSet"]
