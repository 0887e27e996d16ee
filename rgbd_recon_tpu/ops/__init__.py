from .sampling import trilinear_3d, bilinear_2d, nearest_2d
from .color import rgb_to_lab

__all__ = ["trilinear_3d", "bilinear_2d", "nearest_2d", "rgb_to_lab"]
