from .render import (
    save_image,
    colorize_depth,
    colorize_normals,
    sensor_map_gallery,
    tsdf_slice_image,
)

__all__ = [
    "save_image",
    "colorize_depth",
    "colorize_normals",
    "sensor_map_gallery",
    "tsdf_slice_image",
]
