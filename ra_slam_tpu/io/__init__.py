from ra_slam_tpu.io.dataset import Frame, RGBDDataset
from ra_slam_tpu.io.synthetic import (
    SyntheticBoxDataset,
    SyntheticCameraSpec,
    look_at,
    render_box_room,
)

__all__ = [
    "Frame",
    "RGBDDataset",
    "SyntheticBoxDataset",
    "SyntheticCameraSpec",
    "look_at",
    "render_box_room",
]
