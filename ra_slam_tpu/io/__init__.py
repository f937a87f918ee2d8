from ra_slam_tpu.io.dataset import Frame, RGBDDataset
from ra_slam_tpu.io.folder import (
    FolderReader,
    load_trajectory,
    save_trajectory,
    write_folder_dataset,
)
from ra_slam_tpu.io.sens import SensReader, write_sens
from ra_slam_tpu.io.synthetic import (
    SyntheticBoxDataset,
    SyntheticCameraSpec,
    look_at,
    render_box_room,
)

__all__ = [
    "Frame",
    "RGBDDataset",
    "FolderReader",
    "SensReader",
    "SyntheticBoxDataset",
    "SyntheticCameraSpec",
    "load_trajectory",
    "look_at",
    "render_box_room",
    "save_trajectory",
    "write_folder_dataset",
    "write_sens",
]
