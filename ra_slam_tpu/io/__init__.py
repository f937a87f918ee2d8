from ra_slam_tpu.io.synthetic import SyntheticScene, synthetic_sequence
from ra_slam_tpu.io.dataset import Frame, RGBDDataset

__all__ = ["SyntheticScene", "synthetic_sequence", "Frame", "RGBDDataset"]
