from ra_slam_tpu.features.pyramid import build_pyramid, gaussian_blur
from ra_slam_tpu.features.fast import fast_corners, fast_score
from ra_slam_tpu.features.orb import (
    Keypoints,
    detect_and_describe,
    orb_descriptors,
    orientation,
)
from ra_slam_tpu.features.matching import (
    Matches,
    hamming_matrix,
    hamming_matrix_popcount,
    match_descriptors,
    mutual_match,
)

__all__ = [
    "build_pyramid",
    "gaussian_blur",
    "fast_corners",
    "fast_score",
    "Keypoints",
    "detect_and_describe",
    "orb_descriptors",
    "orientation",
    "Matches",
    "hamming_matrix",
    "hamming_matrix_popcount",
    "match_descriptors",
    "mutual_match",
]
