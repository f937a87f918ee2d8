"""Live pipeline thread layout driven by fake cameras (no hardware)."""

import numpy as np

from ra_slam_tpu.core.config import (
    CameraConfig,
    FeatureConfig,
    SystemConfig,
    TrackingConfig,
    TsdfConfig,
)
from ra_slam_tpu.pipeline.live import run
from ra_slam_tpu.pipeline.system import RaSlamSystem

from test_stereo import _stereo_pair, BASELINE, FXB, SPEC


class FakeStereoCam:
    def __init__(self):
        self.i = 0

    def get_stereo_frame(self):
        eye = (0.3 - 0.01 * self.i, 0.005 * self.i, 0.01 * self.i)
        left, right, _, _ = _stereo_pair(eye)
        ts = self.i / 30.0
        self.i += 1
        return left, right, ts


class FakeRGBDCam:
    def __init__(self):
        self.i = 0

    def get_rgbd_frame(self):
        eye = (0.3 - 0.01 * self.i, 0.005 * self.i, 0.01 * self.i)
        rgb, _, depth, _ = _stereo_pair(eye)[0], None, _stereo_pair(eye)[2], None
        ts = self.i / 30.0 + 0.004  # slightly offset clock, like a real rig
        self.i += 1
        return rgb, depth, ts


def test_live_run_threads(tmp_path):
    cfg = SystemConfig(
        camera=CameraConfig(
            fx=SPEC.fx, fy=SPEC.fy, cx=SPEC.cx, cy=SPEC.cy,
            width=SPEC.width, height=SPEC.height,
            focal_x_baseline=FXB,
        ),
        tsdf=TsdfConfig(
            voxel_size=0.05, truncation=0.3, max_depth=6.0,
            log2_num_blocks=12, log2_hash_size=14,
            max_visible_blocks=1024,
            width=SPEC.width, height=SPEC.height,
            raycast_min_weight=1.0,
        ),
        feature=FeatureConfig(max_num_keypoints=300, num_levels=3),
        tracking=TrackingConfig(min_inliers=10, match_radius=30.0),
    )
    system = RaSlamSystem(cfg, segmentation_model=None)

    n_previews = run(
        system, FakeStereoCam(), FakeRGBDCam(),
        out_dir=str(tmp_path), render_every_s=1.5, stop_after_s=12.0,
    )
    # both loops made progress: poses registered and frames fused
    assert len(system.slam.pose_buffer) > 0
    assert system.num_integrated > 0
    assert n_previews >= 1
    import os

    assert any(f.startswith("live_") for f in os.listdir(tmp_path))
