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
import pytest


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
    """Depth camera fake; waits for the first tracked pose so the
    mapper thread overlaps tracking (a real rig runs for minutes — the
    pre-initialization frames it drops are not what this test is
    about)."""

    def __init__(self, system=None):
        self.i = 0
        self.system = system

    def get_rgbd_frame(self):
        if self.system is not None and self.i == 0:
            import time

            t0 = time.monotonic()
            while (
                len(self.system.slam.pose_buffer) == 0
                and time.monotonic() - t0 < 120.0
            ):
                time.sleep(0.05)
        eye = (0.3 - 0.01 * self.i, 0.005 * self.i, 0.01 * self.i)
        rgb, _, depth, _ = _stereo_pair(eye)[0], None, _stereo_pair(eye)[2], None
        ts = self.i / 30.0 + 0.004  # slightly offset clock, like a real rig
        self.i += 1
        return rgb, depth, ts


@pytest.mark.slow
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

    # frame-count stop condition (not wall-clock: load-insensitive), and
    # non-daemon threads joined before return — no mid-dispatch teardown
    n_previews, n_slam, n_tsdf = run(
        system, FakeStereoCam(), FakeRGBDCam(system),
        out_dir=str(tmp_path), render_every_s=1.0, stop_after_frames=8,
    )
    # both loops made progress: poses registered and frames fused
    assert n_slam >= 8 and n_tsdf >= 8
    assert len(system.slam.pose_buffer) > 0
    assert system.num_integrated > 0
    import os

    assert n_previews >= 1
    assert any(f.startswith("live_") for f in os.listdir(tmp_path))
