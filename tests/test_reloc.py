"""Relocalization after tracking loss (kidnapped-camera test) and the
TSDF pause-on-lost policy — the reference consumes OpenVSLAM's
relocalizer via tracking-state feedback
(`/root/reference/modules/slam_module.cc:154-160`) and its README TODO
asks for pause-on-lost (`/root/reference/README.md:43`)."""

import numpy as np

from ra_slam_tpu.core.config import FeatureConfig, TrackingConfig
from ra_slam_tpu.core.se3 import SE3, log_se3
from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
from ra_slam_tpu.slam.system import SlamSystem

import jax.numpy as jnp
import pytest


def _make_system(ds):
    return SlamSystem(
        ds.camera,
        fcfg=FeatureConfig(max_num_keypoints=600, num_levels=4),
        tcfg=TrackingConfig(min_inliers=15, match_radius=30.0),
        ba_window=6,
        ba_max_points=2048,
        ba_iterations=5,
        reloc_min_inliers=20,
    )


@pytest.mark.slow
def test_kidnap_and_relocalize():
    spec = SyntheticCameraSpec(
        fx=160.0, fy=160.0, cx=159.5, cy=119.5, width=320, height=240
    )
    ds = SyntheticBoxDataset(num_frames=120, cam=spec, radius=1.0)
    sys = _make_system(ds)

    # phase 1: build a map over ~1/4 of the orbit (gauge anchored at GT
    # so recovered poses compare absolutely)
    n_map = 30
    for i in range(n_map):
        f = ds.frame(i)
        hint = SE3.from_matrix(jnp.asarray(f.cam_T_world)) if i == 0 else None
        info = sys.feed_rgbd_frame(
            f.rgb, f.depth, f.timestamp, frame_id=i, pose_hint=hint
        )
        assert info.tracked, f"tracking lost during mapping at {i}"
    assert int(sys.state.track.kf_counter) >= 3

    # phase 2: kidnap — black frames kill tracking
    black = np.zeros_like(ds.frame(0).rgb)
    depth0 = ds.frame(0).depth
    for j in range(3):
        info = sys.feed_rgbd_frame(
            black, depth0, (n_map + j) / ds.fps, frame_id=n_map + j
        )
        assert not info.tracked
    assert sys.lost

    # phase 3: drop the camera back at a previously-mapped view. The
    # stale constant-velocity prediction points ~50 degrees away, so
    # plain tracking cannot gate-match; only relocalization recovers.
    revisit = 10
    f = ds.frame(revisit)
    recovered = False
    for j in range(2):  # reloc may need the post-reloc track to settle
        info = sys.feed_rgbd_frame(
            f.rgb, f.depth, (n_map + 4 + j) / ds.fps, frame_id=n_map + 4 + j
        )
        if info.relocalized or info.tracked:
            recovered = True
            break
    assert recovered, "relocalization failed after kidnap"
    assert sys.num_relocalizations >= 1
    assert not sys.lost

    gt = SE3.from_matrix(jnp.asarray(f.cam_T_world))
    xi = log_se3(info.pose @ gt.inverse())
    assert float(jnp.linalg.norm(xi[3:])) < 0.10, "recovered pose off"
    assert float(jnp.linalg.norm(xi[:3])) < 0.10


@pytest.mark.slow
def test_lost_frames_not_in_trajectory_or_pose_buffer():
    spec = SyntheticCameraSpec(
        fx=160.0, fy=160.0, cx=159.5, cy=119.5, width=320, height=240
    )
    ds = SyntheticBoxDataset(num_frames=120, cam=spec, radius=1.0)
    sys = _make_system(ds)

    for i in range(12):
        f = ds.frame(i)
        sys.feed_rgbd_frame(f.rgb, f.depth, f.timestamp, frame_id=i)
    black = np.zeros_like(ds.frame(0).rgb)
    sys.feed_rgbd_frame(black, ds.frame(0).depth, 12 / ds.fps, frame_id=12)
    assert sys.lost

    ids = {fid for fid, _ in sys.trajectory()}
    assert 12 not in ids, "lost frame must not enter the trajectory"
    assert ids == set(range(12))
