"""End-to-end sparse SLAM (tracking + keyframes + local BA) and the
timestamped pose buffer."""

import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.core.config import FeatureConfig, TrackingConfig
from ra_slam_tpu.core.se3 import SE3, exp_se3, log_se3
from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
from ra_slam_tpu.slam.system import SlamSystem
from ra_slam_tpu.utils.pose_buffer import PoseBuffer
import pytest


@pytest.mark.slow
def test_slam_system_orbit_ate():
    spec = SyntheticCameraSpec(
        fx=160.0, fy=160.0, cx=159.5, cy=119.5, width=320, height=240
    )
    ds = SyntheticBoxDataset(num_frames=120, cam=spec, radius=1.0)
    sys = SlamSystem(
        ds.camera,
        fcfg=FeatureConfig(max_num_keypoints=600, num_levels=4),
        tcfg=TrackingConfig(min_inliers=15, match_radius=30.0),
        ba_window=6,
        ba_max_points=2048,
        ba_iterations=5,
    )

    n_frames = 25
    tr_errs, rot_errs = [], []
    for i in range(n_frames):
        f = ds.frame(i)
        hint = (
            SE3.from_matrix(jnp.asarray(f.cam_T_world)) if i == 0 else None
        )  # anchor the gauge at GT so errors below are absolute
        info = sys.feed_rgbd_frame(
            f.rgb, f.depth, f.timestamp, frame_id=i, pose_hint=hint
        )
        assert info.tracked, f"tracking lost at frame {i}"
        gt = SE3.from_matrix(jnp.asarray(f.cam_T_world))
        xi = log_se3(info.pose @ gt.inverse())
        rot_errs.append(float(jnp.linalg.norm(xi[:3])))
        tr_errs.append(float(jnp.linalg.norm(xi[3:])))

    assert int(sys.state.track.kf_counter) >= 3  # keyframes were created
    # BA-backed odometry should stay within a few cm over ~75 deg of orbit
    assert max(tr_errs) < 0.08, f"translation errors {tr_errs}"
    assert max(rot_errs) < 0.05, f"rotation errors {rot_errs}"

    # keyframe trajectory export matches the frame ids that were fed
    traj = sys.trajectory()
    ids = [fid for fid, _ in traj]
    assert ids[0] == 0 and ids == sorted(ids)
    for _, m in traj:
        assert m.shape == (3, 4) and np.isfinite(m).all()


def test_pose_buffer_interpolation():
    buf = PoseBuffer()
    assert buf.query(0.0) is None

    p0 = SE3.identity()
    p1 = exp_se3(jnp.asarray([0.0, 0.2, 0.0, 1.0, 0.0, 0.0], jnp.float32))
    buf.register(1.0, p0)
    buf.register(2.0, p1)

    mid = buf.query(1.5)
    xi = log_se3(SE3(jnp.asarray(mid.R), jnp.asarray(mid.t)))
    # halfway: half the rotation, half the translation (to 1st order)
    assert abs(float(xi[1]) - 0.1) < 5e-3
    assert abs(float(jnp.asarray(mid.t)[0]) - 0.5) < 5e-3

    # clamping at the ends; latest() returns the newest pose
    np.testing.assert_allclose(np.asarray(buf.query(0.0).t), np.asarray(p0.t))
    np.testing.assert_allclose(
        np.asarray(buf.latest().t), np.asarray(p1.t), atol=1e-6
    )
    # out-of-order registration keeps the buffer sorted
    pm = exp_se3(jnp.asarray([0.0, 0.1, 0.0, 0.5, 0.0, 0.0], jnp.float32))
    buf.register(1.5, pm)
    np.testing.assert_allclose(
        np.asarray(buf.query(1.5).t), np.asarray(pm.t), atol=1e-6
    )
