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


def test_refresh_observations_drop_and_refresh():
    """Post-correction row repair: rows whose landmark moved beyond the
    gate are dropped (mode 1) or re-measured to the corrected sheet
    (mode 2); consistent rows are untouched (slam/keyframes.py)."""
    import jax.numpy as jnp

    from ra_slam_tpu.core.camera import PinholeCamera
    from ra_slam_tpu.core.se3 import SE3
    from ra_slam_tpu.slam.keyframes import (
        create_keyframes,
        insert_keyframe,
        refresh_observations,
    )
    from ra_slam_tpu.slam.landmarks import create_landmarks

    cam = PinholeCamera.create(100.0, 100.0, 63.5, 47.5, 128, 96)
    pts = jnp.asarray([[0.0, 0.0, 2.0], [0.4, 0.1, 2.5], [-0.3, -0.2, 3.0]])
    lms = create_landmarks(8)
    lms = lms._replace(
        pos=lms.pos.at[:3].set(pts), valid=lms.valid.at[:3].set(True)
    )
    uv, z = cam.project(pts)
    F = 4
    kfs = create_keyframes(2, F)
    kfs = insert_keyframe(
        kfs, jnp.int32(0), SE3.identity(), jnp.int32(0), jnp.float32(0.0),
        jnp.asarray([0, 1, 2, -1], jnp.int32),
        jnp.concatenate([uv, jnp.zeros((1, 2))]),
        jnp.asarray([1.0, 1.0, 1.0, 0.0]),
        jnp.zeros((F, 8), jnp.uint32),
        obs_z=jnp.concatenate([z, jnp.zeros((1,))]),
    )
    # a "correction" moves landmark 1 by 20 cm; others stay
    lms2 = lms._replace(pos=lms.pos.at[1, 0].add(0.2))

    k_drop, n1 = refresh_observations(kfs, lms2, cam, gate_px=3.0, mode=1)
    assert int(n1) == 1
    assert float(k_drop.obs_w[0, 1]) == 0.0  # stale row de-weighted
    assert float(k_drop.obs_w[0, 0]) == 1.0  # consistent rows untouched
    assert float(k_drop.obs_w[0, 2]) == 1.0

    k_ref, n2 = refresh_observations(kfs, lms2, cam, gate_px=3.0, mode=2)
    assert int(n2) == 1
    uv_new, z_new = cam.project(lms2.pos[1][None])
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(k_ref.obs_uv[0, 1]), np.asarray(uv_new[0]), atol=1e-4
    )
    np.testing.assert_allclose(
        float(k_ref.obs_z[0, 1]), float(z_new[0]), atol=1e-5
    )
    assert float(k_ref.obs_w[0, 1]) == 1.0  # kept, made consistent
    np.testing.assert_allclose(  # untouched row keeps its measurement
        np.asarray(k_ref.obs_uv[0, 0]), np.asarray(uv[0]), atol=1e-6
    )
