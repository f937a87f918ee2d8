"""ATE/RPE metrics and the end-to-end tracked-trajectory regression —
the native version of the reference's capture → track → save-trajectory
→ replay acceptance loop (`/root/reference/modules/slam_module.cc:20-66`)."""

import numpy as np
import pytest

from ra_slam_tpu.core.config import FeatureConfig, TrackingConfig
from ra_slam_tpu.eval.ate import ate_rmse, rpe_rmse, umeyama_alignment
from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
from ra_slam_tpu.slam.system import SlamSystem


def _traj_from_centers(centers, R=None):
    """Build (id, 3x4 cam_T_world) rows with camera at given centers."""
    out = []
    for i, c in enumerate(centers):
        Ri = np.eye(3) if R is None else R[i]
        t = -Ri @ np.asarray(c)
        out.append((i, np.concatenate([Ri, t[:, None]], axis=1)))
    return out


def test_ate_invariant_to_rigid_transform():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(50, 3))
    gt = _traj_from_centers(centers)

    # a rigid remap of the same trajectory must score ~zero ATE
    ang = 0.7
    Rg = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    )
    moved = _traj_from_centers((Rg @ centers.T).T + np.array([5.0, -2.0, 1.0]))
    m = ate_rmse(moved, gt)
    assert m["ate_rmse"] < 1e-9
    assert m["matched_frames"] == 50

    # known noise level is recovered
    noisy = _traj_from_centers(centers + rng.normal(0, 0.01, centers.shape))
    m = ate_rmse(noisy, gt)
    assert 0.005 < m["ate_rmse"] < 0.03


def test_umeyama_with_scale():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(30, 3))
    s_true = 2.5
    dst = s_true * src + np.array([1.0, 2.0, 3.0])
    s, R, t = umeyama_alignment(src, dst, with_scale=True)
    assert abs(s - s_true) < 1e-9
    np.testing.assert_allclose(R, np.eye(3), atol=1e-9)


def test_rpe_detects_drift():
    centers = np.stack([np.linspace(0, 10, 40), np.zeros(40), np.zeros(40)], 1)
    gt = _traj_from_centers(centers)
    drift = centers + np.stack(
        [np.zeros(40), np.linspace(0, 0.4, 40) ** 2, np.zeros(40)], 1
    )
    m = rpe_rmse(_traj_from_centers(drift), gt, delta=1)
    assert m["pairs"] == 39
    assert 0 < m["rpe_trans_rmse"] < 0.05


def test_ate_requires_overlap():
    gt = _traj_from_centers(np.zeros((5, 3)))
    est = [(100 + i, m) for i, (_, m) in enumerate(gt)]
    with pytest.raises(ValueError):
        ate_rmse(est, gt)


@pytest.mark.slow
def test_slam_full_trajectory_ate():
    """North-star regression: track a synthetic sequence with the full
    SLAM stack and assert the per-frame matched-trajectory ATE. Every
    fed frame must appear in the exported trajectory (reference
    `SaveMatchedTrajectory` semantics)."""
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

    n = 25
    gt = []
    for i in range(n):
        f = ds.frame(i)
        info = sys.feed_rgbd_frame(f.rgb, f.depth, f.timestamp, frame_id=i)
        assert info.tracked
        gt.append((i, np.asarray(f.cam_T_world)[:3, :4]))

    est = sys.trajectory()
    assert len(est) == n, "matched trajectory must cover every tracked frame"
    m = ate_rmse(est, gt)
    assert m["matched_frames"] == n
    assert m["ate_rmse"] < 0.05, m
    r = rpe_rmse(est, gt, delta=1)
    assert r["rpe_trans_rmse"] < 0.03, r

    # non-keyframe poses compose through their reference keyframe: spot
    # check a frame that is certainly not a keyframe
    kf_ids = {fid for fid, _ in sys.keyframe_trajectory()}
    non_kf = [fid for fid, _ in est if fid not in kf_ids]
    assert non_kf, "expected at least one non-keyframe frame"
