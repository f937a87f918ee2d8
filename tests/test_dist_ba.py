"""Distributed Schur-complement BA on the virtual 8-device CPU mesh:
must converge like the single-device solver and agree with it."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ra_slam_tpu.core.se3 import SE3, log_se3
from ra_slam_tpu.parallel.dist_ba import distributed_bundle_adjustment
from ra_slam_tpu.slam.ba import local_bundle_adjustment

from test_ba import _make_problem, _perturb
import pytest


def _mesh(n=8):
    devs = jax.devices()[:n]
    return Mesh(np.array(devs), ("ba",))


@pytest.mark.slow
def test_distributed_ba_matches_single_device():
    cam, kfs, lms, poses_gt, pts_gt, num_kf, num_pts = _make_problem()
    kfs_p, lms_p = _perturb(kfs, lms, num_kf, num_pts)

    kfc = jnp.int32(num_kf)
    kfs_s, lms_s, stats_s = jax.jit(
        lambda k, l: local_bundle_adjustment(
            k, l, kfc, cam, window=8, max_points=256, iterations=8
        )
    )(kfs_p, lms_p)

    mesh = _mesh()
    kfs_d, lms_d, stats_d = jax.jit(
        lambda k, l: distributed_bundle_adjustment(
            k, l, kfc, cam, mesh, window=8, max_points=256, iterations=8
        )
    )(kfs_p, lms_p)

    assert float(stats_d.rmse_after) < 0.5
    assert float(stats_d.rmse_after) < float(stats_d.rmse_before) * 0.1
    # same optimum as the single-device solver
    np.testing.assert_allclose(
        np.asarray(kfs_d.t[:num_kf]), np.asarray(kfs_s.t[:num_kf]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(lms_d.pos[:num_pts]), np.asarray(lms_s.pos[:num_pts]),
        atol=5e-3,
    )


@pytest.mark.slow
def test_distributed_ba_recovers_gt():
    cam, kfs, lms, poses_gt, pts_gt, num_kf, num_pts = _make_problem()
    kfs_p, lms_p = _perturb(kfs, lms, num_kf, num_pts)
    mesh = _mesh()
    kfs_d, lms_d, stats = distributed_bundle_adjustment(
        kfs_p, lms_p, jnp.int32(num_kf), cam, mesh,
        window=8, max_points=256, iterations=10,
        pose_prior=0.0,  # exact-recovery property (see test_ba.py)
    )
    for k in range(1, num_kf):  # pose 0 is the gauge anchor
        xi = log_se3(SE3(kfs_d.R[k], kfs_d.t[k]) @ poses_gt[k].inverse())
        assert float(jnp.linalg.norm(xi[3:])) < 0.01, f"kf {k}"
    err = np.linalg.norm(np.asarray(lms_d.pos[:num_pts]) - pts_gt, axis=-1)
    assert np.median(err) < 0.01


@pytest.mark.slow
def test_refine_map_call_site():
    """`SlamSystem.refine_map` is the production call site of the
    distributed Schur solver: run a short tracked sequence, refine the
    whole map over a 2-device mesh, and require (a) finite converged
    residuals and (b) an end-state the tracker still agrees with (the
    refined keyframe poses stay within mm of the tracked ones on this
    clean sequence)."""
    import numpy as np
    from jax.sharding import Mesh

    import jax
    import jax.numpy as jnp
    from ra_slam_tpu.core.config import FeatureConfig, TrackingConfig
    from ra_slam_tpu.core.se3 import SE3
    from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
    from ra_slam_tpu.slam.system import SlamSystem

    spec = SyntheticCameraSpec(
        fx=80.0, fy=80.0, cx=79.5, cy=59.5, width=160, height=120
    )
    ds = SyntheticBoxDataset(num_frames=120, cam=spec, radius=1.0, seed=0)
    slam = SlamSystem(
        ds.camera,
        fcfg=FeatureConfig(max_num_keypoints=300, num_levels=3),
        tcfg=TrackingConfig(min_inliers=12, match_radius=30.0),
        ba_window=4, ba_max_points=1024, ba_iterations=3,
    )
    for i in range(10):
        fr = ds.frame(i)
        hint = SE3.from_matrix(jnp.asarray(fr.cam_T_world)) if i == 0 else None
        info = slam.feed_rgbd_frame(
            fr.rgb, fr.depth, fr.timestamp, frame_id=i, pose_hint=hint
        )
        assert info.tracked
    kfc = int(slam.state.track.kf_counter)
    assert kfc >= 2
    t_before = np.asarray(slam.state.kfs.t[:kfc])

    mesh = Mesh(np.array(jax.devices()[:2]), ("ba",))
    out = slam.refine_map(mesh=mesh, window=4, iterations=3, sweeps=1)
    assert np.isfinite(out["rmse_after"]) and out["windows"] >= 1
    assert out["rmse_after"] <= out["rmse_before"] + 0.5
    t_after = np.asarray(slam.state.kfs.t[:kfc])
    assert float(np.abs(t_after - t_before).max()) < 0.02
