"""Schur-complement local BA: convergence on synthetic geometry."""

import pytest
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.core.camera import PinholeCamera
from ra_slam_tpu.core.se3 import SE3, exp_se3, log_se3
from ra_slam_tpu.slam.ba import (
    gather_window,
    global_bundle_adjustment,
    local_bundle_adjustment,
)
from ra_slam_tpu.slam.keyframes import create_keyframes, insert_keyframe
from ra_slam_tpu.slam.landmarks import create_landmarks


def _make_problem(num_kf=6, num_pts=120, F=160, seed=0):
    rng = np.random.default_rng(seed)
    cam = PinholeCamera.create(200.0, 200.0, 159.5, 119.5, 320, 240)

    pts_gt = np.stack(
        [
            rng.uniform(-2.0, 2.0, num_pts),
            rng.uniform(-1.5, 1.5, num_pts),
            rng.uniform(3.0, 6.0, num_pts),
        ],
        axis=-1,
    ).astype(np.float32)

    poses_gt = []
    for k in range(num_kf):
        xi = np.zeros(6, np.float32)
        xi[1] = 0.03 * k  # slight yaw
        xi[3] = 0.15 * k  # sideways track
        poses_gt.append(exp_se3(jnp.asarray(xi)))

    kfs = create_keyframes(capacity=16, num_features=F)
    lms = create_landmarks(1024)
    lms = lms._replace(
        pos=lms.pos.at[:num_pts].set(jnp.asarray(pts_gt)),
        valid=lms.valid.at[:num_pts].set(True),
    )

    obs_lm = jnp.concatenate(
        [jnp.arange(num_pts, dtype=jnp.int32),
         jnp.full((F - num_pts,), -1, jnp.int32)]
    )
    for k, pose in enumerate(poses_gt):
        uv, z = cam.project(pose.apply(jnp.asarray(pts_gt)))
        w = (z > 0).astype(jnp.float32) * cam.in_bounds(uv)
        obs_uv = jnp.concatenate([uv, jnp.zeros((F - num_pts, 2))])
        obs_w = jnp.concatenate([w, jnp.zeros(F - num_pts)])
        kfs = insert_keyframe(
            kfs, jnp.int32(k), pose, jnp.int32(k), jnp.float32(k / 30.0),
            obs_lm, obs_uv, obs_w, jnp.zeros((F, 8), jnp.uint32),
        )
    return cam, kfs, lms, poses_gt, pts_gt, num_kf, num_pts


def _perturb(kfs, lms, num_kf, num_pts, pose_sigma=0.02, pt_sigma=0.05, seed=1):
    rng = np.random.default_rng(seed)
    for k in range(1, num_kf):  # keep kf 0 exact (gauge anchor)
        xi = rng.normal(0, pose_sigma, 6).astype(np.float32)
        noisy = exp_se3(jnp.asarray(xi)) @ SE3(kfs.R[k], kfs.t[k])
        kfs = kfs._replace(
            R=kfs.R.at[k].set(noisy.R), t=kfs.t.at[k].set(noisy.t)
        )
    noise = rng.normal(0, pt_sigma, (num_pts, 3)).astype(np.float32)
    lms = lms._replace(pos=lms.pos.at[:num_pts].add(jnp.asarray(noise)))
    return kfs, lms


@pytest.mark.slow
def test_ba_converges_to_ground_truth():
    cam, kfs, lms, poses_gt, pts_gt, num_kf, num_pts = _make_problem()
    kfs, lms = _perturb(kfs, lms, num_kf, num_pts)

    # pose_prior=0: this test checks the pure-BA exact-recovery property
    # under perturbations far beyond odometry noise; the default
    # odometry prior intentionally resists such corrections
    ba = jax.jit(
        functools.partial(
            local_bundle_adjustment,
            cam=cam, window=8, max_points=256, iterations=10,
            pose_prior=0.0,
        )
    )
    kfs2, lms2, stats = ba(kfs, lms, jnp.int32(num_kf))

    assert float(stats.rmse_before) > 1.0  # perturbation was visible
    assert float(stats.rmse_after) < 0.05, (
        f"BA did not converge: rmse {float(stats.rmse_before):.3f} -> "
        f"{float(stats.rmse_after):.3f}"
    )
    # poses recover GT (gauge is anchored at kf 0 = GT)
    for k in range(num_kf):
        xi = log_se3(SE3(kfs2.R[k], kfs2.t[k]) @ poses_gt[k].inverse())
        assert float(jnp.linalg.norm(xi[:3])) < 2e-3, f"kf {k} rotation off"
        assert float(jnp.linalg.norm(xi[3:])) < 5e-3, f"kf {k} translation off"
    pt_err = jnp.linalg.norm(lms2.pos[:num_pts] - jnp.asarray(pts_gt), axis=-1)
    assert float(jnp.median(pt_err)) < 1e-2


@pytest.mark.slow  # fast tier keeps BA convergence/global-window coverage
def test_ba_respects_fixed_gauge():
    cam, kfs, lms, poses_gt, pts_gt, num_kf, num_pts = _make_problem()
    kfs, lms = _perturb(kfs, lms, num_kf, num_pts)
    R0, t0 = kfs.R[0], kfs.t[0]
    kfs2, _, _ = local_bundle_adjustment(
        kfs, lms, jnp.int32(num_kf), cam, window=8, max_points=256,
        iterations=4,
    )
    np.testing.assert_allclose(np.asarray(kfs2.R[0]), np.asarray(R0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(kfs2.t[0]), np.asarray(t0), atol=1e-6)


def test_global_ba_refines_outside_local_window():
    """Perturb a 12-keyframe map everywhere; a window-4 local BA only
    touches the newest keyframes, while the global sweeps recover poses
    and structure map-wide (the g2o global-BA role, SURVEY.md §2.8)."""
    cam, kfs, lms, poses_gt, pts_gt, num_kf, num_pts = _make_problem(
        num_kf=12
    )
    kfs, lms = _perturb(kfs, lms, num_kf, num_pts)

    gba = jax.jit(
        functools.partial(
            global_bundle_adjustment,
            cam=cam, window=4, max_points=256, iterations=6, sweeps=2,
            pose_prior=0.0,  # exact-recovery property (see local test)
        )
    )
    kfs2, lms2, stats = gba(kfs, lms, jnp.int32(num_kf))

    assert float(stats.rmse_before) > 0.5
    assert float(stats.rmse_after) < 0.05, (
        f"global BA did not converge: {float(stats.rmse_before):.3f} -> "
        f"{float(stats.rmse_after):.3f}"
    )
    # early keyframes (outside any newest-4 window) must also recover
    for k in range(num_kf):
        xi = log_se3(SE3(kfs2.R[k], kfs2.t[k]) @ poses_gt[k].inverse())
        assert float(jnp.linalg.norm(xi[3:])) < 1e-2, f"kf {k} not refined"
    pt_err = jnp.linalg.norm(lms2.pos[:num_pts] - jnp.asarray(pts_gt), axis=-1)
    assert float(jnp.median(pt_err)) < 2e-2


def test_gather_window_dedups_landmarks():
    cam, kfs, lms, _, _, num_kf, num_pts = _make_problem()
    win = gather_window(kfs, lms, jnp.int32(num_kf), window=8, max_points=256)
    n_local = int(jnp.sum(win.point_ok))
    assert n_local == num_pts  # every point observed by several kfs, once each
    ids = np.asarray(win.loc2glob[:n_local])
    assert len(np.unique(ids)) == n_local
    # every in-bounds observation inserted into the db survives the gather
    n_obs = int(jnp.sum(win.obs_w > 0))
    n_inserted = int(jnp.sum(kfs.obs_w > 0))
    assert n_obs == n_inserted
