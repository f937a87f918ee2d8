"""Motion-only Gauss-Newton pose estimation."""

import jax
import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.core.camera import PinholeCamera
from ra_slam_tpu.core.se3 import SE3, exp_se3, log_se3
from ra_slam_tpu.slam.pnp import motion_only_gn, reprojection_residuals


def _setup(n=200, seed=0, noise=0.0, outliers=0):
    rng = np.random.default_rng(seed)
    cam = PinholeCamera(
        fx=jnp.float32(320.0), fy=jnp.float32(320.0),
        cx=jnp.float32(319.5), cy=jnp.float32(239.5), width=640, height=480,
    )
    pts = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], (n, 3)).astype(np.float32)
    gt = exp_se3(jnp.asarray([0.05, -0.08, 0.03, 0.1, -0.05, 0.2], jnp.float32))
    p_cam = gt.apply(jnp.asarray(pts))
    uv, z = cam.project(p_cam)
    uv = np.asarray(uv)
    if noise > 0:
        uv = uv + rng.normal(0, noise, uv.shape)
    if outliers > 0:
        idx = rng.choice(n, outliers, replace=False)
        uv[idx] += rng.uniform(30, 120, (outliers, 2))
    return cam, jnp.asarray(pts), jnp.asarray(uv, jnp.float32), gt


def _pose_err(a: SE3, b: SE3) -> float:
    return float(jnp.linalg.norm(log_se3(a @ b.inverse())))


def test_residuals_zero_at_gt():
    cam, pts, uv, gt = _setup()
    r, J, ok = reprojection_residuals(gt, pts, uv, cam)
    assert bool(ok.all())
    assert float(jnp.abs(r).max()) < 1e-3
    assert J.shape == (200, 2, 6)


def test_gn_converges_from_identity():
    cam, pts, uv, gt = _setup()
    w = jnp.ones(pts.shape[0])
    res = jax.jit(
        lambda p0: motion_only_gn(p0, pts, uv, w, cam, iterations=10)
    )(SE3.identity())
    assert _pose_err(res.pose, gt) < 1e-4
    assert int(res.num_inliers) == 200
    assert float(res.rmse) < 0.01


def test_gn_robust_to_outliers():
    cam, pts, uv, gt = _setup(noise=0.5, outliers=40)
    w = jnp.ones(pts.shape[0])
    res = motion_only_gn(SE3.identity(), pts, uv, w, cam, iterations=15)
    assert _pose_err(res.pose, gt) < 0.01
    # outliers must be excluded from the final inlier set
    assert 140 <= int(res.num_inliers) <= 165


def test_gn_respects_weights():
    cam, pts, uv, gt = _setup()
    # corrupt half the points but zero their weights -> still exact
    uv_bad = uv.at[:100].add(50.0)
    w = jnp.concatenate([jnp.zeros(100), jnp.ones(100)])
    res = motion_only_gn(SE3.identity(), pts, uv_bad, w, cam, iterations=10)
    assert _pose_err(res.pose, gt) < 1e-4
