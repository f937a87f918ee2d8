import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ra_slam_tpu.core.se3 import (
    SE3,
    exp_se3,
    exp_so3,
    log_se3,
    log_so3,
    mat_to_quat,
    quat_slerp,
    quat_to_mat,
)


def random_twists(n, key=0, scale=1.0):
    k = jax.random.PRNGKey(key)
    return jax.random.normal(k, (n, 6)) * scale


def test_exp_log_so3_roundtrip():
    w = random_twists(64)[:, :3]
    R = exp_so3(w)
    w2 = log_so3(R)
    np.testing.assert_allclose(np.asarray(exp_so3(w2)), np.asarray(R), atol=1e-5)


def test_exp_so3_is_rotation():
    w = random_twists(32)[:, :3] * 2.0
    R = exp_so3(w)
    eye = jnp.eye(3)[None].repeat(32, 0)
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-5
    )
    det = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_log_so3_near_pi():
    axis = jnp.array([0.0, 1.0, 0.0])
    theta = 3.14
    R = exp_so3(axis * theta)
    w = log_so3(R)
    np.testing.assert_allclose(np.asarray(exp_so3(w)), np.asarray(R), atol=1e-4)


def test_exp_log_se3_roundtrip():
    xi = random_twists(64)
    T = exp_se3(xi)
    xi2 = log_se3(T)
    T2 = exp_se3(xi2)
    np.testing.assert_allclose(np.asarray(T2.R), np.asarray(T.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(T2.t), np.asarray(T.t), atol=1e-4)


def test_compose_inverse():
    xi = random_twists(16)
    T = exp_se3(xi)
    I = T.compose(T.inverse())
    np.testing.assert_allclose(
        np.asarray(I.R), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)


def test_apply_matches_matrix():
    xi = random_twists(8)
    T = exp_se3(xi)
    pts = jax.random.normal(jax.random.PRNGKey(1), (8, 3))
    out = T.apply(pts)
    hom = jnp.concatenate([pts, jnp.ones((8, 1))], axis=-1)
    out2 = jnp.einsum("bij,bj->bi", T.as_matrix(), hom)[:, :3]
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_quat_roundtrip():
    w = random_twists(128, key=3)[:, :3] * 2.5
    R = exp_so3(w)
    q = mat_to_quat(R)
    R2 = quat_to_mat(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # unit norm, positive scalar part
    nrm = np.linalg.norm(np.asarray(q), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)
    assert (np.asarray(q)[:, 0] >= -1e-6).all()


def test_slerp_endpoints_and_midpoint():
    q0 = mat_to_quat(exp_so3(jnp.array([0.0, 0.0, 0.0])))
    q1 = mat_to_quat(exp_so3(jnp.array([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(
        np.asarray(quat_slerp(q0, q1, jnp.float32(0.0))), np.asarray(q0), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(quat_slerp(q0, q1, jnp.float32(1.0))), np.asarray(q1), atol=1e-5
    )
    qm = quat_slerp(q0, q1, jnp.float32(0.5))
    Rm = quat_to_mat(qm)
    np.testing.assert_allclose(
        np.asarray(Rm), np.asarray(exp_so3(jnp.array([0.0, 0.0, 0.5]))), atol=1e-5
    )


def test_matrix_roundtrip():
    xi = random_twists(4)
    T = exp_se3(xi)
    M = T.as_matrix()
    T2 = SE3.from_matrix(M)
    np.testing.assert_allclose(np.asarray(T2.R), np.asarray(T.R), atol=1e-6)
    np.testing.assert_allclose(np.asarray(T2.t), np.asarray(T.t), atol=1e-6)


def test_jit_and_vmap():
    f = jax.jit(lambda xi: log_se3(exp_se3(xi)))
    xi = random_twists(8)
    out = f(xi)
    assert out.shape == (8, 6)
