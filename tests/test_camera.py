import jax
import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.core.camera import PinholeCamera, bilinear_sample, nearest_sample


def make_cam():
    return PinholeCamera.create(525.0, 520.0, 319.5, 239.5, 640, 480)


def test_project_unproject_roundtrip():
    cam = make_cam()
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (100, 3), minval=-1, maxval=1)
    pts = pts.at[:, 2].set(jnp.abs(pts[:, 2]) + 0.5)
    uv, z = cam.project(pts)
    pts2 = cam.unproject(uv, z)
    np.testing.assert_allclose(np.asarray(pts2), np.asarray(pts), atol=1e-4)


def test_principal_point():
    cam = make_cam()
    uv, z = cam.project(jnp.array([0.0, 0.0, 2.0]))
    np.testing.assert_allclose(np.asarray(uv), [319.5, 239.5], atol=1e-5)
    np.testing.assert_allclose(float(z), 2.0)


def test_in_bounds():
    cam = make_cam()
    uv = jnp.array([[0.0, 0.0], [639.0, 479.0], [-1.0, 5.0], [640.0, 100.0]])
    mask = np.asarray(cam.in_bounds(uv))
    assert mask.tolist() == [True, True, False, False]


def test_resized_scales_intrinsics():
    cam = make_cam().resized(320, 240)
    assert cam.width == 320 and cam.height == 240
    np.testing.assert_allclose(float(cam.fx), 525.0 / 2)
    np.testing.assert_allclose(float(cam.cy), 239.5 / 2)


def test_bilinear_sample_linear_ramp():
    # f(u, v) = u + 2v is reproduced exactly by bilinear interpolation.
    H, W = 16, 24
    u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
    v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
    img = u + 2 * v
    uv = jnp.array([[3.25, 7.5], [0.0, 0.0], [10.9, 2.1]])
    vals, valid = bilinear_sample(img, uv)
    expect = uv[:, 0] + 2 * uv[:, 1]
    np.testing.assert_allclose(np.asarray(vals), np.asarray(expect), atol=1e-5)
    assert np.asarray(valid).all()


def test_bilinear_out_of_bounds():
    img = jnp.ones((8, 8))
    vals, valid = bilinear_sample(img, jnp.array([[9.0, 4.0]]), fill=-1.0)
    assert float(vals[0]) == -1.0 and not bool(valid[0])


def test_nearest_sample():
    img = jnp.arange(12.0).reshape(3, 4)
    vals, valid = nearest_sample(img, jnp.array([[1.4, 2.4], [3.6, 0.2]]))
    # (u=1.4 -> 1, v=2.4 -> 2) -> img[2,1]=9 ; (u=3.6 -> 4 OOB)
    assert float(vals[0]) == 9.0
    assert not bool(valid[1])


def test_pixel_grid_shape():
    cam = PinholeCamera.create(10, 10, 5, 5, 12, 8)
    g = cam.pixel_grid()
    assert g.shape == (8, 12, 2)
    assert float(g[0, 3, 0]) == 3.0 and float(g[5, 0, 1]) == 5.0
