"""Synthetic dataset: analytic depth/pose consistency."""

import numpy as np

from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec


def _small_ds(n=8):
    return SyntheticBoxDataset(
        num_frames=n,
        cam=SyntheticCameraSpec(
            fx=80.0, fy=80.0, cx=79.5, cy=59.5, width=160, height=120
        ),
        half_extents=(3.0, 2.0, 3.0),
        radius=1.0,
    )


def test_depth_pose_consistency():
    """Unprojected depth through the GT pose must land on a box wall."""
    ds = _small_ds()
    he = np.array([3.0, 2.0, 3.0])
    for idx in (0, 3, 5):
        f = ds.frame(idx)
        H, W = f.depth.shape
        vs, us = np.mgrid[0:H:17, 0:W:23]
        d = f.depth[vs, us]
        x = (us - 79.5) / 80.0 * d
        y = (vs - 59.5) / 80.0 * d
        p_cam = np.stack([x, y, d, np.ones_like(d)], -1)
        wTc = np.linalg.inv(f.cam_T_world.astype(np.float64))
        p_w = p_cam @ wTc.T
        dist_to_wall = np.min(np.abs(np.abs(p_w[..., :3]) - he), axis=-1)
        assert dist_to_wall.max() < 1e-3
        assert np.all(np.abs(p_w[..., :3]) <= he + 1e-3)


def test_frame_fields():
    ds = _small_ds(4)
    f = ds.frame(1)
    assert f.rgb.dtype == np.uint8 and f.rgb.shape == (120, 160, 3)
    assert f.depth.dtype == np.float32
    assert f.ht.shape == f.depth.shape
    assert np.allclose(f.ht + f.lt, 1.0, atol=1e-6)
    assert f.timestamp > 0
    assert len(ds) == 4
    assert ds.camera.width == 160


def test_high_touch_wall_visible_from_front():
    """Frame 0 looks at the +x wall, which is the high-touch face."""
    ds = _small_ds()
    f = ds.frame(0)
    H, W = f.depth.shape
    assert f.ht[H // 2, W // 2] > 0.9
