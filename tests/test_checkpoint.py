"""Checkpoint / resume round-trip tests."""

import jax.numpy as jnp
import pytest
import numpy as np

from ra_slam_tpu.core.config import CameraConfig, SystemConfig, TsdfConfig
from ra_slam_tpu.core.se3 import SE3
from ra_slam_tpu.io import SyntheticBoxDataset, SyntheticCameraSpec
from ra_slam_tpu.pipeline import RaSlamSystem
from ra_slam_tpu.utils.checkpoint import (
    load_pytree,
    load_system,
    save_pytree,
    save_system,
)


def _cfg():
    from ra_slam_tpu.core.config import FeatureConfig, TrackingConfig

    return SystemConfig(
        camera=CameraConfig(fx=80.0, fy=80.0, cx=79.5, cy=59.5,
                            width=160, height=120),
        tsdf=TsdfConfig(
            voxel_size=0.05, truncation=0.3, max_depth=6.0,
            log2_num_blocks=12, log2_hash_size=14,
            max_visible_blocks=1024, width=160, height=120,
        ),
        feature=FeatureConfig(max_num_keypoints=400, num_levels=3),
        tracking=TrackingConfig(min_inliers=10, match_radius=30.0),
    )


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6).reshape(2, 3), "b": (jnp.float32(2.5),
            jnp.zeros((4,), bool))}
    path = str(tmp_path / "t.npz")
    save_pytree(path, tree)
    back = load_pytree(path, tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.arange(6).reshape(2, 3))
    assert float(back["b"][0]) == 2.5
    assert back["b"][1].dtype == bool


def test_pytree_shape_mismatch(tmp_path):
    import pytest

    path = str(tmp_path / "t.npz")
    save_pytree(path, {"a": jnp.zeros((3,))})
    with pytest.raises(ValueError):
        load_pytree(path, {"a": jnp.zeros((4,))})


@pytest.mark.slow
def test_system_checkpoint_resume(tmp_path):
    spec = SyntheticCameraSpec(fx=80.0, fy=80.0, cx=79.5, cy=59.5,
                               width=160, height=120)
    ds = SyntheticBoxDataset(num_frames=6, cam=spec,
                             half_extents=(2.0, 1.5, 2.0), radius=0.8)

    sys_a = RaSlamSystem(_cfg(), enable_tracking=False)
    for i in range(3):
        fr = ds.frame(i)
        sys_a.feed_rgbd_frame(
            fr.rgb, fr.depth, fr.timestamp,
            pose=SE3.from_matrix(jnp.asarray(fr.cam_T_world)),
            ht=fr.ht, lt=fr.lt,
        )
    ckpt = str(tmp_path / "ckpt")
    save_system(ckpt, sys_a)

    # resume in a fresh system and continue fusing
    sys_b = RaSlamSystem(_cfg(), enable_tracking=False)
    load_system(ckpt, sys_b)
    assert sys_b.num_integrated == 3
    np.testing.assert_array_equal(
        np.asarray(sys_a.map.active), np.asarray(sys_b.map.active)
    )
    np.testing.assert_allclose(
        np.asarray(sys_a.map.tsdf), np.asarray(sys_b.map.tsdf)
    )

    # continue both; they must stay identical
    for i in range(3, 6):
        fr = ds.frame(i)
        pose = SE3.from_matrix(jnp.asarray(fr.cam_T_world))
        sa = sys_a.feed_rgbd_frame(fr.rgb, fr.depth, fr.timestamp,
                                   pose=pose, ht=fr.ht, lt=fr.lt)
        sb = sys_b.feed_rgbd_frame(fr.rgb, fr.depth, fr.timestamp,
                                   pose=pose, ht=fr.ht, lt=fr.lt)
    assert sa == sb
    np.testing.assert_allclose(
        np.asarray(sys_a.map.tsdf), np.asarray(sys_b.map.tsdf)
    )


@pytest.mark.slow
def test_slam_state_checkpoint(tmp_path):
    spec = SyntheticCameraSpec(fx=80.0, fy=80.0, cx=79.5, cy=59.5,
                               width=160, height=120)
    ds = SyntheticBoxDataset(num_frames=120, cam=spec, radius=0.8)
    sys_a = RaSlamSystem(_cfg(), enable_tracking=True)

    for i in range(3):
        fr = ds.frame(i)
        info = sys_a.feed_tracking_frame(fr.rgb, fr.depth, fr.timestamp)
        assert info.tracked
    ckpt = str(tmp_path / "ckpt")
    save_system(ckpt, sys_a)

    sys_b = RaSlamSystem(_cfg(), enable_tracking=True)
    load_system(ckpt, sys_b)
    assert int(sys_b.slam.state.track.kf_counter) == int(
        sys_a.slam.state.track.kf_counter
    )
    # pose buffer restored: same query result
    pa = sys_a.query_camera_pose(1.0)
    pb = sys_b.query_camera_pose(1.0)
    np.testing.assert_allclose(np.asarray(pa.t), np.asarray(pb.t), atol=1e-6)
    # resumed tracking continues
    fr = ds.frame(3)
    info = sys_b.feed_tracking_frame(fr.rgb, fr.depth, fr.timestamp)
    assert info.tracked
