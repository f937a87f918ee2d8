"""Profiling spans, async logger, and the offline map viewer."""

import pytest
import os
import time

import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.utils.data_logger import AsyncLogger, FrameLogger
from ra_slam_tpu.utils.profiling import StageTimer


def test_stage_timer_accumulates():
    t = StageTimer()
    for _ in range(3):
        with t.span("work"):
            time.sleep(0.01)
    s = t.summary()["work"]
    assert s["count"] == 3
    assert s["mean_ms"] >= 9.0
    assert "work" in t.report()


def test_async_logger_writes_and_drops():
    written = []

    def slow_write(x):
        time.sleep(0.02)
        written.append(x)

    lg = AsyncLogger(slow_write, capacity=2)
    results = [lg.log(i) for i in range(10)]
    lg.close()
    # everything accepted was written, in order
    accepted = [i for i, ok in zip(range(10), results) if ok]
    assert written == accepted
    assert lg.dropped == 10 - len(accepted) > 0


def test_frame_logger_roundtrip(tmp_path):
    from ra_slam_tpu.io import FolderReader

    h, w = 24, 32
    lg = FrameLogger(str(tmp_path), depth_factor=1000.0, capacity=8)
    poses = []
    for i in range(3):
        rgb = np.full((h, w, 3), 10 * i, np.uint8)
        depth = np.full((h, w), 1.0 + 0.1 * i, np.float32)
        assert lg.log_frame(i, rgb, depth, ht=np.full((h, w), 0.5))
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 0.1 * i
        poses.append((i, m))
    lg.close()
    lg.save_trajectory(poses)

    # camera_config.yaml is the caller's job; create minimal one to read back
    (tmp_path / "camera_config.yaml").write_text(
        "Camera.fx: 30.0\nCamera.fy: 30.0\nCamera.cx: 15.5\n"
        "Camera.cy: 11.5\ndepthmap_factor: 1000.0\n"
    )
    ds = FolderReader(str(tmp_path))
    assert len(ds) == 3
    fr = ds.frame(1)
    np.testing.assert_allclose(fr.depth, 1.1, atol=1e-3)
    assert fr.ht is not None


@pytest.mark.slow
def test_viewer_orbit_and_follow(tmp_path):
    import functools
    import jax
    from ra_slam_tpu.core.camera import PinholeCamera
    from ra_slam_tpu.core.config import TsdfConfig
    from ra_slam_tpu.core.se3 import SE3
    from ra_slam_tpu.io import SyntheticBoxDataset, SyntheticCameraSpec
    from ra_slam_tpu.map.voxel_map import create_map, integrate_frame
    from ra_slam_tpu.pipeline.viewer import MapViewer, follow_poses, orbit_poses

    spec = SyntheticCameraSpec(fx=80.0, fy=80.0, cx=79.5, cy=59.5,
                               width=160, height=120)
    ds = SyntheticBoxDataset(num_frames=4, cam=spec,
                             half_extents=(2.0, 1.5, 2.0), radius=0.8)
    cfg = TsdfConfig(voxel_size=0.05, truncation=0.3, max_depth=6.0,
                     log2_num_blocks=13, log2_hash_size=15,
                     max_visible_blocks=2048, width=160, height=120,
                     raycast_min_weight=1.0)
    step = jax.jit(functools.partial(integrate_frame, cfg=cfg))
    m = create_map(cfg)
    trajs = []
    for i in range(4):
        f = ds.frame(i)
        m, _ = step(m, jnp.asarray(f.rgb, jnp.float32), jnp.asarray(f.depth),
                    jnp.asarray(f.ht), jnp.asarray(f.lt), ds.camera,
                    SE3.from_matrix(jnp.asarray(f.cam_T_world)))
        trajs.append(np.asarray(f.cam_T_world))

    cam = PinholeCamera.create(80.0, 80.0, 79.5, 59.5, 160, 120)
    viewer = MapViewer(m, cfg, cam)

    out = viewer.render(SE3.from_matrix(jnp.asarray(trajs[0])))
    assert out["rgba"].shape == (120, 160, 4)
    assert out["hit"].any()
    assert out["normal"].dtype == np.uint8

    # orbit + follow path rendering writes PNG pairs
    poses = orbit_poses(np.zeros(3), 0.5, -0.2, 2)
    poses += follow_poses(trajs[:1])  # input is cam_T_world
    n = viewer.render_path(poses, str(tmp_path / "r"))
    assert n == 3
    files = sorted(os.listdir(tmp_path / "r"))
    assert "rgb_00000.png" in files and "normal_00002.png" in files
