"""Round-trip tests for the .sens and folder dataset readers.

Mirrors the reference's manual `.sens` reader test
(`/root/reference/examples/data_reader/sens_reader_manual_test.cc`) but
automated: write a tiny synthetic sequence, read it back, check
intrinsics / poses / depth exactly and color approximately (JPEG)."""

import numpy as np
import pytest

from ra_slam_tpu.io import (
    FolderReader,
    Frame,
    SensReader,
    load_trajectory,
    save_trajectory,
    write_folder_dataset,
    write_sens,
)
from ra_slam_tpu.core.camera import PinholeCamera


def _make_frames(n=3, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    # smooth gradients (JPEG-friendly; noise is worst-case for JPEG)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgbs = [
        np.stack(
            [
                (xx / w * 255),
                (yy / h * 255),
                ((xx + yy) / (w + h) * 255 + 10 * i) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        for i in range(n)
    ]
    depths = [(rng.uniform(500, 3000, (h, w))).astype(np.uint16) for _ in range(n)]
    poses = []
    for i in range(n):
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = [0.1 * i, 0.0, -0.05 * i]
        poses.append(t)
    return rgbs, depths, poses


def test_sens_roundtrip(tmp_path):
    rgbs, depths, c2ws = _make_frames()
    k = np.array(
        [[60.0, 0, 31.5, 0], [0, 60.0, 23.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32,
    )
    path = str(tmp_path / "scene.sens")
    write_sens(path, rgbs, depths, c2ws, k, depth_shift=1000.0)

    ds = SensReader(path)
    assert len(ds) == 3
    assert ds.depth_factor == 1000.0
    cam = ds.camera
    assert float(cam.fx) == pytest.approx(60.0)
    assert cam.width == 64 and cam.height == 48

    fr = ds.frame(1)
    # depth is zlib (lossless): exact
    np.testing.assert_allclose(fr.depth, depths[1].astype(np.float32) / 1000.0)
    # pose = inverse(camera_to_world)
    np.testing.assert_allclose(
        fr.cam_T_world @ c2ws[1], np.eye(4), atol=1e-5
    )
    # color is JPEG: approximate
    assert np.mean(np.abs(fr.rgb.astype(float) - rgbs[1].astype(float))) < 20.0


def test_sens_resize(tmp_path):
    rgbs, depths, c2ws = _make_frames(n=1)
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = k[1, 1] = 60.0
    path = str(tmp_path / "s.sens")
    write_sens(path, rgbs, depths, c2ws, k)
    ds = SensReader(path, target_size=(32, 24))
    fr = ds.frame(0)
    assert fr.rgb.shape == (24, 32, 3)
    assert fr.depth.shape == (24, 32)
    assert float(ds.camera.fx) == pytest.approx(30.0)


def test_trajectory_roundtrip(tmp_path):
    path = str(tmp_path / "trajectory.txt")
    poses = []
    for i in range(4):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [i * 0.5, -i, 2.0]
        poses.append((i * 10, m))
    save_trajectory(path, poses)
    back = load_trajectory(path)
    assert [fid for fid, _ in back] == [0, 10, 20, 30]
    for (_, a), (_, b) in zip(poses, back):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_folder_roundtrip(tmp_path):
    rgbs, depths, poses = _make_frames()
    cam = PinholeCamera.create(60.0, 60.0, 31.5, 23.5, 64, 48)
    frames = [
        Frame(
            frame_id=i,
            timestamp=float(i),
            rgb=rgbs[i],
            depth=depths[i].astype(np.float32) / 1000.0,
            cam_T_world=poses[i],
            ht=np.full((48, 64), 0.75, np.float32),
            lt=np.full((48, 64), 0.25, np.float32),
        )
        for i in range(3)
    ]
    write_folder_dataset(str(tmp_path), frames, cam, depth_factor=1000.0)

    ds = FolderReader(str(tmp_path))
    assert len(ds) == 3
    assert ds.depth_factor == 1000.0
    assert float(ds.camera.fx) == pytest.approx(60.0)
    fr = ds.frame(2)
    np.testing.assert_allclose(
        fr.depth, depths[2].astype(np.float32) / 1000.0, atol=1e-3
    )
    np.testing.assert_allclose(fr.cam_T_world, poses[2], atol=1e-6)
    np.testing.assert_allclose(fr.rgb, rgbs[2])  # png: lossless
    assert fr.ht is not None and abs(float(fr.ht.mean()) - 0.75) < 0.01


def test_folder_extrinsics_compose(tmp_path):
    rgbs, depths, poses = _make_frames(n=1)
    cam = PinholeCamera.create(60.0, 60.0, 31.5, 23.5, 64, 48)
    extr = np.eye(4, dtype=np.float32)
    extr[:3, 3] = [0.0, 0.0, 1.0]
    frames = [
        Frame(0, 0.0, rgbs[0], depths[0].astype(np.float32) / 1000.0, poses[0])
    ]
    write_folder_dataset(str(tmp_path), frames, cam, extrinsics=extr)
    ds = FolderReader(str(tmp_path))
    np.testing.assert_allclose(
        ds.frame(0).cam_T_world, extr @ poses[0], atol=1e-6
    )
