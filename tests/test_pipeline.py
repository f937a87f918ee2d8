"""Facade + offline_eval CLI integration tests (CPU, tiny shapes)."""

import json
import os

import pytest

import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.core.config import CameraConfig, SystemConfig, TsdfConfig
from ra_slam_tpu.core.se3 import SE3
from ra_slam_tpu.io import SyntheticBoxDataset, SyntheticCameraSpec
from ra_slam_tpu.pipeline import RaSlamSystem


def _small_setup(num_frames=4):
    spec = SyntheticCameraSpec(
        fx=80.0, fy=80.0, cx=79.5, cy=59.5, width=160, height=120
    )
    ds = SyntheticBoxDataset(
        num_frames=num_frames, cam=spec, half_extents=(2.0, 1.5, 2.0), radius=0.8
    )
    cfg = SystemConfig(
        camera=CameraConfig(fx=80.0, fy=80.0, cx=79.5, cy=59.5,
                            width=160, height=120),
        tsdf=TsdfConfig(
            voxel_size=0.05, truncation=0.3, max_depth=6.0,
            log2_num_blocks=13, log2_hash_size=15,
            max_visible_blocks=2048, width=160, height=120,
            raycast_min_weight=1.0,  # only a handful of frames fused
        ),
    )
    return ds, cfg


@pytest.mark.slow
def test_facade_gt_pose_fusion_and_queries(tmp_path):
    ds, cfg = _small_setup()
    sys_ = RaSlamSystem(cfg, segmentation_model=None, enable_tracking=False)

    for i in range(len(ds)):
        fr = ds.frame(i)
        stats = sys_.feed_rgbd_frame(
            fr.rgb, fr.depth, fr.timestamp,
            pose=SE3.from_matrix(jnp.asarray(fr.cam_T_world)),
            ht=fr.ht, lt=fr.lt,
        )
    assert stats["num_active"] > 0
    assert stats["alloc_failures"] == 0
    assert sys_.num_integrated == len(ds)

    # planner AABB query
    rows = sys_.query_tsdf([-3, -3, -3], [3, 3, 3])
    assert rows.shape[1] == 4 and len(rows) > 0
    sub = sys_.query_tsdf([0, 0, 0], [0.5, 0.5, 0.5])
    assert len(sub) <= len(rows)

    # raycast render from the last pose
    out = sys_.render(SE3.from_matrix(jnp.asarray(ds.frame(0).cam_T_world)))
    assert out["rgba"].shape == (120, 160, 4)
    assert bool(jnp.any(out["hit"]))

    # binary dumps
    n = sys_.download_all(str(tmp_path / "tsdf.bin"))
    assert n > 0
    nv, nt = sys_.download_all_mesh(
        str(tmp_path / "mesh_vertices.bin"),
        str(tmp_path / "mesh_indices.bin"),
        str(tmp_path / "mesh_vertices_prob.bin"),
    )
    assert nt > 0 and nv < 3 * nt  # shared-vertex compaction: V ~ T/2


def test_facade_resizes_to_tsdf_resolution():
    ds, cfg = _small_setup(num_frames=1)
    cfg = SystemConfig(
        camera=cfg.camera,
        tsdf=TsdfConfig(
            voxel_size=0.05, truncation=0.3, max_depth=6.0,
            log2_num_blocks=13, log2_hash_size=15,
            max_visible_blocks=2048, width=80, height=60,  # half res
        ),
    )
    sys_ = RaSlamSystem(cfg, enable_tracking=False)
    fr = ds.frame(0)
    stats = sys_.feed_rgbd_frame(
        fr.rgb, fr.depth, fr.timestamp,
        pose=SE3.from_matrix(jnp.asarray(fr.cam_T_world)),
    )
    assert stats["num_active"] > 0


@pytest.mark.slow  # ~37 s: full CLI incl. meshing; folder/facade paths stay fast
def test_offline_eval_cli(tmp_path, capsys):
    from ra_slam_tpu.pipeline.offline_eval import main

    out_dir = str(tmp_path / "out")
    result = main([
        "--synthetic", "--max-frames", "3",
        "--voxel-size", "0.05", "--truncation", "0.3",
        "--log2-blocks", "13",
        "--download", out_dir,
    ])
    assert result["frames"] == 3
    assert result["tsdf_rows"] > 0
    assert 0 < result["mesh_vertices"] < 3 * result["mesh_triangles"]
    for f in ("tsdf.bin", "mesh_vertices.bin", "mesh_indices.bin",
              "mesh_vertices_prob.bin"):
        assert os.path.exists(os.path.join(out_dir, f))
    # stdout is one JSON line
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["frames"] == 3


@pytest.mark.slow  # ~28 s: .sens round trip through the CLI
def test_offline_eval_cli_sens(tmp_path):
    """CLI over a real .sens file written by our writer."""
    from ra_slam_tpu.io import write_sens
    from ra_slam_tpu.pipeline.offline_eval import main

    ds, _ = _small_setup(num_frames=3)
    frames = [ds.frame(i) for i in range(3)]
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = k[1, 1] = 80.0
    k[0, 2], k[1, 2] = 79.5, 59.5
    write_sens(
        str(tmp_path / "scene.sens"),
        [np.asarray(f.rgb, np.uint8) for f in frames],
        [(np.asarray(f.depth) * 1000).astype(np.uint16) for f in frames],
        [np.linalg.inv(np.asarray(f.cam_T_world, np.float64)).astype(np.float32)
         for f in frames],
        k,
    )
    result = main([
        "--sens", str(tmp_path / "scene.sens"),
        "--voxel-size", "0.05", "--truncation", "0.3",
        "--log2-blocks", "13",
    ])
    assert result["frames"] == 3
    assert result["num_active"] > 0
