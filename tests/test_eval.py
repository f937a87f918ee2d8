"""Tests for the evaluation tooling: PLY I/O, label maps, ScannetEval
metrics, and mesh post-processing."""

import numpy as np
import pytest

from ra_slam_tpu.eval import (
    LabelParser,
    MeshReader,
    NYU40_HT_DICT,
    ScannetEval,
    load_ply,
    read_semantic_tsdf,
    recolor_gt_by_ht,
    save_ply,
    tsdf_to_semantic_pc,
)


def test_ply_roundtrip(tmp_path):
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    labels = np.array([1, 2, 5, 40], np.uint16)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.5, 0.5, 0.5]])
    path = str(tmp_path / "mesh.ply")
    save_ply(path, verts, faces, vertex_colors=colors, vertex_labels=labels)

    mesh = load_ply(path)
    np.testing.assert_allclose(mesh.vertices, verts, atol=1e-6)
    np.testing.assert_array_equal(mesh.faces, faces)
    np.testing.assert_array_equal(mesh.labels, labels)
    assert mesh.vertex_props["red"][0] == 255


def test_label_parser_builtin():
    lp = LabelParser()
    ht = lp.get_nyuid_to_ht_map()
    assert len(ht) == 40
    assert ht[1] == 0  # wall
    assert ht[5] == 1  # chair
    assert ht[2] == 0  # floor
    assert set(NYU40_HT_DICT.values()) == {0, 1}


def test_label_parser_tsv(tmp_path):
    tsv = tmp_path / "labels.tsv"
    tsv.write_text("id\tnyu40id\tnyu40class\n1\t5\tchair\n2\t1\twall\n")
    lp = LabelParser(str(tsv))
    assert lp.get_nyuid_to_nyuclass_map() == {5: "chair", 1: "wall"}
    assert lp.get_nyuid_to_ht_map() == {5: 1, 1: 0}


def _plane_gt_mesh(tmp_path, label_left=5, label_right=1):
    """Two-label planar GT mesh: x<1 labeled chair (ht), x>=1 wall (lt)."""
    xs, ys = np.meshgrid(np.linspace(0, 2, 21), np.linspace(0, 2, 21))
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], -1)
    labels = np.where(verts[:, 0] < 1.0, label_left, label_right).astype(np.uint16)
    # simple grid triangulation
    faces = []
    for r in range(20):
        for c in range(20):
            i = r * 21 + c
            faces.append([i, i + 1, i + 21])
            faces.append([i + 1, i + 22, i + 21])
    path = str(tmp_path / "gt.ply")
    save_ply(path, verts, np.array(faces, np.int32), vertex_labels=labels)
    return path


def test_scannet_eval_perfect_prediction(tmp_path):
    gt_path = _plane_gt_mesh(tmp_path)
    # predicted surface voxels exactly on the plane, prob = 1 left, 0 right
    xs, ys = np.meshgrid(np.linspace(0.05, 1.95, 24), np.linspace(0.05, 1.95, 24))
    pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], -1)
    prob = (pts[:, 0] < 1.0).astype(np.float32)
    rows = np.concatenate(
        [pts, np.zeros((len(pts), 1)), prob[:, None]], -1
    ).astype(np.float32)
    dump = str(tmp_path / "tsdf.bin")
    rows.tofile(dump)

    ev = ScannetEval(dump, gt_path)
    s = ev.summary()
    assert s["iou"] > 0.9
    assert s["voxel_acc"] > 0.95
    assert s["precision"] > 0.9 and s["recall"] > 0.9


def test_scannet_eval_inverted_prediction(tmp_path):
    gt_path = _plane_gt_mesh(tmp_path)
    xs, ys = np.meshgrid(np.linspace(0.05, 1.95, 24), np.linspace(0.05, 1.95, 24))
    pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], -1)
    prob = (pts[:, 0] >= 1.0).astype(np.float32)  # inverted
    rows = np.concatenate(
        [pts, np.zeros((len(pts), 1)), prob[:, None]], -1
    ).astype(np.float32)
    dump = str(tmp_path / "tsdf.bin")
    rows.tofile(dump)
    ev = ScannetEval(dump, gt_path)
    assert ev.summary()["iou"] < 0.1


def test_tsdf_threshold_filter(tmp_path):
    rows = np.zeros((10, 5), np.float32)
    rows[:, 3] = np.linspace(-1, 1, 10)  # tsdf sweep
    rows[:, 4] = 0.7
    path = str(tmp_path / "t.bin")
    rows.tofile(path)
    back = read_semantic_tsdf(path)
    np.testing.assert_allclose(back, rows)
    pc = tsdf_to_semantic_pc(back)
    assert (np.abs(rows[:, 3]) < 0.1).sum() == len(pc)
    assert pc.shape[1] == 4


def test_mesh_reader_and_clustering(tmp_path):
    # two adjacent triangles, duplicated vertices (per-triangle layout,
    # like extract_mesh output)
    verts = np.array(
        [
            [0, 0, 0], [1, 0, 0], [0, 1, 0],
            [1, 0, 0], [1, 1, 0], [0, 1, 0],
        ],
        np.float32,
    )
    idx = np.arange(6, dtype=np.int32).reshape(-1, 3)
    prob = np.array([0.1, 0.9, 0.5, 0.9, 0.2, 0.5], np.float32)
    verts.tofile(tmp_path / "mesh_vertices.bin")
    idx.tofile(tmp_path / "mesh_indices.bin")
    prob.tofile(tmp_path / "mesh_vertices_prob.bin")

    mr = MeshReader(str(tmp_path))
    assert mr.num_vertices() == 6 and mr.num_triangles() == 2
    n = mr.vertex_normals()
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)

    mr.vertex_clustering_downsample(voxel_size=0.25)
    # duplicated vertices merge -> 4 unique, triangles survive
    assert mr.num_vertices() == 4
    assert mr.num_triangles() == 2

    out = str(tmp_path / "out.ply")
    mr.save(out)
    back = load_ply(out)
    assert len(back.vertices) == 4


def test_recolor_gt(tmp_path):
    gt_path = _plane_gt_mesh(tmp_path)
    out = str(tmp_path / "ht.ply")
    recolor_gt_by_ht(gt_path, out)
    mesh = load_ply(out)
    red = mesh.vertex_props["red"].astype(float) / 255.0
    # chair half red=1, wall half red=0
    assert red.max() == pytest.approx(1.0)
    assert red.min() == pytest.approx(0.0)


def test_dump_semantic_tsdf_format(tmp_path):
    """End-to-end: fuse one synthetic frame, dump, parse with the eval
    reader — byte-layout compatibility check."""
    import functools
    import jax
    import jax.numpy as jnp
    from ra_slam_tpu.core.camera import PinholeCamera
    from ra_slam_tpu.core.config import TsdfConfig
    from ra_slam_tpu.core.se3 import SE3
    from ra_slam_tpu.map.voxel_map import create_map, dump_semantic_tsdf, integrate_frame

    cfg = TsdfConfig(
        voxel_size=0.05, truncation=0.3, max_depth=6.0,
        log2_num_blocks=12, log2_hash_size=14, max_visible_blocks=512,
        width=64, height=48,
    )
    cam = PinholeCamera.create(40.0, 40.0, 31.5, 23.5, 64, 48)
    depth = jnp.full((48, 64), 2.0, jnp.float32)
    rgb = jnp.full((48, 64, 3), 100.0, jnp.float32)
    ht = jnp.full((48, 64), 0.9, jnp.float32)
    lt = jnp.full((48, 64), 0.1, jnp.float32)
    m = create_map(cfg)
    m, _ = jax.jit(functools.partial(integrate_frame, cfg=cfg))(
        m, rgb, depth, ht, lt, cam, SE3.identity()
    )
    path = str(tmp_path / "dump.bin")
    n = dump_semantic_tsdf(m, cfg, path)
    rows = read_semantic_tsdf(path)
    assert len(rows) == n and n > 0
    pc = tsdf_to_semantic_pc(rows)
    assert len(pc) > 0
    # fused voxels near surface carry boosted ht probability
    assert float(np.median(pc[:, 3])) > 0.5
