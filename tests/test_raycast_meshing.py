import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ra_slam_tpu.core.camera import PinholeCamera
from ra_slam_tpu.core.config import TsdfConfig
from ra_slam_tpu.core.se3 import SE3, exp_se3
from ra_slam_tpu.map.meshing import extract_mesh, save_mesh
from ra_slam_tpu.map.raycast import raycast
from ra_slam_tpu.map.voxel_map import create_map, integrate_frame

CFG = TsdfConfig(
    voxel_size=0.02,
    truncation=0.12,
    max_depth=3.0,
    min_depth=0.2,
    raycast_min_weight=2.0,
    log2_num_blocks=10,
    log2_hash_size=12,
    max_visible_blocks=512,
    width=64,
    height=48,
)
CAM = PinholeCamera.create(40.0, 40.0, 32.0, 24.0, 64, 48)


def fused_wall_map(n_frames=3, z=1.0):
    m = create_map(CFG)
    depth = jnp.full((48, 64), z, dtype=jnp.float32)
    rgb = jnp.full((48, 64, 3), 200.0, dtype=jnp.float32)
    ht = jnp.full((48, 64), 0.9, dtype=jnp.float32)
    lt = jnp.full((48, 64), 0.1, dtype=jnp.float32)
    pose = SE3.identity()
    step = jax.jit(
        lambda mm: integrate_frame(mm, rgb, depth, ht, lt, CAM, pose, CFG, carve=False)[0]
    )
    for _ in range(n_frames):
        m = step(m)
    return m


@pytest.mark.slow
def test_raycast_hits_wall_at_right_depth():
    m = fused_wall_map(4)
    out = raycast(m, CAM, SE3.identity(), CFG)
    hit = np.asarray(out["hit"])
    depth = np.asarray(out["depth"])
    # central region must hit
    ctr = hit[16:32, 24:40]
    assert ctr.mean() > 0.95
    d_ctr = depth[16:32, 24:40]
    np.testing.assert_allclose(d_ctr[ctr], 1.0, atol=0.05)
    # normals point along -z or +z (wall facing camera)
    nrm = np.asarray(out["normal"])[16:32, 24:40]
    assert np.abs(nrm[ctr][:, 2]).mean() > 0.9
    # rgba: alpha=255 at hits, semantic overlay pushes red up
    rgba = np.asarray(out["rgba"])[16:32, 24:40]
    assert (rgba[ctr][:, 3] == 255).all()


def test_raycast_from_offset_pose():
    m = fused_wall_map(4)
    # camera moved 0.2m back: wall should appear at depth 1.2
    world_T_cam = exp_se3(jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, -0.2]))
    cam_T_world = world_T_cam.inverse()
    # jitted: one compile instead of an eager per-op chain (2-core CI)
    out = jax.jit(lambda mm, p: raycast(mm, CAM, p, CFG))(m, cam_T_world)
    hit = np.asarray(out["hit"])[20:28, 28:36]
    depth = np.asarray(out["depth"])[20:28, 28:36]
    assert hit.mean() > 0.9
    np.testing.assert_allclose(depth[hit], 1.2, atol=0.05)


def test_raycast_misses_empty_map():
    m = create_map(CFG)
    out = jax.jit(lambda mm, p: raycast(mm, CAM, p, CFG))(m, SE3.identity())
    assert not np.asarray(out["hit"]).any()
    assert (np.asarray(out["depth"]) == 0).all()


def test_extract_mesh_wall():
    m = fused_wall_map(3)
    verts, indices, probs = extract_mesh(m, CFG, min_weight=1.5)
    assert len(verts) > 100
    # shared-vertex compaction: each vertex is referenced by several
    # triangles (V ~ T/2, like the reference's ownership scheme,
    # /root/reference/utils/tsdf/voxel_tsdf.cu:561-734), not 3T
    assert len(verts) < len(indices)
    assert probs.shape == (len(verts),)
    # surface near z = 1 (within a voxel of the zero crossing; the
    # acquire prior biases it slightly toward the camera)
    assert np.abs(verts[:, 2] - 1.0).max() < 0.06
    # semantic probs fused toward ht=0.9
    assert probs.mean() > 0.6
    # all triangles reference valid vertices
    assert 0 <= indices.min() and indices.max() < len(verts)
    # no degenerate triangles survive compaction
    assert (indices[:, 0] != indices[:, 1]).all()


def test_mesh_empty_map():
    m = create_map(CFG)
    verts, indices, probs = extract_mesh(m, CFG)
    assert len(verts) == 0 and len(indices) == 0


def test_save_mesh_binary_roundtrip(tmp_path):
    m = fused_wall_map(2)
    verts, indices, probs = extract_mesh(m, CFG)
    vp, ip, pp = (
        str(tmp_path / "mesh_vertices.bin"),
        str(tmp_path / "mesh_indices.bin"),
        str(tmp_path / "mesh_vertices_prob.bin"),
    )
    save_mesh(verts, indices, probs, vp, ip, pp)
    v2 = np.fromfile(vp, dtype=np.float32).reshape(-1, 3)
    i2 = np.fromfile(ip, dtype=np.int32).reshape(-1, 3)
    p2 = np.fromfile(pp, dtype=np.float32)
    np.testing.assert_array_equal(v2, verts)
    np.testing.assert_array_equal(i2, indices)
    np.testing.assert_array_equal(p2, probs)


@pytest.mark.slow
def test_render_and_mesh_quality_vs_analytic_box():
    """Quantitative quality vs analytic ground truth (VERDICT r02 #8):
    fuse the synthetic box with GT poses, then (a) splat-rendered depth
    must match the dataset's analytic depth to a bounded RMSE, and
    (b) marching-tetrahedra vertices must lie on the box walls to a
    bounded 95th-percentile distance (one-sided Hausdorff). Bounds are
    a few voxels — the same regime as the reference's trilinear-refined
    raycast (`/root/reference/utils/tsdf/voxel_tsdf.cu:305-345`)."""
    from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec

    spec = SyntheticCameraSpec(
        fx=80.0, fy=80.0, cx=79.5, cy=59.5, width=160, height=120
    )
    ds = SyntheticBoxDataset(num_frames=24, cam=spec, radius=1.0,
                             depth_noise=0.0, seed=0)
    cfg = TsdfConfig(
        voxel_size=0.04, truncation=0.16, max_depth=6.0,
        raycast_min_weight=2.0, log2_num_blocks=12, log2_hash_size=14,
        max_visible_blocks=2048, max_new_blocks=4096,
        width=160, height=120,
    )
    m = create_map(cfg)
    step = jax.jit(
        lambda mm, rgb, d, pose: integrate_frame(
            mm, rgb, d, jnp.zeros_like(d), jnp.zeros_like(d),
            ds.camera, pose, cfg,
        )[0]
    )
    for i in range(0, 24, 2):
        f = ds.frame(i)
        m = step(m, jnp.asarray(f.rgb, jnp.float32), jnp.asarray(f.depth),
                 SE3.from_matrix(jnp.asarray(f.cam_T_world)))

    # (a) rendered depth vs analytic depth
    f0 = ds.frame(0)
    # this config's truncation spans 4 voxels, so a face-on block holds
    # ~8x8x4 in-shell voxels — size the per-block splat budget for it
    out = raycast(m, ds.camera, SE3.from_matrix(jnp.asarray(f0.cam_T_world)),
                  cfg, splats_per_block=256)
    hit = np.asarray(out["hit"])
    depth = np.asarray(out["depth"])
    gt_depth = np.asarray(f0.depth)
    sel = hit & (gt_depth > 0)
    assert sel.mean() > 0.7, f"render coverage {sel.mean():.2f}"
    err = depth[sel] - gt_depth[sel]
    rmse = float(np.sqrt((err ** 2).mean()))
    assert rmse < 3 * cfg.voxel_size, f"depth rmse {rmse:.4f} m"
    # per-block budget overflow is counted, not silent; a handful of
    # corner blocks exceeding it must stay a rounding error
    assert int(out["dropped_splats"]) < 2000, int(out["dropped_splats"])

    # (b) mesh vertices vs wall planes (|x|=3, |y|=2, |z|=3)
    verts, tris, probs = extract_mesh(m, cfg)
    assert len(verts) > 500
    v = np.asarray(verts)
    he = np.array([3.0, 2.0, 3.0])
    wall_d = np.min(np.abs(np.abs(v) - he[None, :]), axis=1)
    p95 = float(np.percentile(wall_d, 95))
    assert p95 < 2 * cfg.voxel_size, f"mesh wall p95 {p95:.4f} m"
