import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ra_slam_tpu.core.camera import PinholeCamera
from ra_slam_tpu.core.config import TsdfConfig
from ra_slam_tpu.core.se3 import SE3
from ra_slam_tpu.map.blocks import BLOCK_LEN, INVALID_KEY, pack_block_coords
from ra_slam_tpu.map.voxel_map import (
    allocate_keys,
    create_map,
    gather_valid,
    gather_valid_semantic,
    integrate_frame,
    num_active,
    space_carve,
    visible_blocks,
)

CFG = TsdfConfig(
    voxel_size=0.02,
    truncation=0.12,
    max_depth=3.0,
    log2_num_blocks=10,
    log2_hash_size=12,
    max_visible_blocks=512,
    width=64,
    height=48,
)
CAM = PinholeCamera.create(40.0, 40.0, 32.0, 24.0, 64, 48)


def wall_frame(depth_val=1.0):
    """Flat wall at z=depth_val facing the camera at identity pose."""
    depth = jnp.full((48, 64), depth_val, dtype=jnp.float32)
    rgb = jnp.full((48, 64, 3), 128.0, dtype=jnp.float32)
    ht = jnp.full((48, 64), 0.9, dtype=jnp.float32)
    lt = jnp.full((48, 64), 0.1, dtype=jnp.float32)
    return rgb, depth, ht, lt


def test_allocate_keys_dedup_and_idempotent():
    m = create_map(CFG)
    coords = jnp.array([[0, 0, 6], [0, 0, 6], [1, 0, 6], [0, 1, 6]], dtype=jnp.int32)
    keys = pack_block_coords(coords)
    m = allocate_keys(m, keys)
    assert int(num_active(m)) == 3
    assert int(m.alloc_failures) == 0
    # same keys again: no growth
    m2 = allocate_keys(m, keys)
    assert int(num_active(m2)) == 3
    assert int(m2.alloc_failures) == 0


def test_allocate_init_values():
    m = create_map(CFG)
    keys = pack_block_coords(jnp.array([[2, 3, 4]], dtype=jnp.int32))
    m = allocate_keys(m, keys)
    idx = int(np.nonzero(np.asarray(m.active))[0][0])
    assert np.asarray(m.tsdf[idx]).max() == -1.0
    assert np.asarray(m.weight[idx]).min() == 1.0
    assert np.allclose(np.asarray(m.prob[idx]), 0.5)


def test_pool_exhaustion_counts_failures():
    cfg = TsdfConfig(log2_num_blocks=3, log2_hash_size=6)  # 8 blocks
    m = create_map(cfg)
    coords = jnp.stack(
        [jnp.arange(20, dtype=jnp.int32), jnp.zeros(20, jnp.int32), jnp.zeros(20, jnp.int32)],
        axis=-1,
    )
    m = allocate_keys(m, pack_block_coords(coords))
    assert int(num_active(m)) == 8
    assert int(m.alloc_failures) == 12


@pytest.mark.slow
def test_integrate_frame_wall_geometry():
    m = create_map(CFG)
    rgb, depth, ht, lt = wall_frame(1.0)
    pose = SE3.identity()
    m, stats = integrate_frame(m, rgb, depth, ht, lt, CAM, pose, CFG, carve=False)
    assert int(stats["num_active"]) > 0
    assert int(stats["alloc_failures"]) == 0

    rows = gather_valid_semantic(m, CFG)
    # voxels near the optical axis at varying z
    sel = (np.abs(rows[:, 0]) < 0.01) & (np.abs(rows[:, 1]) < 0.01)
    zs, tsdf, prob = rows[sel, 2], rows[sel, 3], rows[sel, 4]
    # in front of wall (z < 1): observed sdf > 0 pulls tsdf up from -1
    band = (zs > 0.9) & (zs < 1.1)
    assert band.sum() > 3
    # single-frame analytic fusion on the optical axis (d2r = 1):
    # fused = (init*-1*w0 + min(1, (1-z)/trunc)*wn) / (w0+wn),
    # w0 = 1 (acquire prior), wn = (1 - d/max_depth)*4
    wn = (1.0 - 1.0 / CFG.max_depth) * 4.0
    obs = np.minimum(1.0, (1.0 - zs[band]) / CFG.truncation)
    expect = (-1.0 + obs * wn) / (1.0 + wn)
    np.testing.assert_allclose(tsdf[band], expect, atol=0.02)
    # strictly behind the truncation band: untouched prior -1
    deep = tsdf[zs > 1.0 + CFG.truncation + 0.03]
    if deep.size:
        np.testing.assert_allclose(deep, -1.0, atol=1e-6)
    # semantics: ht=0.9 observation pulls prob above 0.5 wherever updated
    upd = prob[np.abs(zs - 1.0) < 0.05]
    assert (upd > 0.5).all()


def test_integrate_converges_with_frames():
    m = create_map(CFG)
    rgb, depth, ht, lt = wall_frame(1.0)
    pose = SE3.identity()
    step = jax.jit(
        lambda mm: integrate_frame(mm, rgb, depth, ht, lt, CAM, pose, CFG, carve=False)[0]
    )
    for _ in range(5):
        m = step(m)
    rows = gather_valid(m, CFG)
    sel = (np.abs(rows[:, 0]) < 0.01) & (np.abs(rows[:, 1]) < 0.01)
    zs, tsdf = rows[sel, 2], rows[sel, 3]
    # after several frames the init prior (-1, w=1) washes out:
    # just in front of the wall tsdf ~ sdf/trunc
    probe = (zs > 0.90) & (zs < 0.94)
    expect = (1.0 - zs[probe]) / CFG.truncation
    np.testing.assert_allclose(tsdf[probe], expect, atol=0.15)


def test_visibility_culling():
    m = create_map(CFG)
    # one block in front of the camera, one far behind it
    keys = pack_block_coords(jnp.array([[0, 0, 6], [0, 0, -20]], dtype=jnp.int32))
    m = allocate_keys(m, keys)
    idx, mask, count = visible_blocks(m, CAM, SE3.identity(), CFG)
    assert int(count) == 1
    vis_keys = np.asarray(m.block_key[idx])[np.asarray(mask)]
    assert vis_keys.tolist() == [int(keys[0])]


def test_space_carving_releases_empty_blocks():
    m = create_map(CFG)
    keys = pack_block_coords(jnp.array([[0, 0, 6], [0, 0, 7]], dtype=jnp.int32))
    m = allocate_keys(m, keys)
    # mark block 0's voxels as all-empty (|tsdf| ~ 1), block 1 has surface
    i0 = int(np.nonzero(np.asarray(m.block_key) == int(keys[0]))[0][0])
    i1 = int(np.nonzero(np.asarray(m.block_key) == int(keys[1]))[0][0])
    m = m._replace(
        tsdf=m.tsdf.at[i0].set(1.0).at[i1].set(0.05),
    )
    idx, mask, _ = visible_blocks(m, CAM, SE3.identity(), CFG)
    m = space_carve(m, idx, mask, CFG)
    assert not bool(m.active[i0])
    assert bool(m.active[i1])
    # hash entry gone -> re-allocatable
    from ra_slam_tpu.map.hash_table import ht_lookup

    assert int(ht_lookup(m.table, keys[:1])[0]) == -1
    m = allocate_keys(m, keys[:1])
    assert int(ht_lookup(m.table, keys[:1])[0]) >= 0


def test_gather_formats():
    m = create_map(CFG)
    m = allocate_keys(m, pack_block_coords(jnp.array([[1, 1, 5]], dtype=jnp.int32)))
    r4 = gather_valid(m, CFG)
    r5 = gather_valid_semantic(m, CFG)
    assert r4.shape == (512, 4) and r4.dtype == np.float32
    assert r5.shape == (512, 5) and r5.dtype == np.float32
    # world positions = grid * voxel_size, block base at (8,8,40)*0.02
    np.testing.assert_allclose(r4[:, :3].min(axis=0), [0.16, 0.16, 0.80], atol=1e-6)


def test_integrate_frame_jits_once():
    m = create_map(CFG)
    rgb, depth, ht, lt = wall_frame(1.2)
    f = jax.jit(
        lambda mm, d: integrate_frame(mm, rgb, d, ht, lt, CAM, SE3.identity(), CFG)[0]
    )
    m = f(m, depth)
    m = f(m, depth * 0.9)
    assert int(num_active(m)) > 0


def test_free_stack_conservation():
    """The free stack and the active set partition the pool through
    alloc -> carve -> realloc cycles: num_active + free_top == N, the
    stacked rows are exactly the inactive ones, and no row is ever
    handed out twice (voxel_map.py free-stack allocator)."""
    m = create_map(CFG)
    n = m.num_blocks

    def check(m):
        top = int(m.free_top)
        assert int(num_active(m)) + top == n
        stacked = np.asarray(m.free_stack)[:top]
        assert len(np.unique(stacked)) == top  # no duplicates
        assert not np.asarray(m.active)[stacked].any()  # all genuinely free

    check(m)
    keys = pack_block_coords(
        jnp.stack(jnp.meshgrid(*[jnp.arange(4, dtype=jnp.int32)] * 3),
                  axis=-1).reshape(-1, 3)
    )
    m = allocate_keys(m, keys)  # 64 blocks
    check(m)
    assert int(num_active(m)) == 64

    # carve everything (fresh blocks hold tsdf=-1 -> |tsdf|=1 >=
    # carve_threshold -> all released). Rows pop off the stack TOP, so
    # find the active rows instead of assuming they start at 0.
    act_rows = np.nonzero(np.asarray(m.active))[0]
    vis_idx = jnp.asarray(
        np.pad(act_rows, (0, 128 - len(act_rows))), jnp.int32
    )
    vis_mask = jnp.arange(128) < len(act_rows)
    m = space_carve(m, vis_idx, vis_mask, CFG)
    check(m)
    assert int(num_active(m)) == 0

    # re-allocate different keys: rows come back off the stack
    keys2 = pack_block_coords(
        jnp.stack(jnp.meshgrid(*[jnp.arange(3, dtype=jnp.int32) + 9] * 3),
                  axis=-1).reshape(-1, 3)
    )
    m = allocate_keys(m, keys2)
    check(m)
    assert int(num_active(m)) == 27
