"""Raycast rendering of the TSDF map.

TPU-native redesign of the reference's `ray_cast_kernel`
(`/root/reference/utils/tsdf/voxel_tsdf.cu:278-374`): per-pixel sphere
march with zero-crossing detection, trilinear refinement,
central-difference normals, diffuse shading, and a semantic red-alpha
overlay.

The reference marches with a per-ray *adaptive* step (÷10 near the
surface) and chases hash-table pointers per step with a per-thread block
cache. Both are warp-divergence workarounds that map poorly to the VPU.
Here instead:

  1. a dense *block-index grid* (a [G,G,G] int32 array covering the
     mapped region, rebuilt in one scatter per call) turns every
     map lookup into a single gather — no hash probes on the hot path;
  2. the march is a fixed-step `lax.fori_loop` over all rays with
     per-ray done masks (uniform trip count, XLA-friendly), followed by
     one secant refinement + trilinear resample at the crossing.

Outputs match the reference renderer: RGBA image (shaded color +
semantic overlay), normal-shaded image, and a depth map (used by the
pose tracker for frame-to-model alignment, which the reference gets
from OpenVSLAM instead).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ra_slam_tpu.core.camera import PinholeCamera
from ra_slam_tpu.core.config import TsdfConfig
from ra_slam_tpu.core.se3 import SE3
from ra_slam_tpu.map.blocks import BLOCK_LEN, unpack_block_coords
from ra_slam_tpu.map.voxel_map import VoxelMap


class BlockGrid(NamedTuple):
    """Dense [G, G, G] int32 block-index grid (-1 = unallocated) with a
    block-space origin; the per-frame acceleration structure."""

    index: jax.Array  # [G, G, G] int32
    origin: jax.Array  # [3] int32 block coords of grid corner

    @property
    def extent(self) -> int:
        return self.index.shape[0]


def build_block_grid(m: VoxelMap, origin_block: jax.Array, extent: int) -> BlockGrid:
    """Scatter active block indices into a dense grid.

    origin_block: [3] int32 — block coords of the grid's corner (choose
    so the camera frustum fits; e.g. camera block - extent/2).
    """
    coords = unpack_block_coords(m.block_key) - origin_block  # [N, 3]
    inb = m.active & jnp.all((coords >= 0) & (coords < extent), axis=-1)
    flat = (coords[:, 0] * extent + coords[:, 1]) * extent + coords[:, 2]
    flat = jnp.where(inb, flat, extent**3)
    grid = jnp.full((extent**3,), -1, dtype=jnp.int32)
    grid = grid.at[flat].set(
        jnp.arange(m.num_blocks, dtype=jnp.int32), mode="drop"
    )
    return BlockGrid(grid.reshape(extent, extent, extent), origin_block)


def _lookup_voxel(
    m: VoxelMap, grid: BlockGrid, vox: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fetch (tsdf, weight, block_idx) at integer voxel coords [..., 3].

    Unallocated space reads tsdf=1 (empty), weight=0.
    """
    g = grid.extent
    b = jnp.floor_divide(vox, BLOCK_LEN) - grid.origin
    off = jnp.mod(vox, BLOCK_LEN)
    inb = jnp.all((b >= 0) & (b < g), axis=-1)
    bc = jnp.clip(b, 0, g - 1)
    bidx = grid.index[bc[..., 0], bc[..., 1], bc[..., 2]]
    bidx = jnp.where(inb, bidx, -1)
    oidx = off[..., 0] + BLOCK_LEN * off[..., 1] + BLOCK_LEN * BLOCK_LEN * off[..., 2]
    safe_b = jnp.maximum(bidx, 0)
    flat = safe_b * (BLOCK_LEN**3) + oidx
    tsdf = jnp.take(m.tsdf.reshape(-1), flat)
    weight = jnp.take(m.weight.reshape(-1), flat)
    ok = bidx >= 0
    return jnp.where(ok, tsdf, 1.0), jnp.where(ok, weight, 0.0), bidx


def _trilinear(
    m: VoxelMap, grid: BlockGrid, pts_vox: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Trilinear TSDF (and min-weight) at continuous voxel coords [..., 3]
    (the reference's `VoxelHashTable::RetrieveTSDF`, voxel_hash.cu:161-188)."""
    p0 = jnp.floor(pts_vox).astype(jnp.int32)
    f = pts_vox - p0
    tsdf = jnp.zeros(pts_vox.shape[:-1], dtype=jnp.float32)
    wmin = jnp.full(pts_vox.shape[:-1], jnp.inf, dtype=jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                c = p0 + jnp.array([dx, dy, dz], dtype=jnp.int32)
                t, w, _ = _lookup_voxel(m, grid, c)
                wx = f[..., 0] if dx else 1.0 - f[..., 0]
                wy = f[..., 1] if dy else 1.0 - f[..., 1]
                wz = f[..., 2] if dz else 1.0 - f[..., 2]
                tsdf = tsdf + t * wx * wy * wz
                wmin = jnp.minimum(wmin, w)
    return tsdf, wmin


def _sample_payload(m: VoxelMap, grid: BlockGrid, vox: jax.Array):
    """Nearest-voxel rgb + semantic prob at integer voxel coords."""
    g = grid.extent
    b = jnp.floor_divide(vox, BLOCK_LEN) - grid.origin
    off = jnp.mod(vox, BLOCK_LEN)
    inb = jnp.all((b >= 0) & (b < g), axis=-1)
    bc = jnp.clip(b, 0, g - 1)
    bidx = grid.index[bc[..., 0], bc[..., 1], bc[..., 2]]
    bidx = jnp.where(inb, bidx, -1)
    oidx = off[..., 0] + BLOCK_LEN * off[..., 1] + BLOCK_LEN * BLOCK_LEN * off[..., 2]
    flat = jnp.maximum(bidx, 0) * (BLOCK_LEN**3) + oidx
    rgb = jnp.take(m.rgb.reshape(-1, 3), flat, axis=0)
    prob = jnp.take(m.prob.reshape(-1), flat)
    ok = (bidx >= 0)[..., None]
    return jnp.where(ok, rgb, 0.0), jnp.where(ok[..., 0], prob, 0.5)


def raycast(
    m: VoxelMap,
    cam: PinholeCamera,
    cam_T_world: SE3,
    cfg: TsdfConfig,
    grid_extent: int = 128,
    step_scale: float = 0.5,
) -> dict:
    """Render the map from a virtual camera.

    Returns dict with 'depth' [H,W], 'rgba' [H,W,4] (uint8-range float),
    'normal' [H,W,3], 'hit' [H,W] bool.
    """
    H, W = cam.height, cam.width
    world_T_cam = cam_T_world.inverse()
    origin_w = world_T_cam.t  # camera center in world

    block_size = BLOCK_LEN * cfg.voxel_size
    cam_block = jnp.floor(origin_w / block_size).astype(jnp.int32)
    grid = build_block_grid(m, cam_block - grid_extent // 2, grid_extent)

    uv = cam.pixel_grid().reshape(-1, 2)  # [P, 2]
    dirs_cam = cam.unproject(uv, jnp.ones(uv.shape[0]))
    dirs_cam = dirs_cam / jnp.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    dirs_w = world_T_cam.rotate(dirs_cam)  # [P, 3]

    step = cfg.truncation * step_scale
    n_steps = int((cfg.max_depth - cfg.min_depth) / step) + 2
    inv_vox = 1.0 / cfg.voxel_size

    def body(i, carry):
        t_hit, prev_tsdf, prev_t, done = carry
        t = cfg.min_depth + i * step
        pts = origin_w + dirs_w * t
        vox = jnp.floor(pts * inv_vox).astype(jnp.int32)
        tsdf, w, _ = _lookup_voxel(m, grid, vox)
        observed = w >= cfg.raycast_min_weight
        # zero crossing: previous sample in front (tsdf > 0), current behind
        cross = (~done) & observed & (prev_tsdf > 0) & (tsdf < 0)
        denom = prev_tsdf - tsdf
        frac = jnp.where(jnp.abs(denom) > 1e-9, prev_tsdf / denom, 0.5)
        t_new = prev_t + frac * (t - prev_t)
        t_hit = jnp.where(cross, t_new, t_hit)
        done = done | cross
        # unobserved samples don't update the crossing state (the
        # reference skips weight<10 voxels the same way)
        prev_tsdf = jnp.where(observed & ~done, tsdf, prev_tsdf)
        prev_t = jnp.where(observed & ~done, t, prev_t)
        return t_hit, prev_tsdf, prev_t, done

    P = uv.shape[0]
    init = (
        jnp.zeros(P),
        jnp.full((P,), 1.0),
        jnp.full((P,), cfg.min_depth),
        jnp.zeros(P, dtype=bool),
    )
    t_hit, _, _, hit = jax.lax.fori_loop(0, n_steps, body, init)

    # refine + shade at hits
    pts_hit = origin_w + dirs_w * t_hit[:, None]
    pv = pts_hit * inv_vox
    # central-difference normals from trilinear tsdf (reference: 6 extra
    # lookups, voxel_tsdf.cu:334-345)
    eps = 1.0  # one voxel
    grads = []
    for ax in range(3):
        e = jnp.zeros(3).at[ax].set(eps)
        tp, _ = _trilinear(m, grid, pv + e)
        tm, _ = _trilinear(m, grid, pv - e)
        grads.append(tp - tm)
    normal = jnp.stack(grads, axis=-1)
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nn, 1e-9)

    rgb, prob = _sample_payload(m, grid, jnp.round(pv).astype(jnp.int32))
    # diffuse shading + semantic red-alpha overlay (voxel_tsdf.cu:346-360)
    diffuse = jnp.abs(jnp.sum(normal * dirs_w, axis=-1))
    shaded = rgb * diffuse[:, None]
    alpha = jnp.clip((prob - 0.5) * 2.0, 0.0, 1.0)
    red = jnp.array([255.0, 0.0, 0.0])
    overlaid = shaded * (1 - alpha[:, None]) + red[None] * alpha[:, None]

    hitf = hit.astype(jnp.float32)
    rgba = jnp.concatenate([overlaid * hitf[:, None], hitf[:, None] * 255.0], axis=-1)
    depth = jnp.where(hit, t_hit * jnp.abs(dirs_cam[:, 2]), 0.0)  # range -> z

    return {
        "depth": depth.reshape(H, W),
        "rgba": rgba.reshape(H, W, 4),
        "normal": (normal * hitf[:, None]).reshape(H, W, 3),
        "hit": hit.reshape(H, W),
    }
