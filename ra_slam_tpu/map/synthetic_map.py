"""Analytic map construction for benchmarks and profiling.

Builds a `VoxelMap` directly from a signed-distance function instead of
running the camera integration path. The bench scene (the box room in
`io/synthetic.py`) has a closed-form SDF, so a map with the same active
set / surface statistics as 60 fused frames can be materialized in one
allocation call plus one payload-write program — this is what lets the
mesh-extraction pipeline be profiled and tuned without paying the fused
integrate step's multi-minute remote compile first
(the reference profiles its mesh kernels the same way: standalone, on a
pre-built TSDF volume — `/root/reference/utils/tsdf/voxel_tsdf.cu`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.core.config import TsdfConfig
from ra_slam_tpu.map.blocks import BLOCK_LEN, INVALID_KEY, pack_block_coords
from ra_slam_tpu.map.voxel_map import VoxelMap, allocate_keys, create_map


def _box_room_sdf_np(p: np.ndarray, half_extents) -> np.ndarray:
    """Signed distance to the box-room walls, positive inside the room
    (matches the watertight box interior of `io/synthetic.py`)."""
    hx, hy, hz = half_extents
    return np.minimum(
        np.minimum(hx - np.abs(p[..., 0]), hy - np.abs(p[..., 1])),
        hz - np.abs(p[..., 2]),
    )


def analytic_box_map(
    cfg: TsdfConfig,
    half_extents=(3.0, 2.0, 3.0),
    band: float | None = None,
    weight: float = 40.0,
) -> VoxelMap:
    """A bench-scale map of the box room: every block whose voxels come
    within `band` (default: truncation + half block diagonal) of a wall
    is allocated, and tsdf/weight are written analytically.

    tsdf = clip(sdf / truncation) exactly as the integrate path would
    converge to for a noiseless sensor; weight = `weight` inside the
    truncation band (fused at the clamp, voxel_tsdf.cu:238) and 1
    outside (the free-space initialization value).
    """
    if band is None:
        band = cfg.truncation + BLOCK_LEN * cfg.voxel_size * 0.9

    hx, hy, hz = half_extents
    bs = BLOCK_LEN * cfg.voxel_size
    r = np.array([hx, hy, hz]) / bs
    lo = np.floor(-r - 1).astype(np.int64)
    hi = np.ceil(r + 1).astype(np.int64)
    ax = [np.arange(lo[i], hi[i] + 1, dtype=np.int32) for i in range(3)]
    gx, gy, gz = np.meshgrid(*ax, indexing="ij")
    coords = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    centers = (coords.astype(np.float64) + 0.5) * bs
    sdf = _box_room_sdf_np(centers, half_extents)
    keep = np.abs(sdf) <= band
    coords = coords[keep]

    m = create_map(cfg)
    keys = pack_block_coords(jnp.asarray(coords))
    m = allocate_keys(m, keys, max_new_blocks=min(len(coords), cfg.num_blocks))
    assert int(m.alloc_failures) == 0, "analytic map overflowed the pool"
    return _write_box_payload(m, cfg.voxel_size, cfg.truncation,
                              jnp.asarray(half_extents, jnp.float32),
                              jnp.float32(weight))


@jax.jit
def _write_box_payload(m: VoxelMap, voxel_size, truncation, he, weight):
    """Write tsdf/weight for every active block from the box-room SDF
    (voxel lattice position = (block*8 + offset) * voxel_size, the same
    lattice `map/meshing.py::_decode_vertices` decodes)."""
    from ra_slam_tpu.map.blocks import unpack_block_coords

    coords = unpack_block_coords(jnp.where(m.active, m.block_key, 0))
    v = jnp.arange(512, dtype=jnp.int32)
    off = jnp.stack([v % 8, (v // 8) % 8, v // 64], axis=-1)  # x fastest
    pos = (
        coords[:, None, :].astype(jnp.float32) * BLOCK_LEN + off[None]
    ) * voxel_size  # [N, 512, 3]
    sdf = jnp.min(he[None, None, :] - jnp.abs(pos), axis=-1)
    tsdf = jnp.clip(sdf / truncation, -1.0, 1.0)
    w = jnp.where(jnp.abs(sdf) <= truncation, weight, 1.0)
    act = m.active[:, None]
    return m._replace(
        tsdf=jnp.where(act, tsdf, m.tsdf),
        weight=jnp.where(act, w, m.weight),
        prob=jnp.where(act, 0.5, m.prob),
    )
