"""Isosurface mesh extraction from the TSDF map.

Capability parity with the reference's marching-cubes pipeline
(`/root/reference/utils/tsdf/voxel_tsdf.cu:561-845`: per-block kernel
with 2x2x2 block-neighborhood shared memory, 256-case LUT, vertex
ownership + two prefix-sum compactions), with a TPU-native redesign:

  - **Marching tetrahedra** instead of the 256-case marching-cubes LUT:
    each cube splits into 6 tetrahedra around its main diagonal; each
    tet triangulates from a tiny 16-case table derived from first
    principles in this file. Same isosurface, simpler and fully
    branch-free/vectorizable. Triangles emit their own 3 vertices
    (no cross-block ownership protocol); downstream tools that care
    (e.g. the reference's `mesh_processor.py` vertex clustering) merge
    duplicates anyway.
  - Block neighborhoods (a [9,9,9] halo grid per block — the exact
    analog of the reference's shared-mem load, voxel_tsdf.cu:583-586)
    are gathered with 7 batched hash lookups per block.
  - Compaction happens host-side in numpy on the export path (this is
    not a hot kernel; the reference also does a D2H copy here).

Binary outputs match `TSDFSystem::DownloadAllMesh`
(`/root/reference/modules/tsdf_module.cc:66-86`): float32 xyz vertex
rows, int32 index triples, float32 per-vertex semantic probabilities.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.core.config import TsdfConfig
from ra_slam_tpu.map.blocks import (
    BLOCK_LEN,
    pack_block_coords,
    unpack_block_coords,
)
from ra_slam_tpu.map.hash_table import ht_lookup
from ra_slam_tpu.map.voxel_map import VoxelMap

# Cube corners: bit0 -> +x, bit1 -> +y, bit2 -> +z.
_CORNER_OFFS = np.array(
    [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], dtype=np.float32
)

# Six tetrahedra sharing the 0-7 main diagonal.
_TETS = np.array(
    [[0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7], [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]],
    dtype=np.int32,
)

# Tet edges as (corner, corner) index pairs into the tet's 4 corners.
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int32
)

# 16-case table: for each inside-bitmask (bit i = tet corner i has
# tsdf < 0), up to two triangles of tet-edge ids (-1 = unused).
# Derived by enumeration: 1 or 3 corners inside -> one triangle of the
# three edges incident to the lone corner; 2 inside -> quad across the
# four separating edges, split into two triangles.
_TET_TRIS = np.array(
    [
        [[-1, -1, -1], [-1, -1, -1]],  # 0000
        [[0, 1, 2], [-1, -1, -1]],     # 0001 a
        [[0, 3, 4], [-1, -1, -1]],     # 0010 b
        [[1, 2, 4], [1, 4, 3]],        # 0011 ab
        [[1, 3, 5], [-1, -1, -1]],     # 0100 c
        [[0, 2, 5], [0, 5, 3]],        # 0101 ac
        [[0, 5, 1], [0, 4, 5]],        # 0110 bc
        [[2, 5, 4], [-1, -1, -1]],     # 0111 abc
        [[2, 4, 5], [-1, -1, -1]],     # 1000 d
        [[0, 1, 5], [0, 5, 4]],        # 1001 ad
        [[0, 5, 2], [0, 3, 5]],        # 1010 bd
        [[1, 5, 3], [-1, -1, -1]],     # 1011 abd
        [[1, 4, 2], [1, 3, 4]],        # 1100 cd
        [[0, 4, 3], [-1, -1, -1]],     # 1101 acd
        [[0, 2, 1], [-1, -1, -1]],     # 1110 bcd
        [[-1, -1, -1], [-1, -1, -1]],  # 1111
    ],
    dtype=np.int32,
)

_NBR_OFFS = np.array(
    [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
    dtype=np.int32,
)

MAX_TRIS_PER_BLOCK = BLOCK_LEN**3 * 12  # 6 tets x 2 tris per cube


def _to_xyz(flat_block: jax.Array) -> jax.Array:
    """[512(,C)] voxel payload (idx = x + 8y + 64z) -> [8,8,8(,C)] xyz grid."""
    shp = (BLOCK_LEN, BLOCK_LEN, BLOCK_LEN) + flat_block.shape[1:]
    return jnp.moveaxis(flat_block.reshape(shp), (0, 1, 2), (2, 1, 0))


def _gather_halo(m: VoxelMap, bidx: jax.Array, nbr_idx: jax.Array, field: jax.Array, fill: float):
    """Build the [B, 9, 9, 9] halo grid of `field` ([N,512]) for blocks
    bidx [B] with neighbor pool indices nbr_idx [B, 7] (-1 = missing)."""
    B = bidx.shape[0]
    n = field.shape[0]

    def fetch(idx):  # [B] -> [B,8,8,8], missing -> fill
        safe = jnp.where(idx >= 0, idx, n)
        padded = jnp.concatenate(
            [field, jnp.full((1, field.shape[1]), fill, field.dtype)], axis=0
        )
        return jax.vmap(_to_xyz)(padded[safe])

    own = fetch(bidx)
    nx, ny, nz, nxy, nxz, nyz, nxyz = [fetch(nbr_idx[:, i]) for i in range(7)]

    g = jnp.full((B, 9, 9, 9), fill, dtype=field.dtype)
    g = g.at[:, :8, :8, :8].set(own)
    g = g.at[:, 8, :8, :8].set(nx[:, 0, :, :])
    g = g.at[:, :8, 8, :8].set(ny[:, :, 0, :])
    g = g.at[:, :8, :8, 8].set(nz[:, :, :, 0])
    g = g.at[:, 8, 8, :8].set(nxy[:, 0, 0, :])
    g = g.at[:, 8, :8, 8].set(nxz[:, 0, :, 0])
    g = g.at[:, :8, 8, 8].set(nyz[:, :, 0, 0])
    g = g.at[:, 8, 8, 8].set(nxyz[:, 0, 0, 0])
    return g


def _mesh_block(tsdf9, weight9, prob9, base_voxel, voxel_size, min_weight):
    """Triangulate one block from its [9,9,9] halo grids.

    Returns (verts [4608*3, 3] world, probs [4608*3], valid [4608] per-tri).
    """
    # cube corner samples: [8,8,8,8cor]
    def corners(g):
        return jnp.stack(
            [
                g[cx : cx + 8, cy : cy + 8, cz : cz + 8]
                for cx, cy, cz in _CORNER_OFFS.astype(np.int32)
            ],
            axis=-1,
        )

    ct = corners(tsdf9).reshape(-1, 8)  # [512, 8]
    cw = corners(weight9).reshape(-1, 8)
    cp = corners(prob9).reshape(-1, 8)
    cube_ok = jnp.all(cw >= min_weight, axis=-1)  # observed corners only

    # cube base coords in voxel units, [512, 3]. The corner arrays come
    # from reshape(-1) of [x, y, z]-indexed grids, so x is the SLOWEST
    # axis here (z fastest).
    cube_idx = jnp.arange(512)
    cube_xyz = jnp.stack(
        [cube_idx // 64, (cube_idx // 8) % 8, cube_idx % 8], axis=-1
    ).astype(jnp.float32)

    all_pos = []
    all_prob = []
    all_valid = []
    corner_pos = jnp.asarray(_CORNER_OFFS)  # [8, 3]

    for tet in _TETS:
        t4 = ct[:, tet]  # [512, 4]
        p4 = cp[:, tet]
        pos4 = corner_pos[tet]  # [4, 3]
        inside = (t4 < 0).astype(jnp.int32)
        case = inside[:, 0] + 2 * inside[:, 1] + 4 * inside[:, 2] + 8 * inside[:, 3]

        # crossings on the 6 tet edges
        ia, ib = _TET_EDGES[:, 0], _TET_EDGES[:, 1]
        ta, tb = t4[:, ia], t4[:, ib]  # [512, 6]
        denom = ta - tb
        u = jnp.where(jnp.abs(denom) > 1e-9, ta / denom, 0.5)
        u = jnp.clip(u, 0.0, 1.0)
        pa, pb = pos4[ia], pos4[ib]  # [6, 3]
        xpos = pa[None] + u[..., None] * (pb - pa)[None]  # [512, 6, 3]
        xprob = p4[:, ia] + u * (p4[:, ib] - p4[:, ia])  # [512, 6]

        tri_edges = jnp.asarray(_TET_TRIS)[case]  # [512, 2, 3]
        evalid = tri_edges[..., 0] >= 0  # [512, 2]
        flat_e = jnp.maximum(tri_edges, 0).reshape(512, 6)  # 2 tris x 3 verts
        vpos = jnp.take_along_axis(xpos, flat_e[..., None], axis=1)  # [512, 6, 3]
        vprob = jnp.take_along_axis(xprob, flat_e, axis=1)  # [512, 6]
        all_pos.append(vpos.reshape(512, 2, 3, 3) + cube_xyz[:, None, None, :])
        all_prob.append(vprob.reshape(512, 2, 3))
        all_valid.append(evalid & cube_ok[:, None])

    pos = jnp.concatenate(all_pos, axis=1)  # [512, 12, 3, 3]
    prob = jnp.concatenate(all_prob, axis=1)  # [512, 12, 3]
    valid = jnp.concatenate(all_valid, axis=1)  # [512, 12]

    world = (pos + base_voxel[None, None, None, :].astype(jnp.float32)) * voxel_size
    return (
        world.reshape(-1, 3),
        prob.reshape(-1),
        valid.reshape(-1),
    )


@partial(jax.jit, static_argnames=("voxel_size", "min_weight"))
def _mesh_chunk(m: VoxelMap, bidx: jax.Array, voxel_size: float, min_weight: float):
    """Triangulate a chunk of blocks bidx [B] (pad with -1)."""
    keys = jnp.where(bidx >= 0, m.block_key[jnp.maximum(bidx, 0)], 0)
    coords = unpack_block_coords(keys)  # [B, 3]
    nbr_keys = pack_block_coords(coords[:, None, :] + jnp.asarray(_NBR_OFFS)[None])
    nbr_idx = ht_lookup(m.table, nbr_keys.reshape(-1)).reshape(nbr_keys.shape)

    t9 = _gather_halo(m, bidx, nbr_idx, m.tsdf, 1.0)
    w9 = _gather_halo(m, bidx, nbr_idx, m.weight, 0.0)
    p9 = _gather_halo(m, bidx, nbr_idx, m.prob, 0.5)
    base = coords * BLOCK_LEN

    verts, probs, valid = jax.vmap(
        lambda a, b, c, d: _mesh_block(a, b, c, d, voxel_size, min_weight)
    )(t9, w9, p9, base)
    valid = valid & (bidx >= 0)[:, None]
    return verts, probs, valid


def extract_mesh(
    m: VoxelMap,
    cfg: TsdfConfig,
    min_weight: float = 1.5,
    chunk: int = 256,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract the full mesh. Returns (vertices [V,3] f32,
    indices [T,3] i32, vertex_probs [V] f32) with V = 3T (vertices are
    emitted per-triangle; see module docstring)."""
    active = np.nonzero(np.asarray(m.active))[0].astype(np.int32)
    vs, ps = [], []
    for s in range(0, len(active), chunk):
        part = active[s : s + chunk]
        pad = np.full(chunk - len(part), -1, dtype=np.int32)
        bidx = jnp.asarray(np.concatenate([part, pad]))
        verts, probs, valid = _mesh_chunk(m, bidx, cfg.voxel_size, min_weight)
        v = np.asarray(verts).reshape(chunk, -1, 3, 3)
        p = np.asarray(probs).reshape(chunk, -1, 3)
        ok = np.asarray(valid).reshape(chunk, -1)
        vs.append(v[ok].reshape(-1, 3))
        ps.append(p[ok].reshape(-1))
    if vs:
        vertices = np.concatenate(vs).astype(np.float32)
        probs = np.concatenate(ps).astype(np.float32)
    else:
        vertices = np.zeros((0, 3), np.float32)
        probs = np.zeros((0,), np.float32)
    indices = np.arange(len(vertices), dtype=np.int32).reshape(-1, 3)
    return vertices, indices, probs


def save_mesh(
    vertices: np.ndarray,
    indices: np.ndarray,
    probs: np.ndarray,
    vertices_path: str,
    indices_path: str,
    prob_path: str,
) -> None:
    """Write the reference's binary mesh dump format
    (`/root/reference/modules/tsdf_module.cc:66-86`)."""
    vertices.astype(np.float32).tofile(vertices_path)
    indices.astype(np.int32).tofile(indices_path)
    probs.astype(np.float32).tofile(prob_path)
