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

    Returns (verts [4608*3, 3] world, probs [4608*3], valid [4608] per-tri,
    edges [4608*3, 2, 3] int32 global lattice endpoints of the voxel-grid
    edge each vertex lies on — the exact shared-vertex identity used for
    index compaction, replacing the reference's per-voxel vertex-ownership
    scheme, `/root/reference/utils/tsdf/voxel_tsdf.cu:561-715`).
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
    all_edge = []
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
        # global integer lattice endpoints of each crossing edge [512,6,2,3]
        ep = (
            jnp.stack([pa, pb], axis=1)[None].astype(jnp.int32)
            + cube_xyz[:, None, None, :].astype(jnp.int32)
            + base_voxel[None, None, None, :].astype(jnp.int32)
        )
        ep = jnp.broadcast_to(ep, (512, 6, 2, 3))

        tri_edges = jnp.asarray(_TET_TRIS)[case]  # [512, 2, 3]
        evalid = tri_edges[..., 0] >= 0  # [512, 2]
        flat_e = jnp.maximum(tri_edges, 0).reshape(512, 6)  # 2 tris x 3 verts
        vpos = jnp.take_along_axis(xpos, flat_e[..., None], axis=1)  # [512, 6, 3]
        vprob = jnp.take_along_axis(xprob, flat_e, axis=1)  # [512, 6]
        vedge = jnp.take_along_axis(
            ep, flat_e[..., None, None], axis=1
        )  # [512, 6, 2, 3]
        all_pos.append(vpos.reshape(512, 2, 3, 3) + cube_xyz[:, None, None, :])
        all_prob.append(vprob.reshape(512, 2, 3))
        all_valid.append(evalid & cube_ok[:, None])
        all_edge.append(vedge.reshape(512, 2, 3, 2, 3))

    pos = jnp.concatenate(all_pos, axis=1)  # [512, 12, 3, 3]
    prob = jnp.concatenate(all_prob, axis=1)  # [512, 12, 3]
    valid = jnp.concatenate(all_valid, axis=1)  # [512, 12]
    edge = jnp.concatenate(all_edge, axis=1)  # [512, 12, 3, 2, 3]

    world = (pos + base_voxel[None, None, None, :].astype(jnp.float32)) * voxel_size
    return (
        world.reshape(-1, 3),
        prob.reshape(-1),
        valid.reshape(-1),
        edge.reshape(-1, 2, 3),
    )


@partial(jax.jit, static_argnames=("voxel_size", "min_weight", "cap"))
def _mesh_chunk(
    m: VoxelMap, bidx: jax.Array, voxel_size: float, min_weight: float,
    cap: int,
):
    """Triangulate a chunk of blocks bidx [B] (pad with -1) and compact
    the valid triangles on-device (cumsum-scatter) so only real surface
    data crosses the device->host boundary — the analog of the
    reference's prefix-sum mesh compaction before its D2H copy
    (`/root/reference/utils/tsdf/voxel_tsdf.cu:736-845`).

    Returns (verts [cap,3,3], probs [cap,3], edges [cap,3,2,3],
    n_valid scalar). n_valid > cap signals overflow (caller splits).
    """
    keys = jnp.where(bidx >= 0, m.block_key[jnp.maximum(bidx, 0)], 0)
    coords = unpack_block_coords(keys)  # [B, 3]
    nbr_keys = pack_block_coords(coords[:, None, :] + jnp.asarray(_NBR_OFFS)[None])
    nbr_idx = ht_lookup(m.table, nbr_keys.reshape(-1)).reshape(nbr_keys.shape)

    t9 = _gather_halo(m, bidx, nbr_idx, m.tsdf, 1.0)
    w9 = _gather_halo(m, bidx, nbr_idx, m.weight, 0.0)
    p9 = _gather_halo(m, bidx, nbr_idx, m.prob, 0.5)
    base = coords * BLOCK_LEN

    verts, probs, valid, edges = jax.vmap(
        lambda a, b, c, d: _mesh_block(a, b, c, d, voxel_size, min_weight)
    )(t9, w9, p9, base)
    valid = (valid & (bidx >= 0)[:, None]).reshape(-1)  # [B*4608] per-tri
    tri_v = verts.reshape(-1, 3, 3)
    tri_p = probs.reshape(-1, 3)
    tri_e = edges.reshape(-1, 3, 2, 3)

    n_valid = jnp.sum(valid.astype(jnp.int32))
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    dest = jnp.where(valid & (rank < cap), rank, cap)
    out_v = jnp.zeros((cap, 3, 3), tri_v.dtype).at[dest].set(tri_v, mode="drop")
    out_p = jnp.zeros((cap, 3), tri_p.dtype).at[dest].set(tri_p, mode="drop")
    out_e = jnp.zeros((cap, 3, 2, 3), tri_e.dtype).at[dest].set(
        tri_e, mode="drop"
    )
    return out_v, out_p, out_e, n_valid


def _pack_endpoints(edges: np.ndarray) -> np.ndarray:
    """[V, 2, 3] int endpoint lattice coords -> [V] canonical edge key.

    Each endpoint packs into 63 bits (21 bits/axis, offset-binary); the
    unordered pair is canonicalized by sorting, then combined into one
    16-byte row viewed as a void scalar for `np.unique`.
    """
    e = edges.astype(np.int64) + (1 << 20)
    packed = (e[..., 0] << 42) | (e[..., 1] << 21) | e[..., 2]  # [V, 2]
    lo = np.minimum(packed[:, 0], packed[:, 1])
    hi = np.maximum(packed[:, 0], packed[:, 1])
    key = np.ascontiguousarray(np.stack([lo, hi], axis=-1))
    return key.view([("lo", "<i8"), ("hi", "<i8")]).reshape(-1)


def extract_mesh(
    m: VoxelMap,
    cfg: TsdfConfig,
    min_weight: float = 1.5,
    chunk: int = 256,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract the full mesh with shared-vertex compaction.

    Returns (vertices [V,3] f32, indices [T,3] i32, vertex_probs [V] f32).
    Every isosurface vertex lies on a unique voxel-grid edge; vertices are
    deduplicated by exact edge identity (sort-unique over packed endpoint
    keys — the same batch-dedup trick as block allocation), so V ≈ T/2
    like the reference's vertex-ownership + compaction scheme
    (`/root/reference/utils/tsdf/voxel_tsdf.cu:561-734`) instead of 3T.
    """
    active = np.nonzero(np.asarray(m.active))[0].astype(np.int32)
    vs, ps, es = [], [], []

    def mesh_part(part: np.ndarray, csize: int):
        """Mesh `part` (<= csize blocks) at chunk size csize; split on
        triangle-cap overflow (a single block's 6144-tri worst case
        always fits csize >= 8)."""
        cap = csize * 768  # ~1/8 of the worst case; generous for surfaces
        pad = np.full(csize - len(part), -1, dtype=np.int32)
        bidx = jnp.asarray(np.concatenate([part, pad]))
        verts, probs, edges, n_valid = _mesh_chunk(
            m, bidx, cfg.voxel_size, min_weight, cap
        )
        n = int(n_valid)
        if n > cap:
            if len(part) == 1:  # cap >= 768 < 6144: force a big-cap pass
                verts, probs, edges, n_valid = _mesh_chunk(
                    m, jnp.asarray(part), cfg.voxel_size, min_weight,
                    MAX_TRIS_PER_BLOCK,
                )
                n = int(n_valid)
            else:
                h = len(part) // 2
                mesh_part(part[:h], csize)
                mesh_part(part[h:], csize)
                return
        vs.append(np.asarray(verts[:n]).reshape(-1, 3))
        ps.append(np.asarray(probs[:n]).reshape(-1))
        es.append(np.asarray(edges[:n]).reshape(-1, 2, 3))

    for s in range(0, len(active), chunk):
        mesh_part(active[s : s + chunk], chunk)
    if not vs:
        return (
            np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.int32),
            np.zeros((0,), np.float32),
        )
    flat_v = np.concatenate(vs).astype(np.float32)  # [3T, 3]
    flat_p = np.concatenate(ps).astype(np.float32)  # [3T]
    keys = _pack_endpoints(np.concatenate(es))  # [3T]

    _, first, inverse = np.unique(keys, return_index=True, return_inverse=True)
    vertices = flat_v[first]
    probs = flat_p[first]
    indices = inverse.astype(np.int32).reshape(-1, 3)
    # drop triangles degenerated by the dedup (two corners on one edge)
    nondeg = (
        (indices[:, 0] != indices[:, 1])
        & (indices[:, 1] != indices[:, 2])
        & (indices[:, 0] != indices[:, 2])
    )
    return vertices, indices[nondeg], probs


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
