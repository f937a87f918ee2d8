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

# triangles emitted per tet inside-case (0, 1 or 2) — for the sizing pass
_TET_TRI_COUNT = (_TET_TRIS[:, :, 0] >= 0).sum(axis=1).astype(np.int32)


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


def _count_block(tsdf9, weight9, min_weight):
    """Exact triangle count for one block from its halo grids — the
    sizing pass (the analog of the reference's count-then-gather
    prefix-sum scheme, `/root/reference/utils/tsdf/voxel_tsdf.cu:736-845`,
    which also runs the kernel once to count before compaction)."""

    def corners(g):
        return jnp.stack(
            [
                g[cx : cx + 8, cy : cy + 8, cz : cz + 8]
                for cx, cy, cz in _CORNER_OFFS.astype(np.int32)
            ],
            axis=-1,
        )

    ct = corners(tsdf9).reshape(-1, 8)
    cw = corners(weight9).reshape(-1, 8)
    cube_ok = jnp.all(cw >= min_weight, axis=-1)
    counts = jnp.asarray(_TET_TRI_COUNT)
    total = jnp.int32(0)
    for tet in _TETS:
        t4 = ct[:, tet]
        inside = (t4 < 0).astype(jnp.int32)
        case = inside[:, 0] + 2 * inside[:, 1] + 4 * inside[:, 2] + 8 * inside[:, 3]
        total = total + jnp.sum(jnp.where(cube_ok, counts[case], 0))
    return total


@partial(jax.jit, static_argnames=("min_weight",))
def _count_chunk(
    m: VoxelMap, bidx: jax.Array, min_weight: float
) -> jax.Array:
    """Exact per-block triangle counts [chunk] for one chunk of blocks."""
    keys = jnp.where(bidx >= 0, m.block_key[jnp.maximum(bidx, 0)], 0)
    coords = unpack_block_coords(keys)
    nbr_keys = pack_block_coords(
        coords[:, None, :] + jnp.asarray(_NBR_OFFS)[None]
    )
    nbr_idx = ht_lookup(m.table, nbr_keys.reshape(-1)).reshape(
        nbr_keys.shape
    )
    t9 = _gather_halo(m, bidx, nbr_idx, m.tsdf, 1.0)
    w9 = _gather_halo(m, bidx, nbr_idx, m.weight, 0.0)
    c = jax.vmap(lambda a, b: _count_block(a, b, min_weight))(t9, w9)
    return jnp.where(bidx >= 0, c, 0)


def _surface_census(m: VoxelMap, min_weight: float, chunk: int):
    """Per-surface-block pool indices + triangle counts.

    Host-driven chunk loop over ACTIVE blocks (see `_mesh_chunk` for the
    rationale); returns numpy (surf_idx [S], surf_counts [S]) covering
    exactly the blocks that emit >= 1 triangle, in pool-compaction order
    — the analog of the reference's count-then-gather prefix-sum scheme
    (`/root/reference/utils/tsdf/voxel_tsdf.cu:736-845`)."""
    order, n_active = _active_order(m)
    n_act = int(n_active)
    n_chunks = max(1, (n_act + chunk - 1) // chunk)
    order = jnp.concatenate([order, jnp.full((chunk,), -1, jnp.int32)])
    counts = []
    for c in range(n_chunks):
        bidx = jax.lax.dynamic_slice(order, (c * chunk,), (chunk,))
        counts.append(_count_chunk(m, bidx, min_weight))
    # ONE device->host round-trip for all chunks (per-chunk np.asarray
    # would pay the remote-tunnel RTT n_chunks times)
    counts = np.asarray(jnp.concatenate(counts))
    order_np = np.asarray(order[: n_chunks * chunk])
    surf = counts > 0
    return order_np[surf], counts[surf]


def _count_device(m: VoxelMap, min_weight: float, chunk: int) -> int:
    """Total isosurface triangle count (kept for tests/back-compat)."""
    _, surf_counts = _surface_census(m, min_weight, chunk)
    return int(surf_counts.sum())


def _pack_edge_keys(edges: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[T, 2, 3] int32 endpoint lattice coords -> canonical (hi, lo)
    uint32 key pair per edge.

    Both endpoints are corners of one lattice cube, so after choosing the
    lexicographically smaller endpoint as the base the per-axis delta is
    in {-1, 0, 1}: key = [x:19][y:19][z:19][delta:5] over 62 bits, split
    into two uint32 lanes (TPU-friendly — no int64 anywhere).
    """
    e = (edges + (1 << 18)).astype(jnp.uint32)  # offset-binary, 19 bits
    packed = (
        (e[..., 0] << jnp.uint32(13))
        ^ (e[..., 1] << jnp.uint32(3))
        ^ e[..., 2]
    )  # order proxy only
    a_first = packed[:, 0] <= packed[:, 1]
    base = jnp.where(a_first[:, None], e[:, 0], e[:, 1])
    other = jnp.where(a_first[:, None], e[:, 1], e[:, 0])
    d = other.astype(jnp.int32) - base.astype(jnp.int32) + 1  # {0,1,2}
    d5 = (d[:, 0] * 9 + d[:, 1] * 3 + d[:, 2]).astype(jnp.uint32)  # < 27
    x, y, z = base[:, 0], base[:, 1], base[:, 2]
    hi = (x << jnp.uint32(13)) | (y >> jnp.uint32(6))
    lo = (
        ((y & jnp.uint32(0x3F)) << jnp.uint32(26))
        | (z << jnp.uint32(7))
        | d5
    )
    return hi, lo


@jax.jit
def _active_order(m: VoxelMap):
    """Compacted active block indices [N] (-1 padding) + active count."""
    N = m.num_blocks
    act = m.active
    rank = jnp.cumsum(act.astype(jnp.int32)) - 1
    dest = jnp.where(act, rank, N)
    n_active = jnp.sum(act.astype(jnp.int32))
    order = jnp.full((N,), -1, jnp.int32).at[dest].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    return order, n_active


@partial(
    jax.jit,
    static_argnames=("voxel_size", "min_weight", "c_max"),
    donate_argnums=(2, 3, 4, 5),
)
def _mesh_chunk(
    m: VoxelMap,
    bidx: jax.Array,
    buf_v: jax.Array,
    buf_p: jax.Array,
    buf_hi: jax.Array,
    buf_lo: jax.Array,
    offset: jax.Array,
    voxel_size: float,
    min_weight: float,
    c_max: int,
):
    """Triangulate one chunk of SURFACE blocks and append the valid
    triangles into the (donated, in-place) global buffers at `offset`.

    Host-driven chunk loop instead of one `lax.scan` device program:
    the 512-iteration scan was a minutes-long single program that the
    remote TPU worker killed ("worker crashed or restarted"), and it
    swept every POOL slot; the census-driven loop visits only blocks
    that emit triangles.

    Compaction is a SORT + contiguous append, not a giant scatter: the
    previous global-buffer scatters processed every one of the
    chunk*4608 candidate slots (~97% invalid) per chunk — 21M scattered
    elements per 256 blocks, measured 141 s for the whole bench map.
    Valid candidate indices sort to the front (ascending, so triangle
    order is preserved), payloads arrive by small gathers at c_max, and
    one dynamic_update_slice appends the run — sentinel-keyed in the
    invalid tail, which the next chunk's append overwrites.

    ALL large buffers are flat 1-D: a TPU f32 tile is (8, 128), so any
    [big, 3] / [big, 3, 3] array pads its minor dims to (4-8,)x(128,) —
    a measured 56.9x expansion that turned the 288 MB vertex buffer
    into a 16 GB allocation (round-3 bench OOM). 1-D arrays pad to the
    next tile only: negligible.

    `c_max` must be >= the chunk's true triangle count (the census is
    exact, so the caller guarantees it); buffers carry c_max slack so
    the final append never clamps.
    """
    keys = jnp.where(bidx >= 0, m.block_key[jnp.maximum(bidx, 0)], 0)
    coords = unpack_block_coords(keys)
    nbr_keys = pack_block_coords(
        coords[:, None, :] + jnp.asarray(_NBR_OFFS)[None]
    )
    nbr_idx = ht_lookup(m.table, nbr_keys.reshape(-1)).reshape(
        nbr_keys.shape
    )
    t9 = _gather_halo(m, bidx, nbr_idx, m.tsdf, 1.0)
    w9 = _gather_halo(m, bidx, nbr_idx, m.weight, 0.0)
    p9 = _gather_halo(m, bidx, nbr_idx, m.prob, 0.5)
    base = coords * BLOCK_LEN

    verts, probs, valid, edges = jax.vmap(
        lambda a, b, c, d: _mesh_block(a, b, c, d, voxel_size, min_weight)
    )(t9, w9, p9, base)
    valid = (valid & (bidx >= 0)[:, None]).reshape(-1)  # [B*4608]
    n_cand = valid.shape[0]
    tri_v = verts.reshape(-1)  # [T*9] tri-major (vertex, coord)
    tri_p = probs.reshape(-1)  # [T*3]
    hi, lo = _pack_edge_keys(edges.reshape(-1, 2, 3))

    # valid candidate indices to the front, original order preserved
    skeys = jax.lax.sort(
        jnp.where(valid, jnp.arange(n_cand, dtype=jnp.int32), n_cand)
    )
    src = jax.lax.slice(skeys, (0,), (c_max,))
    ok = src < n_cand
    srcc = jnp.minimum(src, n_cand - 1)
    src3 = (srcc[:, None] * 3 + jnp.arange(3)[None]).reshape(-1)
    src9 = (srcc[:, None] * 9 + jnp.arange(9)[None]).reshape(-1)
    ok3 = jnp.repeat(ok, 3)
    run_v = jnp.where(jnp.repeat(ok, 9), tri_v[src9], 0.0)
    run_p = jnp.where(ok3, tri_p[src3], 0.0)
    run_hi = jnp.where(ok3, hi.reshape(-1)[src3], jnp.uint32(0xFFFFFFFF))
    run_lo = jnp.where(ok3, lo.reshape(-1)[src3], jnp.uint32(0xFFFFFFFF))

    buf_v = jax.lax.dynamic_update_slice(buf_v, run_v, (offset * 9,))
    buf_p = jax.lax.dynamic_update_slice(buf_p, run_p, (offset * 3,))
    buf_hi = jax.lax.dynamic_update_slice(buf_hi, run_hi, (offset * 3,))
    buf_lo = jax.lax.dynamic_update_slice(buf_lo, run_lo, (offset * 3,))
    offset = offset + jnp.sum(valid.astype(jnp.int32))
    return buf_v, buf_p, buf_hi, buf_lo, offset


def _mesh_device(
    m: VoxelMap,
    voxel_size: float,
    min_weight: float,
    chunk: int,
    max_tris: int,
    surf_idx: np.ndarray | None = None,
    surf_counts: np.ndarray | None = None,
):
    """Emit the whole triangle soup into flat device buffers.

    Returns (buf_v [(cap+c_max)*9], buf_p [...*3], buf_hi, buf_lo,
    n_tris) — see `_mesh_chunk` for the layout and host-loop rationale.
    Buffers carry c_max append slack past `max_tris`.
    """
    if surf_idx is None:
        surf_idx, surf_counts = _surface_census(m, min_weight, chunk)
    n_surf = len(surf_idx)
    n_chunks = max(1, (n_surf + chunk - 1) // chunk)
    pad = n_chunks * chunk - n_surf
    order = jnp.asarray(
        np.concatenate([surf_idx, np.full(pad, -1, np.int32)]).astype(
            np.int32
        )
    ).reshape(n_chunks, chunk)
    # exact per-chunk triangle totals -> power-of-two append width
    csum = np.concatenate(
        [surf_counts, np.zeros(pad, surf_counts.dtype if n_surf else np.int64)]
    ).reshape(n_chunks, chunk).sum(axis=1)
    peak = int(csum.max()) if n_chunks else 1
    c_max = 1 << max(12, (max(peak, 1) - 1).bit_length())

    cap = max_tris
    buf_v = jnp.zeros(((cap + c_max) * 9,), jnp.float32)
    buf_p = jnp.zeros(((cap + c_max) * 3,), jnp.float32)
    buf_hi = jnp.full(((cap + c_max) * 3,), jnp.uint32(0xFFFFFFFF))
    buf_lo = jnp.full(((cap + c_max) * 3,), jnp.uint32(0xFFFFFFFF))
    offset = jnp.int32(0)
    for c in range(n_chunks):
        buf_v, buf_p, buf_hi, buf_lo, offset = _mesh_chunk(
            m, order[c], buf_v, buf_p, buf_hi, buf_lo, offset,
            voxel_size, min_weight, c_max,
        )
    return buf_v, buf_p, buf_hi, buf_lo, offset


@partial(jax.jit, static_argnames=())
def _dedup_device(buf_v, buf_p, buf_hi, buf_lo, n_tris):
    """All inputs/outputs flat 1-D (see `_mesh_device` layout note):
    buf_v [cap*9], buf_p/hi/lo [cap*3]. Returns uniq_v flat [M*3]."""
    M = buf_p.shape[0]  # 3 * cap vertices

    # ---- on-device shared-vertex dedup (sort-unique, the block-alloc
    # trick applied to edge keys; sentinel keys 0xFFFFFFFF sort last)
    hi = buf_hi
    lo = buf_lo
    perm = jnp.lexsort((lo, hi))
    s_hi, s_lo = hi[perm], lo[perm]
    is_sent = (s_hi == jnp.uint32(0xFFFFFFFF)) & (
        s_lo == jnp.uint32(0xFFFFFFFF)
    )
    first = jnp.concatenate(
        [
            jnp.array([True]),
            (s_hi[1:] != s_hi[:-1]) | (s_lo[1:] != s_lo[:-1]),
        ]
    ) & ~is_sent
    uid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1  # [M]
    n_verts = jnp.sum(first.astype(jnp.int32))
    inverse = jnp.zeros((M,), jnp.int32).at[perm].set(uid_sorted)
    # representative (first-occurrence) vertex data per unique id
    rep = jnp.where(first, uid_sorted, M)
    src = perm  # original flat vertex slot of each sorted element
    rep3 = (rep[:, None] * 3 + jnp.arange(3)[None]).reshape(-1)
    src3 = (src[:, None] * 3 + jnp.arange(3)[None]).reshape(-1)
    uniq_v = (
        jnp.zeros((M * 3,), jnp.float32)
        .at[rep3]
        .set(buf_v[src3], mode="drop")
    )
    uniq_p = (
        jnp.zeros((M,), jnp.float32).at[rep].set(buf_p[src], mode="drop")
    )
    return uniq_v, uniq_p, inverse, n_tris, n_verts


def extract_mesh(
    m: VoxelMap,
    cfg: TsdfConfig,
    min_weight: float = 1.5,
    chunk: int = 256,
    max_tris: int = 1 << 22,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract the full mesh with shared-vertex compaction.

    Returns (vertices [V,3] f32, indices [T,3] i32, vertex_probs [V] f32).
    Every isosurface vertex lies on a unique voxel-grid edge; vertices are
    deduplicated by exact edge identity (sort-unique over packed endpoint
    keys — the same batch-dedup trick as block allocation), so V ≈ T/2
    like the reference's vertex-ownership + compaction scheme
    (`/root/reference/utils/tsdf/voxel_tsdf.cu:561-734`) instead of 3T.

    Two device programs: a cheap exact *count* pass sizes the triangle
    buffers to the measured surface (power-of-two buckets, so recompiles
    are rare), then the emission pass runs at that size. This keeps peak
    device memory proportional to the actual isosurface instead of the
    `max_tris` worst case — round 2 shipped a fixed 1<<22-triangle
    buffer plus 12.6M-row dedup arrays, which RESOURCE_EXHAUSTED-ed the
    chip at bench scale; a surface beyond `max_tris` now raises a clean
    ValueError instead of a device OOM.
    """
    surf_idx, surf_counts = _surface_census(m, min_weight, chunk)
    n = int(surf_counts.sum())
    if n == 0:
        return (
            np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.int32),
            np.zeros((0,), np.float32),
        )
    if n > max_tris:
        raise ValueError(
            f"mesh overflow: map surface has {n} triangles > "
            f"max_tris={max_tris}; raise the budget or raise min_weight"
        )
    cap = 1 << max(14, (n - 1).bit_length())
    cap = min(cap, max(max_tris, n))
    soup = _mesh_device(
        m, cfg.voxel_size, min_weight, chunk, cap, surf_idx, surf_counts
    )
    if cap <= (1 << 22):
        uniq_v, uniq_p, inverse, n_tris, n_verts = _dedup_device(*soup)
        v = int(n_verts)
        vertices = np.asarray(uniq_v[: 3 * v]).reshape(v, 3)
        probs = np.asarray(uniq_p[:v])
        indices = np.asarray(inverse[: 3 * n]).reshape(n, 3)
    else:
        # past ~4M triangles the on-device lexsort's multi-operand
        # working set is the limit; ship the compacted soup and dedup
        # in numpy — the export already crosses device->host anyway
        buf_v, buf_p, buf_hi, buf_lo, _n_tris = jax.device_get(soup)
        key = (
            buf_hi[: 3 * n].astype(np.uint64) << np.uint64(32)
        ) | buf_lo[: 3 * n].astype(np.uint64)
        uniq, inv = np.unique(key, return_inverse=True)
        first = np.full(len(uniq), len(key), np.int64)
        np.minimum.at(first, inv, np.arange(len(key)))
        vertices = buf_v[: 9 * n].reshape(-1, 3)[first]
        probs = buf_p[: 3 * n][first]
        indices = inv.reshape(-1, 3).astype(np.int32)
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
