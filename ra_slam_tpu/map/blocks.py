"""Voxel-block geometry and key packing.

The map is a sparse set of 8x8x8-voxel blocks, like the reference
(`/root/reference/utils/tsdf/voxel_mem.cuh:11-22`: BLOCK_LEN=8,
BLOCK_VOLUME=512, point<->block<->offset transforms). Unlike the
reference — which carries 3 x int16 coordinates through a chained hash
table — we pack block coordinates into a single int32 key: 10 bits per
axis, biased by +512. One-word keys make dedup a single int sort and
hash-table compares a single int compare, both TPU-friendly.

World extent: block coords in [-512, 511] per axis = +-41 m at the
default 8 x 0.01 m blocks. (The reference's int16 coords allow more
range but its 2^18-block pool caps the usable volume similarly.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_LEN = 8
BLOCK_VOLUME = BLOCK_LEN**3  # 512

KEY_BITS = 10
KEY_OFFSET = 1 << (KEY_BITS - 1)  # 512
KEY_MASK = (1 << KEY_BITS) - 1

# Sentinel for "no key" — outside the packable range (top bit pattern).
# NOTE: a Python int on purpose. A `jnp.int32` here would be a concrete
# device array; captured as a jit-closure constant it costs a ~9 ms
# runtime penalty PER USE on the remote-TPU backend (measured), where a
# Python literal folds into the HLO for free.
INVALID_KEY = 0x7FFFFFFF


def pack_block_coords(coords: jax.Array) -> jax.Array:
    """Block coords [..., 3] int32 -> packed int32 key.

    Coords outside [-512, 511] map to INVALID_KEY.
    """
    c = coords + KEY_OFFSET
    in_range = jnp.all((c >= 0) & (c <= KEY_MASK), axis=-1)
    key = (c[..., 0] << (2 * KEY_BITS)) | (c[..., 1] << KEY_BITS) | c[..., 2]
    return jnp.where(in_range, key, INVALID_KEY).astype(jnp.int32)


def unpack_block_coords(key: jax.Array) -> jax.Array:
    """Packed int32 key -> block coords [..., 3] int32."""
    x = ((key >> (2 * KEY_BITS)) & KEY_MASK) - KEY_OFFSET
    y = ((key >> KEY_BITS) & KEY_MASK) - KEY_OFFSET
    z = (key & KEY_MASK) - KEY_OFFSET
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def hash_key(key: jax.Array, log2_size: int) -> jax.Array:
    """int32 key -> table index in [0, 2^log2_size).

    Fibonacci multiplicative hashing on the packed key (the reference
    hashes raw coords with prime multipliers,
    `/root/reference/utils/tsdf/voxel_hash.cu:19-23`; one-word keys let
    us use the cheaper multiply-shift form).
    """
    h = (key.astype(jnp.uint32) * np.uint32(2654435769)) >> (32 - log2_size)
    return h.astype(jnp.int32)


def owner_of(key: jax.Array, n_shards: int) -> jax.Array:
    """int32 key -> owning shard in [0, n_shards) for multi-device map
    sharding. Uses a different multiplier than `hash_key` so shard
    assignment is independent of each shard's local table index (keys on
    one shard would otherwise concentrate in 1/n of its local table)."""
    if n_shards == 1:
        return jnp.zeros_like(key)
    h = key.astype(jnp.uint32) * np.uint32(2246822519)
    h = h ^ (h >> 15)
    return (h % n_shards).astype(jnp.int32)


def owner_slab(
    key: jax.Array, n_shards: int, cell_log2: int = 2
) -> jax.Array:
    """Spatially-coherent owner: round-robin x-slabs of 2^cell_log2
    blocks, owner = (bx >> cell_log2) mod n.

    The property hash ownership cannot give: a block's 2x2x2 corner
    neighborhood (all the mesher/trilinear-raycast ever reads,
    `/root/reference/utils/tsdf/voxel_tsdf.cu:583-586`) crosses at most
    ONE slab boundary in +x, so every remote neighbor any shard needs is
    a LEFT-EDGE block (bx ≡ 0 mod 2^c) of the next shard — the whole
    halo exchange is one `ppermute` instead of an all-gather, and peak
    per-device memory is O(local + halo), not O(global map). Fine
    striping (default 4-block ≈ 32-voxel slabs, repeating every
    n·2^c blocks) keeps room-scale scenes load-balanced."""
    if n_shards == 1:
        return jnp.zeros_like(key)
    bx = unpack_block_coords(key)[..., 0]
    return jnp.mod(bx >> cell_log2, n_shards).astype(jnp.int32)


def voxel_offsets() -> jax.Array:
    """[512, 3] int32: intra-block voxel offsets in x-major order
    (matches the reference's OffsetToIndex layout
    `/root/reference/utils/tsdf/voxel_mem.cuh:55-70`: idx = x + 8y + 64z)."""
    idx = jnp.arange(BLOCK_VOLUME, dtype=jnp.int32)
    x = idx % BLOCK_LEN
    y = (idx // BLOCK_LEN) % BLOCK_LEN
    z = idx // (BLOCK_LEN * BLOCK_LEN)
    return jnp.stack([x, y, z], axis=-1)


def point_to_block(voxel_coords: jax.Array) -> jax.Array:
    """Global voxel coords [..., 3] -> containing block coords (floor div)."""
    return jnp.floor_divide(voxel_coords, BLOCK_LEN)


def world_to_voxel(pts: jax.Array, voxel_size: float) -> jax.Array:
    """World meters [..., 3] -> global voxel coords (floor)."""
    return jnp.floor(pts / voxel_size).astype(jnp.int32)
