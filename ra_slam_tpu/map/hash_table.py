"""Open-addressed spatial hash table as pure-functional JAX ops.

TPU-native replacement for the reference's GPU hash
(`/root/reference/utils/tsdf/voxel_hash.cu`: 2^21 buckets x 2 entries,
chained-list overflow, per-bucket spin locks with drop-on-contention).
Chained lists are pointer chasing and spin locks need atomics — neither
maps to XLA. Instead:

  - open addressing with linear probing over a fixed window
    (MAX_PROBE slots); lookups probe the whole window with vectorized
    gathers, so there is no early-exit divergence and entry deletion
    needs no tombstones;
  - insertion is a deterministic batched "claim" protocol: each round,
    every unplaced key proposes its next probe slot, conflicts are
    resolved by a scatter-min of candidate ids, and winners write their
    entry. MAX_PROBE rounds bound the work statically. Keys that fail
    all rounds are reported (the reference *silently drops* contended
    allocations and retries next frame, `voxel_hash.cu:71-77` — we keep
    that best-effort semantic but count failures).

All functions are jit-compatible with static shapes and are safe to vmap
or shard: the table is just two int32 arrays.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ra_slam_tpu.map.blocks import INVALID_KEY, hash_key

MAX_PROBE = 16


class HashTable(NamedTuple):
    """key[T] (INVALID_KEY = empty) and value[T] (pool block index)."""

    key: jax.Array
    value: jax.Array

    @property
    def log2_size(self) -> int:
        return (self.key.shape[0]).bit_length() - 1

    @staticmethod
    def create(log2_size: int) -> "HashTable":
        size = 1 << log2_size
        return HashTable(
            key=jnp.full((size,), INVALID_KEY, dtype=jnp.int32),
            value=jnp.full((size,), -1, dtype=jnp.int32),
        )


def ht_lookup(table: HashTable, keys: jax.Array) -> jax.Array:
    """Batched lookup: keys [Q] int32 -> block index [Q] (-1 = not found).

    INVALID_KEY queries return -1.
    """
    log2 = table.log2_size
    mask = (1 << log2) - 1
    h = hash_key(keys, log2)
    found = jnp.full(keys.shape, -1, dtype=jnp.int32)
    for p in range(MAX_PROBE):
        slot = (h + p) & mask
        match = (table.key[slot] == keys) & (keys != INVALID_KEY)
        found = jnp.where((found < 0) & match, table.value[slot], found)
    return found


def ht_insert(
    table: HashTable,
    keys: jax.Array,
    values: jax.Array,
    valid: jax.Array,
) -> Tuple[HashTable, jax.Array, jax.Array]:
    """Batched insert of (key, value) pairs.

    Args:
      keys:   [K] int32 — must be unique among valid entries and not
              already present in the table (dedup + lookup first).
      values: [K] int32 — pool indices to store.
      valid:  [K] bool — entries to actually insert.

    Returns (new_table, slots [K] int32 (-1 if failed), placed [K] bool).
    """
    K = keys.shape[0]
    log2 = table.log2_size
    size = 1 << log2
    mask = size - 1
    h = hash_key(keys, log2)

    ids = jnp.arange(K, dtype=jnp.int32)
    placed = ~valid
    slots = jnp.full((K,), -1, dtype=jnp.int32)
    tkey, tval = table.key, table.value

    for p in range(MAX_PROBE):
        slot = (h + p) & mask
        want = (~placed) & (tkey[slot] == INVALID_KEY)
        # Resolve multi-key collisions on the same slot: lowest id wins.
        claim = jnp.full((size,), K, dtype=jnp.int32)
        claim = claim.at[jnp.where(want, slot, size)].min(ids, mode="drop")
        win = want & (claim[slot] == ids)
        widx = jnp.where(win, slot, size)
        tkey = tkey.at[widx].set(keys, mode="drop")
        tval = tval.at[widx].set(values, mode="drop")
        slots = jnp.where(win, slot, slots)
        placed = placed | win

    return HashTable(tkey, tval), slots, placed & valid


def ht_remove(table: HashTable, slots: jax.Array, mask: jax.Array) -> HashTable:
    """Clear table entries at `slots` [K] where mask [K] is set.

    O(1) deletion: lookups scan the full probe window, so no tombstones
    are needed.
    """
    size = table.key.shape[0]
    idx = jnp.where(mask, slots, size)
    return HashTable(
        table.key.at[idx].set(INVALID_KEY, mode="drop"),
        table.value.at[idx].set(-1, mode="drop"),
    )
