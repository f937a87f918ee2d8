import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.map.blocks import (
    INVALID_KEY,
    pack_block_coords,
    unpack_block_coords,
)
from ra_slam_tpu.map.hash_table import HashTable, ht_insert, ht_lookup, ht_remove


def test_pack_unpack_roundtrip():
    coords = jnp.array(
        [[0, 0, 0], [-512, -512, -512], [511, 511, 511], [1, -2, 3], [-100, 200, -300]],
        dtype=jnp.int32,
    )
    keys = pack_block_coords(coords)
    back = unpack_block_coords(keys)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(coords))
    assert len(set(np.asarray(keys).tolist())) == 5


def test_pack_out_of_range_is_invalid():
    coords = jnp.array([[512, 0, 0], [0, -513, 0], [0, 0, 700]], dtype=jnp.int32)
    keys = pack_block_coords(coords)
    assert (np.asarray(keys) == int(INVALID_KEY)).all()


def test_insert_lookup():
    t = HashTable.create(8)
    coords = jnp.arange(30, dtype=jnp.int32).reshape(10, 3) - 5
    keys = pack_block_coords(coords)
    vals = jnp.arange(10, dtype=jnp.int32) + 100
    t, slots, placed = ht_insert(t, keys, vals, jnp.ones(10, dtype=bool))
    assert np.asarray(placed).all()
    found = ht_lookup(t, keys)
    np.testing.assert_array_equal(np.asarray(found), np.asarray(vals))


def test_lookup_missing_and_invalid():
    t = HashTable.create(8)
    keys = pack_block_coords(jnp.array([[1, 2, 3]], dtype=jnp.int32))
    t, _, _ = ht_insert(t, keys, jnp.array([7], jnp.int32), jnp.array([True]))
    missing = pack_block_coords(jnp.array([[9, 9, 9]], dtype=jnp.int32))
    assert int(ht_lookup(t, missing)[0]) == -1
    assert int(ht_lookup(t, jnp.array([INVALID_KEY]))[0]) == -1


def test_remove_then_reinsert():
    t = HashTable.create(8)
    keys = pack_block_coords(jnp.arange(15, dtype=jnp.int32).reshape(5, 3))
    vals = jnp.arange(5, dtype=jnp.int32)
    t, slots, placed = ht_insert(t, keys, vals, jnp.ones(5, dtype=bool))
    # remove entries 1 and 3
    mask = jnp.array([False, True, False, True, False])
    t = ht_remove(t, slots, mask)
    found = np.asarray(ht_lookup(t, keys))
    assert found.tolist() == [0, -1, 2, -1, 4]
    # reinsert key 1 with a new value
    t, _, placed = ht_insert(t, keys[1:2], jnp.array([42], jnp.int32), jnp.array([True]))
    assert bool(placed[0])
    assert int(ht_lookup(t, keys[1:2])[0]) == 42


def test_saturation_counts_failures():
    # Tiny table (16 slots): inserting 64 distinct keys must place at
    # most 16 and report the rest unplaced — never silently corrupt.
    t = HashTable.create(4)
    coords = jnp.stack(
        [jnp.arange(64, dtype=jnp.int32), jnp.zeros(64, jnp.int32), jnp.zeros(64, jnp.int32)],
        axis=-1,
    )
    keys = pack_block_coords(coords)
    t, slots, placed = ht_insert(
        t, keys, jnp.arange(64, dtype=jnp.int32), jnp.ones(64, dtype=bool)
    )
    n_placed = int(np.asarray(placed).sum())
    assert n_placed <= 16
    found = np.asarray(ht_lookup(t, keys))
    # every placed key must be findable with its own value
    pl = np.asarray(placed)
    np.testing.assert_array_equal(found[pl], np.arange(64)[pl])
    assert (found[~pl] == -1).all()


def test_insert_respects_valid_mask():
    t = HashTable.create(8)
    keys = pack_block_coords(jnp.arange(6, dtype=jnp.int32).reshape(2, 3))
    valid = jnp.array([True, False])
    t, _, placed = ht_insert(t, keys, jnp.array([1, 2], jnp.int32), valid)
    assert np.asarray(placed).tolist() == [True, False]
    assert int(ht_lookup(t, keys[1:2])[0]) == -1
