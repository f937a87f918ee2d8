"""Fixed-capacity 3-D landmark (map point) store.

Replaces OpenVSLAM's landmark database (the reference consumes it via
`map_db_`, `/root/reference/modules/slam_module.cc:38-54`). Pure pytree
with a free-slot cumsum allocator (same mechanism as the voxel-block
pool — see `map/voxel_map.py:allocate_keys`), so insertion/culling are
deterministic batched ops under jit.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Landmarks(NamedTuple):
    pos: jax.Array  # [M, 3] float32 world position
    desc: jax.Array  # [M, 8] uint32 representative ORB descriptor
    valid: jax.Array  # [M] bool
    n_obs: jax.Array  # [M] int32 times observed (matched as inlier)
    last_seen: jax.Array  # [M] int32 keyframe counter at last inlier match
    # keyframe counter at creation — the landmark's reference keyframe.
    # Loop corrections move a landmark with THIS keyframe (OpenVSLAM's
    # ref-keyframe rule): a landmark created early and re-observed
    # during a drifted revisit must stay with the early map, not jump
    # with the revisit keyframe's large correction.
    anchor: jax.Array  # [M] int32

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]


def create_landmarks(capacity: int) -> Landmarks:
    return Landmarks(
        pos=jnp.zeros((capacity, 3), jnp.float32),
        desc=jnp.zeros((capacity, 8), jnp.uint32),
        valid=jnp.zeros((capacity,), bool),
        n_obs=jnp.zeros((capacity,), jnp.int32),
        last_seen=jnp.zeros((capacity,), jnp.int32),
        anchor=jnp.zeros((capacity,), jnp.int32),
    )


def add_landmarks(
    lms: Landmarks,
    pos: jax.Array,  # [K, 3]
    desc: jax.Array,  # [K, 8]
    mask: jax.Array,  # [K] bool which rows to insert
    kf_counter: jax.Array,
) -> Tuple[Landmarks, jax.Array]:
    """Insert up to K new landmarks into free slots.

    Returns (new store, slot indices [K] int32, -1 where not inserted).
    """
    M = lms.capacity
    K = pos.shape[0]
    free = ~lms.valid
    rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank among free slots
    # slot for the j-th inserted row = index of the j-th free slot
    freelist = jnp.full((K,), -1, jnp.int32)
    dest = jnp.where(free & (rank < K), rank, K)
    freelist = freelist.at[dest].set(jnp.arange(M, dtype=jnp.int32), mode="drop")

    order = jnp.cumsum(mask.astype(jnp.int32)) - 1  # insertion order of row j
    slot = jnp.where(mask, freelist[jnp.clip(order, 0, K - 1)], -1)
    ok = mask & (slot >= 0)
    widx = jnp.where(ok, slot, M)

    return (
        Landmarks(
            pos=lms.pos.at[widx].set(pos, mode="drop"),
            desc=lms.desc.at[widx].set(desc, mode="drop"),
            valid=lms.valid.at[widx].set(True, mode="drop"),
            n_obs=lms.n_obs.at[widx].set(1, mode="drop"),
            last_seen=lms.last_seen.at[widx].set(kf_counter, mode="drop"),
            anchor=lms.anchor.at[widx].set(kf_counter, mode="drop"),
        ),
        jnp.where(ok, slot, -1),
    )


def record_observations(
    lms: Landmarks, lm_idx: jax.Array, mask: jax.Array, kf_counter: jax.Array
) -> Landmarks:
    """Bump n_obs/last_seen for landmarks matched as inliers this frame."""
    M = lms.capacity
    idx = jnp.where(mask & (lm_idx >= 0), lm_idx, M)
    return lms._replace(
        n_obs=lms.n_obs.at[idx].add(1, mode="drop"),
        last_seen=lms.last_seen.at[idx].set(kf_counter, mode="drop"),
    )


def cull_landmarks(
    lms: Landmarks,
    kf_counter: jax.Array,
    min_obs: int = 2,
    max_age: int = 30,
) -> Landmarks:
    """Invalidate weak landmarks: rarely observed and stale (OpenVSLAM's
    map-point culling policy, simplified to a batch predicate)."""
    stale = (kf_counter - lms.last_seen) > max_age
    weak = lms.n_obs < min_obs
    drop = lms.valid & stale & weak
    return lms._replace(valid=lms.valid & ~drop)


def num_valid(lms: Landmarks) -> jax.Array:
    return jnp.sum(lms.valid.astype(jnp.int32))
