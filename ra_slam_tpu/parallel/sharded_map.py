"""Multi-device TSDF map sharding.

The reference is single-process single-GPU (SURVEY.md §2.9); scaling the
map across devices is greenfield. Design:

  - The voxel-block pool and its spatial hash are partitioned by a
    block-key **owner hash** (`blocks.owner_of`): every device holds an
    independent local pool + local open-addressed table for the keys it
    owns. Two hash functions (owner vs. table slot) keep the local
    tables uniformly loaded.
  - Images and the camera pose are **replicated** — per-frame image
    bytes (~2 MB) are tiny next to the sharded map (GBs), and fusion
    reads every pixel from every shard's frustum anyway.
  - The integrate pipeline needs **zero cross-device communication**:
    allocation filters candidate keys by ownership, and the gather-style
    integrate touches only locally-owned blocks. Only the per-frame
    stats are `psum`-reduced (over ICI).
  - Export/meshing gathers shards (all blocks are disjoint by key, so
    concatenation of per-shard exports is the global map).

This is SPMD via `shard_map` over a 1-D `Mesh` axis ("map"); the same
code runs on a virtual CPU mesh for tests and on a real TPU slice.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ra_slam_tpu.core.camera import PinholeCamera
from ra_slam_tpu.core.config import TsdfConfig
from ra_slam_tpu.core.se3 import SE3
from ra_slam_tpu.map.blocks import INVALID_KEY, owner_of
from ra_slam_tpu.map.hash_table import ht_insert
from ra_slam_tpu.map.voxel_map import (
    VoxelMap,
    allocate_keys,
    create_map,
    depth_to_candidate_keys,
    integrate,
    num_active,
    space_carve,
    visible_blocks,
)

def _shard_map(f, mesh, in_specs, out_specs):
    try:  # jax>=0.8 top-level API (check_vma arg)
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    except (AttributeError, TypeError):  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)

MAP_AXIS = "map"


def local_config(cfg: TsdfConfig, n_shards: int) -> TsdfConfig:
    """Per-shard capacities: the global config split n ways (rounded up
    to powers of two — local table masks need pow2 sizes)."""
    import math

    lb = max(math.ceil(math.log2(cfg.num_blocks / n_shards)), 6)
    lh = max(math.ceil(math.log2(cfg.hash_size / n_shards)), lb + 1)
    return dataclasses.replace(
        cfg,
        log2_num_blocks=lb,
        log2_hash_size=lh,
        max_visible_blocks=max(cfg.max_visible_blocks // n_shards, 64),
        max_new_blocks=max(cfg.max_new_blocks // n_shards, 64),
    )


def map_partition_specs() -> VoxelMap:
    """PartitionSpec pytree for a VoxelMap: every array sharded on its
    leading (block / table-slot / shard) axis."""
    from ra_slam_tpu.map.hash_table import HashTable

    return VoxelMap(
        table=HashTable(P(MAP_AXIS), P(MAP_AXIS)),
        block_key=P(MAP_AXIS),
        block_slot=P(MAP_AXIS),
        active=P(MAP_AXIS),
        tsdf=P(MAP_AXIS),
        weight=P(MAP_AXIS),
        rgb=P(MAP_AXIS),
        prob=P(MAP_AXIS),
        alloc_failures=P(MAP_AXIS),
    )


def create_sharded_map(cfg: TsdfConfig, mesh: Mesh) -> VoxelMap:
    """Build a globally-shaped VoxelMap laid out shard-by-shard across
    `mesh`. Global block count = cfg.num_blocks; device i owns the
    contiguous slice [i*N/n, (i+1)*N/n) which holds the keys with
    owner_of(key) == i. `alloc_failures` becomes a per-shard vector [n].
    """
    n = mesh.shape[MAP_AXIS]
    lcfg = local_config(cfg, n)

    def build_local():
        from ra_slam_tpu.map.voxel_map import create_map

        m = create_map(lcfg)
        return m._replace(alloc_failures=m.alloc_failures[None])

    specs = map_partition_specs()
    build = _shard_map(build_local, mesh=mesh, in_specs=(), out_specs=specs)
    return jax.jit(build)()


def _sharded_integrate_frame(
    m: VoxelMap,
    rgb_img: jax.Array,
    depth_img: jax.Array,
    ht_img: jax.Array,
    lt_img: jax.Array,
    cam: PinholeCamera,
    cam_T_world: SE3,
    lcfg: TsdfConfig,
    n_shards: int,
    alloc_stride: int,
    carve: bool,
) -> Tuple[VoxelMap, dict]:
    """Body run per-shard under shard_map (m is the LOCAL shard)."""
    shard = jax.lax.axis_index(MAP_AXIS)

    keys = depth_to_candidate_keys(depth_img, cam, cam_T_world, lcfg, alloc_stride)
    mine = owner_of(keys, n_shards) == shard
    keys = jnp.where(mine, keys, INVALID_KEY)
    m = allocate_keys(m, keys)

    vis_idx, vis_mask, vis_count = visible_blocks(m, cam, cam_T_world, lcfg)
    m = integrate(
        m, vis_idx, vis_mask, rgb_img, depth_img, ht_img, lt_img, cam,
        cam_T_world, lcfg,
    )
    if carve:
        m = space_carve(m, vis_idx, vis_mask, lcfg)

    stats = {
        "num_active": jax.lax.psum(num_active(m), MAP_AXIS),
        "num_visible": jax.lax.psum(vis_count, MAP_AXIS),
        "alloc_failures": jax.lax.psum(m.alloc_failures[0], MAP_AXIS),
    }
    return m, stats


def make_sharded_integrate_step(
    mesh: Mesh, cfg: TsdfConfig, alloc_stride: int = 1, carve: bool = True
):
    """Compile the sharded per-frame fusion step for `mesh`.

    Returns step(m, rgb, depth, ht, lt, cam, cam_T_world) -> (m, stats)
    where m is a sharded global VoxelMap from `create_sharded_map`.
    """
    n = mesh.shape[MAP_AXIS]
    lcfg = local_config(cfg, n)
    specs = map_partition_specs()
    repl = P()

    body = functools.partial(
        _sharded_integrate_frame,
        lcfg=lcfg,
        n_shards=n,
        alloc_stride=alloc_stride,
        carve=carve,
    )
    fn = _shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, repl, repl, repl, repl, repl, repl),
        out_specs=(specs, {"num_active": repl, "num_visible": repl, "alloc_failures": repl}),
    )
    m_sharding = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    return jax.jit(fn, donate_argnums=(0,), out_shardings=(m_sharding, None))


# ---------------------------------------------------------------------------
# Sharded export: ICI halo/gather collective for meshing, raycast, dumps
# ---------------------------------------------------------------------------


def _gather_shards_body(
    m: VoxelMap, lcfg: TsdfConfig, cap: int, gcfg: TsdfConfig
) -> Tuple[VoxelMap, jax.Array]:
    """Per-shard body: compact the shard's ACTIVE blocks (cumsum-scatter,
    the same trick as allocation) and `all_gather` them over the mesh
    axis, then rebuild a compact replicated VoxelMap + fresh hash table.

    This is the cross-shard block exchange SURVEY §5.7/§2.9 calls for:
    meshing and trilinear raycast read 2x2x2 block neighborhoods
    (`/root/reference/utils/tsdf/voxel_tsdf.cu:583-586`), and with
    owner-hash sharding a block's neighbors live on other shards — the
    gather rides ICI instead of a host `device_get` of the whole pool,
    and moves only compacted active blocks, not pool capacity.
    """
    act = m.active
    rank = jnp.cumsum(act.astype(jnp.int32)) - 1
    dest = jnp.where(act & (rank < cap), rank, cap)

    def compact(x, fill):
        out_shape = (cap,) + x.shape[1:]
        return jnp.full(out_shape, fill, x.dtype).at[dest].set(x, mode="drop")

    keys = compact(m.block_key, INVALID_KEY)
    tsdf = compact(m.tsdf, -1.0)
    weight = compact(m.weight, 0.0)
    rgb = compact(m.rgb, 0.0)
    prob = compact(m.prob, 0.5)
    dropped = num_active(m) - jnp.sum((keys != INVALID_KEY).astype(jnp.int32))

    # the halo-exchange collective: every shard receives every shard's
    # compacted active blocks (keys are disjoint by ownership)
    keys_g = jax.lax.all_gather(keys, MAP_AXIS, tiled=True)  # [n*cap]
    tsdf_g = jax.lax.all_gather(tsdf, MAP_AXIS, tiled=True)
    weight_g = jax.lax.all_gather(weight, MAP_AXIS, tiled=True)
    rgb_g = jax.lax.all_gather(rgb, MAP_AXIS, tiled=True)
    prob_g = jax.lax.all_gather(prob, MAP_AXIS, tiled=True)

    g = create_map(gcfg)
    total = keys_g.shape[0]
    pool_idx = jnp.arange(total, dtype=jnp.int32)
    valid = keys_g != INVALID_KEY
    table, slots, placed = ht_insert(g.table, keys_g, pool_idx, valid)
    bidx = jnp.where(placed, pool_idx, g.num_blocks)
    g = g._replace(
        table=table,
        block_key=g.block_key.at[bidx].set(keys_g, mode="drop"),
        block_slot=g.block_slot.at[bidx].set(slots, mode="drop"),
        active=g.active.at[bidx].set(True, mode="drop"),
        tsdf=g.tsdf.at[bidx].set(tsdf_g, mode="drop"),
        weight=g.weight.at[bidx].set(weight_g, mode="drop"),
        rgb=g.rgb.at[bidx].set(rgb_g, mode="drop"),
        prob=g.prob.at[bidx].set(prob_g, mode="drop"),
    )
    dropped = jax.lax.psum(dropped, MAP_AXIS) + jnp.sum(
        (valid & ~placed).astype(jnp.int32)
    )
    return g, dropped


def make_gather_shards(
    mesh: Mesh, cfg: TsdfConfig, max_blocks_per_shard: int | None = None
):
    """Compile gather(m_sharded) -> (m_replicated_compact, dropped).

    The returned map is a normal `VoxelMap` with `cfg`'s global
    capacities, identical in content to the union of the shards —
    `extract_mesh` / `raycast` / `dump_semantic_tsdf` run on it
    unchanged, so the whole export surface works on a sharded map.
    `dropped` counts blocks lost to the per-shard cap (0 in-bounds).
    """
    n = mesh.shape[MAP_AXIS]
    lcfg = local_config(cfg, n)
    cap = max_blocks_per_shard or lcfg.num_blocks
    gcfg = cfg
    if n * cap > cfg.num_blocks:  # round shard overprovision back up
        import dataclasses as _dc
        import math as _math

        gcfg = _dc.replace(
            cfg,
            log2_num_blocks=_math.ceil(_math.log2(n * cap)),
            log2_hash_size=max(
                cfg.log2_hash_size, _math.ceil(_math.log2(n * cap)) + 2
            ),
        )

    specs = map_partition_specs()
    body = functools.partial(
        _gather_shards_body, lcfg=lcfg, cap=cap, gcfg=gcfg
    )
    fn = _shard_map(body, mesh=mesh, in_specs=(specs,), out_specs=(P(), P()))
    return jax.jit(fn), gcfg
