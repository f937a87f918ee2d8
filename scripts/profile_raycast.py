"""Stage-level profile of the raycast splatting pipeline on the bench map.

Builds the same 60-frame fused map as bench.py, then times isolated
stages of `map/raycast.py` to locate the bottleneck (VERDICT r2: 3.5 f/s
at 640x480 vs the reference's interactive renderer).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.core.config import TsdfConfig
from ra_slam_tpu.core.se3 import SE3
from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
from ra_slam_tpu.map.blocks import BLOCK_LEN, unpack_block_coords, voxel_offsets
from ra_slam_tpu.map.voxel_map import create_map, integrate_frame, visible_blocks


def _sync(out):
    """Honest sync: block_until_ready is a NO-OP on the axon backend;
    transfer one dependent element instead."""
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(leaf.reshape(-1)[0] if hasattr(leaf, "reshape") else leaf)


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:8.2f} ms")
    return out


def main():
    n_frames = 60
    spec = SyntheticCameraSpec(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                               width=640, height=480)
    ds = SyntheticBoxDataset(num_frames=n_frames, cam=spec,
                             half_extents=(3.0, 2.0, 3.0), radius=1.0)
    cfg = TsdfConfig(voxel_size=0.01, truncation=0.06, max_depth=6.0,
                     log2_num_blocks=17, log2_hash_size=19,
                     max_visible_blocks=1 << 14, max_new_blocks=1 << 15,
                     width=640, height=480)
    cam = ds.camera
    step = jax.jit(functools.partial(integrate_frame, cfg=cfg, alloc_stride=2),
                   donate_argnums=(0,))
    m = create_map(cfg)
    for i in range(n_frames):
        f = ds.frame(i)
        m, _ = step(m, jnp.asarray(f.rgb, jnp.float32), jnp.asarray(f.depth),
                    jnp.asarray(f.ht), jnp.asarray(f.lt), cam,
                    SE3.from_matrix(jnp.asarray(f.cam_T_world)))
    jax.block_until_ready(m.tsdf)
    pose = SE3.from_matrix(jnp.asarray(ds.frame(0).cam_T_world))
    print(f"active blocks: {int(jnp.sum(m.active))}")

    H, W = cam.height, cam.width
    n_pix = H * W

    # stage 1: visibility
    vis = jax.jit(functools.partial(visible_blocks, cfg=cfg))
    vis_idx, vis_mask, count = timeit("visible_blocks", vis, m, cam, pose)
    print(f"  visible count: {int(count)} / cap {vis_idx.shape[0]}")

    # stage 2: project + gate (no scatter)
    @jax.jit
    def project(m, pose):
        vis_idx, vis_mask, _ = visible_blocks(m, cam, pose, cfg)
        base = unpack_block_coords(m.block_key[vis_idx])
        offs = voxel_offsets()
        pts = (base[:, None, :].astype(jnp.float32) * BLOCK_LEN
               + offs[None].astype(jnp.float32) + 0.5) * cfg.voxel_size
        q = pose.apply(pts)
        uv, z = cam.project(q)
        r = jnp.linalg.norm(q, axis=-1)
        d2r = r / jnp.maximum(z, 1e-9)
        tsdf = m.tsdf[vis_idx]
        weight = m.weight[vis_idx]
        z_surf = z + tsdf * cfg.truncation / d2r
        ui = jnp.round(uv[..., 0]).astype(jnp.int32)
        vi = jnp.round(uv[..., 1]).astype(jnp.int32)
        valid = (vis_mask[:, None] & (weight >= cfg.raycast_min_weight)
                 & (jnp.abs(tsdf) < 0.5) & (z > 0.0)
                 & (z_surf > cfg.min_depth) & (z_surf <= cfg.max_depth)
                 & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)).reshape(-1)
        pix = (vi * W + jnp.clip(ui, 0, W - 1)).reshape(-1)
        return pix, z_surf.reshape(-1), valid

    pix_all, z_all, valid = timeit("project+gate", project, m, pose)
    nv = int(jnp.sum(valid))
    print(f"  valid splats: {nv} / {valid.shape[0]} "
          f"({100 * nv / valid.shape[0]:.1f}%)")

    # stage 3: compaction scatter
    s_cap = max(1 << 15, valid.shape[0] // 4)

    @jax.jit
    def compact(pix_all, z_all, valid):
        rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
        dest = jnp.where(valid & (rank < s_cap), rank, s_cap)
        pix = jnp.full((s_cap,), n_pix, jnp.int32).at[dest].set(
            pix_all, mode="drop")
        zc = jnp.full((s_cap,), jnp.inf, jnp.float32).at[dest].set(
            z_all, mode="drop")
        return pix, zc

    pix, zc = timeit("compaction scatter", compact, pix_all, z_all, valid)

    # stage 4: depth scatter-min over compacted splats
    @jax.jit
    def zmin(pix, zc):
        return jnp.full((n_pix,), jnp.inf, jnp.float32).at[pix].min(
            zc, mode="drop")

    timeit("depth scatter-min (compacted)", zmin, pix, zc)

    # stage 4b: depth scatter-min straight over all splats (no compaction)
    @jax.jit
    def zmin_all(pix_all, z_all, valid):
        p = jnp.where(valid, pix_all, n_pix)
        return jnp.full((n_pix,), jnp.inf, jnp.float32).at[p].min(
            z_all, mode="drop")

    timeit("depth scatter-min (raw 8.4M)", zmin_all, pix_all, z_all, valid)

    # stage 5: one packed attr scatter-min (as in resolve2)
    @jax.jit
    def attr(pix, zc):
        dq = jnp.clip(zc / 6.06 * 32767, 0, 32767).astype(jnp.int32)
        key = (dq << 16) + 1234
        return jnp.full((n_pix,), jnp.iinfo(jnp.int32).max, jnp.int32).at[
            pix].min(key, mode="drop")

    timeit("packed attr scatter-min x1", attr, pix, zc)

    # stage 6: full raycast for reference
    from ra_slam_tpu.map.raycast import raycast
    rc = jax.jit(functools.partial(raycast, cam=cam, cfg=cfg))
    out = timeit("full raycast", rc, m, pose, iters=5)
    print(f"  hit fraction: {float(jnp.mean(out['hit'])):.3f}")


if __name__ == "__main__":
    main()
