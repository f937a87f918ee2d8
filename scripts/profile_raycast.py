"""Stage-level profile of the raycast splatting pipeline on the bench map.

Builds the same 60-frame fused map as bench.py, then times isolated
stages (some of them legacy formulations kept for comparison: the
per-block one-hot compaction and scatter-min z-buffer rows are the
round-3 designs the current sort-based `map/raycast.py` replaced) to
locate the bottleneck, plus the CURRENT full render. Also profiles one
integrate_frame step.
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
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return out


def main():
    n_frames = 60
    spec = SyntheticCameraSpec(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                               width=640, height=480)
    ds = SyntheticBoxDataset(num_frames=n_frames, cam=spec,
                             half_extents=(3.0, 2.0, 3.0), radius=1.0)
    cfg = TsdfConfig(voxel_size=0.01, truncation=0.06, max_depth=6.0,
                     log2_num_blocks=17, log2_hash_size=19,
                     max_visible_blocks=1 << 13, max_new_blocks=1 << 15,
                     width=640, height=480)
    cam = ds.camera
    step = jax.jit(functools.partial(integrate_frame, cfg=cfg, alloc_stride=2),
                   donate_argnums=(0,))
    m = create_map(cfg)
    f0 = ds.frame(0)
    args0 = (jnp.asarray(f0.rgb, jnp.float32), jnp.asarray(f0.depth),
             jnp.asarray(f0.ht), jnp.asarray(f0.lt))
    for i in range(n_frames):
        f = ds.frame(i)
        m, _ = step(m, jnp.asarray(f.rgb, jnp.float32), jnp.asarray(f.depth),
                    jnp.asarray(f.ht), jnp.asarray(f.lt), cam,
                    SE3.from_matrix(jnp.asarray(f.cam_T_world)))
    _sync(m.tsdf)
    pose = SE3.from_matrix(jnp.asarray(ds.frame(0).cam_T_world))
    print(f"active blocks: {int(jnp.sum(m.active))}", flush=True)

    # integrate step (no donation so it can repeat on the same map)
    step2 = jax.jit(functools.partial(integrate_frame, cfg=cfg, alloc_stride=2))
    timeit("integrate_frame", lambda: step2(m, *args0, cam, pose)[1])

    H, W = cam.height, cam.width
    n_pix = H * W
    shell = 0.5
    K = 128

    vis = jax.jit(functools.partial(visible_blocks, cfg=cfg))
    vis_idx, vis_mask, count = timeit("visible_blocks", vis, m, cam, pose)
    print(f"  visible count: {int(count)} / cap {vis_idx.shape[0]}")

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
                 & (jnp.abs(tsdf) < shell) & (z > 0.0)
                 & (z_surf > cfg.min_depth) & (z_surf <= cfg.max_depth)
                 & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H))
        pix = (vi * W + jnp.clip(ui, 0, W - 1)).reshape(-1)
        return pix, z_surf.reshape(-1), valid

    pix_all, z_all, valid = timeit("project+gate", project, m, pose)
    nv = int(jnp.sum(valid))
    V = valid.shape[0]
    print(f"  valid splats: {nv} / {V*512} ({100 * nv / (V*512):.1f}%)"
          f"  blocks with any: {int(jnp.sum(jnp.any(valid, axis=1)))}")

    @jax.jit
    def onehot_compact(pix_all, z_all, valid):
        rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
        slot = jnp.where(valid & (rank < K), rank, K)
        oh = jax.nn.one_hot(slot, K, dtype=jnp.float32)
        sidx_f = jnp.arange(V * 512, dtype=jnp.float32).reshape(V, 512)
        src_f = jnp.einsum("vs,vsk->vk", sidx_f + 1.0, oh,
                           precision=jax.lax.Precision.HIGHEST)
        src = src_f.reshape(-1).astype(jnp.int32) - 1
        pad_ok = src >= 0
        srcc = jnp.maximum(src, 0)
        pix = jnp.where(pad_ok, pix_all[srcc], n_pix)
        zc = jnp.where(pad_ok, z_all[srcc], jnp.inf)
        return pix, zc

    pix, zc = timeit("per-block one-hot compact + gather", onehot_compact,
                     pix_all, z_all, valid)

    @jax.jit
    def zmin(pix, zc):
        return jnp.full((n_pix,), jnp.inf, jnp.float32).at[pix].min(
            zc, mode="drop")

    dmin = timeit(f"depth scatter-min ({V*K/1e6:.1f}M)", zmin, pix, zc)

    @jax.jit
    def attr(pix, zc, dmin):
        is_winner = (zc <= dmin[jnp.clip(pix, 0, n_pix - 1)] * (1.0 + 1e-4))
        packed = jnp.where(is_winner, jnp.int32(1234567), 0)
        return jnp.zeros((n_pix,), jnp.int32).at[
            jnp.where(is_winner, pix, n_pix)].max(packed, mode="drop")

    timeit("attr winner scatter-max", attr, pix, zc, dmin)

    from ra_slam_tpu.map.raycast import raycast
    rc = jax.jit(functools.partial(raycast, cam=cam, cfg=cfg))
    out = timeit("full raycast", lambda: rc(m, cam_T_world=pose), iters=5)
    print(f"  hit fraction: {float(jnp.mean(out['hit'])):.3f}  "
          f"dropped: {int(out['dropped_splats'])}")


if __name__ == "__main__":
    main()
