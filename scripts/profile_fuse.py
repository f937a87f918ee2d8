"""Split integrate's cost: _integrate_prep (project + atlas + tile
gather) vs the Pallas fuse kernel vs payload gather/scatter, each at the
bench operating point (V=8192 budget, VGA)."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, *args, iters=30, jit=True):
    fn_j = jax.jit(fn) if jit else fn
    out = fn_j(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    print(f"{name:56s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms", flush=True)
    return out


def main():
    from ra_slam_tpu.core.config import TsdfConfig
    from ra_slam_tpu.core.se3 import SE3
    from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
    from ra_slam_tpu.map.voxel_map import (
        _integrate_prep, create_map, integrate_frame, visible_blocks,
    )
    from ra_slam_tpu.ops.tsdf_pallas import tsdf_fuse_pallas

    spec = SyntheticCameraSpec(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                               width=640, height=480)
    ds = SyntheticBoxDataset(num_frames=60, cam=spec,
                             half_extents=(3.0, 2.0, 3.0), radius=1.0)
    cfg = TsdfConfig(voxel_size=0.01, truncation=0.06, max_depth=6.0,
                     log2_num_blocks=17, log2_hash_size=19,
                     max_visible_blocks=1 << 13, max_new_blocks=1 << 13,
                     max_shell_blocks=3072, width=640, height=480)
    cam = ds.camera
    step = jax.jit(functools.partial(integrate_frame, cfg=cfg, alloc_stride=3),
                   donate_argnums=(0,))
    m = create_map(cfg)
    for i in range(60):
        f = ds.frame(i)
        m, st = step(m, jnp.asarray(f.rgb, jnp.float32), jnp.asarray(f.depth),
                     jnp.asarray(f.ht), jnp.asarray(f.lt), cam,
                     SE3.from_matrix(jnp.asarray(f.cam_T_world)))
    print("active:", int(jax.device_get(st["num_active"])),
          "visible:", int(jax.device_get(st["num_visible"])), flush=True)

    f = ds.frame(30)
    rgb = jnp.asarray(f.rgb, jnp.float32)
    depth = jnp.asarray(f.depth)
    ht = jnp.asarray(f.ht)
    lt = jnp.asarray(f.lt)
    pose = SE3.from_matrix(jnp.asarray(f.cam_T_world))

    vb = jax.jit(functools.partial(visible_blocks, cfg=cfg))
    vis_idx, vis_mask, _ = vb(m, cam, pose)

    prep = jax.jit(functools.partial(_integrate_prep, cfg=cfg))
    t("_integrate_prep (project+atlas+tile gather)", prep,
      m, vis_idx, vis_mask, rgb, depth, ht, lt, cam, pose)

    patch, idx, z_cam, d2r, gate = prep(
        m, vis_idx, vis_mask, rgb, depth, ht, lt, cam, pose)

    def payload_gather(m, vis_idx):
        return m.tsdf[vis_idx], m.weight[vis_idx], m.rgb[vis_idx], m.prob[vis_idx]

    t_old, w_old, rgb_old, p_old = t("payload row-gather x4", payload_gather,
                                     m, vis_idx)

    fuse = functools.partial(tsdf_fuse_pallas, truncation=cfg.truncation,
                             max_depth=cfg.max_depth, max_weight=cfg.max_weight)
    t("tsdf_fuse_pallas kernel", fuse, patch, idx, z_cam, d2r, gate,
      t_old, w_old, p_old, rgb_old, jit=False)

    touts = fuse(patch, idx, z_cam, d2r, gate, t_old, w_old, p_old, rgb_old)

    def payload_scatter(m, vis_idx, vis_mask, t_out, w_out, c_out, p_out):
        rows = jnp.where(vis_mask, vis_idx, m.num_blocks)
        return (m.tsdf.at[rows].set(t_out, mode="drop"),
                m.weight.at[rows].set(w_out, mode="drop"),
                m.rgb.at[rows].set(c_out, mode="drop"),
                m.prob.at[rows].set(p_out, mode="drop"))

    t("payload scatter x4", payload_scatter, m, vis_idx, vis_mask,
      touts[0], touts[1], touts[3], touts[2])


if __name__ == "__main__":
    main()
