"""Sub-stage profile of integrate_frame on the bench map, amortized
over enough chained iterations that the ~30ms device_get sync cost
disappears into the average."""
import functools
import time

import jax
import jax.numpy as jnp

from ra_slam_tpu.core.config import TsdfConfig
from ra_slam_tpu.core.se3 import SE3
from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
from ra_slam_tpu.map.voxel_map import (
    allocate_from_depth,
    create_map,
    depth_to_candidate_keys,
    integrate,
    integrate_frame,
    space_carve,
    visible_blocks,
)


def t(name, fn, *args, iters=40):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
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
    rgb0 = jnp.asarray(f0.rgb, jnp.float32)
    d0 = jnp.asarray(f0.depth)
    ht0 = jnp.asarray(f0.ht)
    lt0 = jnp.asarray(f0.lt)
    for i in range(n_frames):
        f = ds.frame(i)
        m, _ = step(m, jnp.asarray(f.rgb, jnp.float32), jnp.asarray(f.depth),
                    jnp.asarray(f.ht), jnp.asarray(f.lt), cam,
                    SE3.from_matrix(jnp.asarray(f.cam_T_world)))
    jax.device_get(m.alloc_failures)
    pose = SE3.from_matrix(jnp.asarray(ds.frame(0).cam_T_world))
    print(f"active blocks: {int(jnp.sum(m.active))}", flush=True)

    t("FULL integrate_frame", jax.jit(
        functools.partial(integrate_frame, cfg=cfg, alloc_stride=2)),
      m, rgb0, d0, ht0, lt0, cam, pose)

    t("stage: candidate keys", jax.jit(functools.partial(
        depth_to_candidate_keys, cfg=cfg, stride=2)), d0, cam, pose)
    t("stage: allocate_from_depth", jax.jit(functools.partial(
        allocate_from_depth, cfg=cfg, stride=2)), m, d0, cam, pose)
    vis = t("stage: visible_blocks", jax.jit(functools.partial(
        visible_blocks, cfg=cfg)), m, cam, pose)
    vis_idx, vis_mask, _ = vis
    t("stage: integrate", jax.jit(functools.partial(integrate, cfg=cfg)),
      m, vis_idx, vis_mask, rgb0, d0, ht0, lt0, cam, pose)
    t("stage: space_carve", jax.jit(functools.partial(space_carve, cfg=cfg)),
      m, vis_idx, vis_mask)


if __name__ == "__main__":
    main()
