"""Why does the in-system render cost ~53 ms when the standalone
renderer measures ~33 ms at the same static shapes? Hypothesis: the
integrate step donates the map buffers while the render still holds a
pending read on them, forcing the runtime to copy the ~1.6 GB pool.
Times: rc chained alone, integrate(donated) chained alone, and the
interleaved pattern of the system span."""
import dataclasses
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

def _sync(x):
    return jax.device_get(x)


def main():
    from ra_slam_tpu.core.config import TsdfConfig
    from ra_slam_tpu.core.se3 import SE3
    from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
    from ra_slam_tpu.map.raycast import raycast
    from ra_slam_tpu.map.voxel_map import create_map, integrate_frame

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
    frames = [ds.frame(i) for i in range(60)]
    rgbs = [jnp.asarray(f.rgb, jnp.float32) for f in frames]
    deps = [jnp.asarray(f.depth) for f in frames]
    hts = [jnp.asarray(f.ht) for f in frames]
    lts = [jnp.asarray(f.lt) for f in frames]
    poses = [SE3.from_matrix(jnp.asarray(f.cam_T_world)) for f in frames]
    for i in range(60):
        m, st = step(m, rgbs[i], deps[i], hts[i], lts[i], cam, poses[i])
    _sync(st["num_active"])

    # system-budget renderer (shell cap = visible cap, like bench_system)
    rc = jax.jit(functools.partial(
        raycast, cam=cam,
        cfg=dataclasses.replace(cfg, max_shell_blocks=cfg.max_visible_blocks),
    ))
    ren = rc(m, cam_T_world=poses[0])
    _sync(ren["depth"][0, 0])
    n = 30

    t0 = time.perf_counter()
    for i in range(n):
        ren = rc(m, cam_T_world=poses[i % 60])
    _sync(ren["depth"][0, 0])
    print(f"rc alone (8k shell cap):        "
          f"{(time.perf_counter()-t0)/n*1e3:7.2f} ms", flush=True)

    t0 = time.perf_counter()
    for i in range(n):
        m, st = step(m, rgbs[i % 60], deps[i % 60], hts[i % 60],
                     lts[i % 60], cam, poses[i % 60])
    _sync(st["num_active"])
    print(f"integrate alone (donated):      "
          f"{(time.perf_counter()-t0)/n*1e3:7.2f} ms", flush=True)

    t0 = time.perf_counter()
    for i in range(n):
        m, st = step(m, rgbs[i % 60], deps[i % 60], hts[i % 60],
                     lts[i % 60], cam, poses[i % 60])
        if i % 3 == 0:
            ren = rc(m, cam_T_world=poses[i % 60])
    _sync(st["num_active"])
    _sync(ren["depth"][0, 0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"interleaved (render every 3rd): {dt:7.2f} ms/frame "
          f"(render marginal: {(dt - 0):.1f})", flush=True)


if __name__ == "__main__":
    main()
