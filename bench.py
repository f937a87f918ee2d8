"""Headline benchmark: TSDF-fused frames per second on one chip.

Workload mirrors the reference's primary metric path
(`/root/reference/main/offline_eval.cc:54-57`: 640x480 RGB-D fusion at
1 cm voxels, 6 cm truncation, 6 m max depth) on a synthetic box-room
orbit with exact GT poses/depth. Target (BASELINE.json north star):
>= 30 fused frames/s/chip.

Prints ONE JSON line:
  {"metric": "fused_frames_per_sec_per_chip", "value": N,
   "unit": "frames/s", "vs_baseline": N/30}
"""

import functools
import json
import time

import jax
import jax.numpy as jnp


def main():
    from ra_slam_tpu.core.config import TsdfConfig
    from ra_slam_tpu.core.se3 import SE3
    from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
    from ra_slam_tpu.map.voxel_map import create_map, integrate_frame

    n_frames = 60
    spec = SyntheticCameraSpec(
        fx=320.0, fy=320.0, cx=319.5, cy=239.5, width=640, height=480
    )
    ds = SyntheticBoxDataset(
        num_frames=n_frames, cam=spec, half_extents=(3.0, 2.0, 3.0), radius=1.0
    )
    cfg = TsdfConfig(
        voxel_size=0.01,
        truncation=0.06,
        max_depth=6.0,
        log2_num_blocks=17,
        log2_hash_size=19,
        max_visible_blocks=1 << 14,
        max_new_blocks=1 << 15,
        width=640,
        height=480,
    )
    cam = ds.camera

    # host-side decode (plays the role of the reference's dataset reader)
    frames = [ds.frame(i) for i in range(n_frames)]
    rgbs = [jnp.asarray(f.rgb, jnp.float32) for f in frames]
    depths = [jnp.asarray(f.depth) for f in frames]
    hts = [jnp.asarray(f.ht) for f in frames]
    lts = [jnp.asarray(f.lt) for f in frames]
    poses = [SE3.from_matrix(jnp.asarray(f.cam_T_world)) for f in frames]

    step = jax.jit(
        functools.partial(integrate_frame, cfg=cfg, alloc_stride=2),
        donate_argnums=(0,),
    )

    # warmup / compile
    m = create_map(cfg)
    m, stats = step(m, rgbs[0], depths[0], hts[0], lts[0], cam, poses[0])
    jax.block_until_ready(m.tsdf)

    m = create_map(cfg)
    t0 = time.perf_counter()
    for i in range(n_frames):
        m, stats = step(m, rgbs[i], depths[i], hts[i], lts[i], cam, poses[i])
    jax.block_until_ready(m.tsdf)
    dt = time.perf_counter() - t0

    fps = n_frames / dt
    assert int(stats["alloc_failures"]) == 0, "allocation overflow during bench"
    print(
        json.dumps(
            {
                "metric": "fused_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
