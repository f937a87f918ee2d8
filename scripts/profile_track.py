"""Attribute the per-frame tracking cost: gray conversion dispatch,
ORB detect, and the fused slam step, each amortized over chained
iterations (one end sync), on the bench orbit at VGA/1000 kp."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return jax.device_get(x)


def log(m):
    print(f"[+{time.monotonic()-T0:6.1f}s] {m}", flush=True)


T0 = time.monotonic()


def main():
    from ra_slam_tpu.core.config import FeatureConfig, TrackingConfig
    from ra_slam_tpu.features.pyramid import rgb_to_gray
    from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
    from ra_slam_tpu.slam.system import SlamSystem

    n = 103
    ds = SyntheticBoxDataset(
        num_frames=120,
        cam=SyntheticCameraSpec(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                                width=640, height=480),
        radius=1.0,
    )
    slam = SlamSystem(
        ds.camera, fcfg=FeatureConfig(max_num_keypoints=1000, num_levels=4),
        tcfg=TrackingConfig(min_inliers=15, match_radius=30.0),
        ba_window=6, ba_max_points=2048, ba_iterations=5,
    )
    frames = [ds.frame(i) for i in range(n)]
    rgb8 = [jax.device_put(np.asarray(f.rgb, np.uint8)) for f in frames]
    depths = [jax.device_put(np.asarray(f.depth, np.float32)) for f in frames]
    _sync(depths[-1][0, 0])
    log("staged")

    # full path warmup
    for i in range(3):
        slam.feed_rgbd_frame(rgb8[i], depths[i], i / 30.0, frame_id=i).block()
    log("warm")

    # 1) gray conversion as the system does it (eager dispatch)
    g = rgb_to_gray(jnp.asarray(rgb8[0], jnp.float32))
    _sync(g[0, 0])
    t0 = time.perf_counter()
    for i in range(n):
        g = rgb_to_gray(jnp.asarray(rgb8[i], jnp.float32))
    _sync(g[0, 0])
    log(f"gray (eager chain)      {1e3*(time.perf_counter()-t0)/n:7.2f} ms/frame")

    grays = [rgb_to_gray(jnp.asarray(r, jnp.float32)) for r in rgb8]
    _sync(grays[-1][0, 0])

    # 2) detect only
    kp = slam._detect(grays[0])
    _sync(kp.valid[0])
    t0 = time.perf_counter()
    for i in range(n):
        kp = slam._detect(grays[i])
    _sync(kp.valid[0])
    log(f"detect only             {1e3*(time.perf_counter()-t0)/n:7.2f} ms/frame")

    kps = [slam._detect(g) for g in grays]
    _sync(kps[-1].valid[0])

    # 3) fused step only (pre-detected keypoints)
    slam.reset()
    for i in range(3):
        slam._feed(kps[i], depths[i], i / 30.0, i, None).block()
    t0 = time.perf_counter()
    infos = [
        slam._feed(kps[i], depths[i], i / 30.0, i, None)
        for i in range(3, n)
    ]
    infos[-1].block()
    log(f"fused step only         {1e3*(time.perf_counter()-t0)/(n-3):7.2f} ms/frame"
        f"  (tracked {sum(int(x.tracked) for x in infos)}/{n-3})")

    # 4) full feed path (= bench_tracking)
    slam.reset()
    for i in range(3):
        slam.feed_rgbd_frame(rgb8[i], depths[i], i / 30.0, frame_id=i).block()
    t0 = time.perf_counter()
    infos = [
        slam.feed_rgbd_frame(rgb8[i], depths[i], i / 30.0, frame_id=i)
        for i in range(3, n)
    ]
    infos[-1].block()
    log(f"full feed path          {1e3*(time.perf_counter()-t0)/(n-3):7.2f} ms/frame"
        f"  (tracked {sum(int(x.tracked) for x in infos)}/{n-3})")


if __name__ == "__main__":
    main()
