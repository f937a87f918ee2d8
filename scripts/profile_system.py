"""Attribute the whole-system per-frame cost: which stage combination
explains system_fps << the component benches' sum?

Runs the bench_system loop with stages toggled (track / +seg /
+integrate / +render, GT-pose integrate variant) over the same
pre-staged 206-frame orbit, one end sync each, reusing one set of
compiled steps.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _sync(x):
    return jax.device_get(x)


def log(m):
    print(f"[+{time.monotonic()-T0:6.1f}s] {m}", flush=True)


T0 = time.monotonic()


def main():
    import dataclasses

    from ra_slam_tpu.core.config import FeatureConfig, TrackingConfig, TsdfConfig
    from ra_slam_tpu.core.se3 import SE3
    from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
    from ra_slam_tpu.map.raycast import raycast
    from ra_slam_tpu.map.voxel_map import create_map, integrate_frame
    from ra_slam_tpu.models.segmentation import InferenceEngine
    from ra_slam_tpu.slam.system import SlamSystem
    from ra_slam_tpu.utils.aot_cache import cached_compile

    n = 206
    cfg = TsdfConfig(
        voxel_size=0.01, truncation=0.06, max_depth=6.0,
        log2_num_blocks=17, log2_hash_size=19,
        max_visible_blocks=1 << 13, max_shell_blocks=3072,
        max_new_blocks=1 << 13, width=640, height=480,
    )
    ds = SyntheticBoxDataset(
        num_frames=240,
        cam=SyntheticCameraSpec(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                                width=640, height=480),
        radius=1.0,
    )
    cam = ds.camera
    slam = SlamSystem(
        cam, fcfg=FeatureConfig(max_num_keypoints=1000, num_levels=4),
        tcfg=TrackingConfig(min_inliers=15, match_radius=30.0),
        ba_window=6, ba_max_points=2048, ba_iterations=5,
    )
    frames = [ds.frame(i) for i in range(n)]
    rgb8 = [jax.device_put(np.asarray(f.rgb, np.uint8)) for f in frames]
    depths = [jax.device_put(np.asarray(f.depth, np.float32)) for f in frames]
    to_f32 = jax.jit(lambda x: x.astype(jnp.float32))
    rgbf = [to_f32(r) for r in rgb8]
    gt = [SE3.from_matrix(jnp.asarray(f.cam_T_world)) for f in frames]
    _sync(rgbf[-1][0, 0, 0])
    log("staged")

    step_jit = jax.jit(
        functools.partial(integrate_frame, cfg=cfg, alloc_stride=3),
        donate_argnums=(0,),
    )
    m0 = create_map(cfg)
    integ, aot = cached_compile(
        step_jit, (m0, rgbf[0], depths[0], rgbf[0][..., 0], rgbf[0][..., 0],
                   cam, gt[0]), extra="profile_system_v1",
    )
    log(f"integrate ready {aot}")

    eng = InferenceEngine("__random__", width=640, height=480)

    @jax.jit
    def seg_step(params, x):
        logits = eng.net.apply(params, x[None] * (1.0 / 255.0))
        prob = jax.nn.softmax(logits, axis=-1)
        return (prob[0, ..., 0].astype(jnp.float32),
                prob[0, ..., 1].astype(jnp.float32))

    rc = jax.jit(functools.partial(
        raycast, cam=cam,
        cfg=dataclasses.replace(cfg, max_shell_blocks=cfg.max_visible_blocks),
    ))

    def run(tag, track, seg, integrate, render, gt_pose=False):
        slam.reset()
        m = create_map(cfg)
        ht = lt = rgbf[0][..., 0]
        info = None
        stats = None
        for i in range(3):
            if track:
                info = slam.feed_rgbd_frame(rgb8[i], depths[i], i / 30.0, frame_id=i)
                info.block()
            if seg:
                ht, lt = seg_step(eng.params, rgbf[i])
            if integrate:
                pose = gt[i] if (gt_pose or not track) else info.pose
                m, stats = integ(m, rgbf[i], depths[i], ht, lt, cam, pose)
        if render and integrate:
            r = rc(m, cam_T_world=gt[2])
            _sync(r["depth"][0, 0])
        if stats is not None:
            _sync(stats["num_active"])
        t0 = time.perf_counter()
        for i in range(3, n):
            if track:
                info = slam.feed_rgbd_frame(rgb8[i], depths[i], i / 30.0, frame_id=i)
            if seg:
                ht, lt = seg_step(eng.params, rgbf[i])
            if integrate:
                pose = gt[i] if (gt_pose or not track) else info.pose
                m, stats = integ(m, rgbf[i], depths[i], ht, lt, cam, pose)
            if render and integrate and i % 3 == 0:
                r = rc(m, cam_T_world=(gt[i] if (gt_pose or not track) else info.pose))
        if track:
            info.block()
        if stats is not None:
            _sync(stats["num_active"])
        dt = time.perf_counter() - t0
        log(f"{tag:34s} {1e3*dt/(n-3):7.2f} ms/frame  ({(n-3)/dt:5.1f} f/s)")

    run("integrate only (gt)", False, False, True, False)
    run("track only", True, False, False, False)
    run("track+integrate (tracked pose)", True, False, True, False)
    run("track+integrate (gt pose)", True, False, True, False, gt_pose=True)
    run("track+seg+integrate", True, True, True, False)
    run("track+seg+integrate+render/3", True, True, True, True)
    run("integrate+render/3 (gt)", False, False, True, True)


if __name__ == "__main__":
    main()
