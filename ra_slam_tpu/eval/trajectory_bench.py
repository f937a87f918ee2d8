"""End-to-end trajectory-accuracy evaluation (the north-star ATE run).

The reference's de-facto accuracy test is its replay loop: capture →
track → `SaveMatchedTrajectory` → re-fuse offline
(`/root/reference/modules/slam_module.cc:20-66` +
`utils/offline_data_provider/folder_reader.cc:86-105`); the quantitative
ATE numbers live only in the IROS2022 paper. This module closes that
loop natively and *records the number*: it runs the full SLAM stack
(ORB → track → keyframes → BA → loop closure → global BA) over a
committed deterministic replay sequence with analytic ground truth,
exports the per-frame matched trajectory through the same
`trajectory.txt` format `folder_reader` replays, and reports ATE/RPE.

The sequence is the seeded synthetic box-room orbit
(`io/synthetic.py`): a full 360-degree loop plus a revisit segment, with
multiplicative depth noise — drift accumulates around the orbit and the
revisit exercises relocalization + loop closure + pose-graph + global
BA, which must *demonstrably* reduce the error vs. tracking alone.

Run: ``python -m ra_slam_tpu.eval.trajectory_bench [--frames N] ...``
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time
from typing import Optional

import numpy as np


def run_trajectory_eval(
    n_frames: int = 150,
    width: int = 320,
    height: int = 240,
    depth_noise: float = 0.005,
    loop_closure: bool = True,
    trajectory_out: Optional[str] = None,
    seed: int = 0,
    progress: bool = False,
    scene_kw: Optional[dict] = None,
    **slam_kw,
) -> dict:
    """Track the replay sequence with the full SLAM stack; return metrics.

    Returns dict with ate_rmse (m), rpe_trans_rmse (m), matched_frames,
    keyframes, loop_closures, relocalizations, lost_frames, slam_fps.
    """
    import jax.numpy as jnp

    from ra_slam_tpu.core.config import FeatureConfig, TrackingConfig
    from ra_slam_tpu.core.se3 import SE3
    from ra_slam_tpu.eval.ate import ate_rmse, rpe_rmse
    from ra_slam_tpu.io.folder import load_trajectory, save_trajectory
    from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
    from ra_slam_tpu.slam.system import SlamSystem

    f = width / 2.0
    spec = SyntheticCameraSpec(
        fx=f, fy=f, cx=width / 2 - 0.5, cy=height / 2 - 0.5,
        width=width, height=height,
    )
    ds = SyntheticBoxDataset(
        num_frames=120, cam=spec, radius=1.0,
        depth_noise=depth_noise, seed=seed,
        **(scene_kw or {}),  # hardened-scene knobs: clutter, dropout,
        #                      depth_quant, exposure_drift, yaw_sweep
    )
    slam = SlamSystem(
        ds.camera,
        fcfg=FeatureConfig(max_num_keypoints=600, num_levels=4),
        # pixel thresholds (search radii, rmse acceptance gates) are
        # ANGULAR quantities: scale them with horizontal resolution
        # (values calibrated at 320 wide) so QVGA and VGA runs gate the
        # same field-of-view cone instead of silently tightening 2x
        tcfg=TrackingConfig(min_inliers=15, match_radius=30.0).scaled(
            width / 320.0
        ),
        ba_window=6, ba_max_points=2048, ba_iterations=5,
        loop_every_kf=1, loop_min_inliers=20,
        loop_min_gap=15 if loop_closure else 10**6,
        loop_max_rmse=3.0 * (width / 320.0),
        reloc_max_rmse=3.0 * (width / 320.0),
        **slam_kw,
    )

    gt = []
    lost = 0
    infos = []
    t0 = time.perf_counter()
    t_first = None  # set after frame 0 -> separates compile from steady state
    for i in range(n_frames):
        fr = ds.frame(i)
        hint = SE3.from_matrix(jnp.asarray(fr.cam_T_world)) if i == 0 else None
        info = slam.feed_rgbd_frame(
            fr.rgb, fr.depth, fr.timestamp, frame_id=i, pose_hint=hint
        )
        infos.append(info)
        gt.append((i, np.asarray(fr.cam_T_world)[:3, :4]))
        if i == 0:
            info.block()
            t_first = time.perf_counter()
        if progress and i % 25 == 24:
            print(
                f"  frame {i + 1}/{n_frames} "
                f"({time.perf_counter() - t0:.0f}s)", flush=True,
            )
    infos[-1].block()
    t_end = time.perf_counter()
    slam_fps = n_frames / (t_end - t0)
    # frame 0 pays the fused-step + detect compiles (and the init branch
    # differs from steady state, but its runtime is negligible next to
    # the compile); report it separately so the committed number is the
    # device-bound rate, not the compile amortization
    compile_s = t_first - t0
    steady_fps = (n_frames - 1) / max(t_end - t_first, 1e-9)
    lost = sum(0 if inf.tracked else 1 for inf in infos)

    # replay-loop fidelity: export through the reference trajectory.txt
    # format and read it back before scoring
    est = slam.trajectory()
    if trajectory_out is None:
        fd, trajectory_out = tempfile.mkstemp(suffix="_trajectory.txt")
        os.close(fd)
        cleanup = True
    else:
        cleanup = False
    save_trajectory(trajectory_out, est)
    est = load_trajectory(trajectory_out)
    if cleanup:
        os.unlink(trajectory_out)

    m = ate_rmse(est, gt)
    r = rpe_rmse(est, gt, delta=1)
    return {
        "ate_rmse_m": round(float(m["ate_rmse"]), 4),
        "rpe_trans_rmse_m": round(float(r["rpe_trans_rmse"]), 4),
        "matched_frames": int(m["matched_frames"]),
        "total_frames": n_frames,
        "keyframes": int(slam.state.track.kf_counter),
        "loop_closures": slam.num_loop_closures,
        "relocalizations": slam.num_relocalizations,
        "lost_frames": lost,
        "slam_fps": round(slam_fps, 2),
        "steady_state_fps": round(steady_fps, 2),
        "compile_s": round(compile_s, 1),
        "depth_noise": depth_noise,
        "loop_closure": loop_closure,
    }


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--frames", type=int, default=150)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--depth-noise", type=float, default=0.005)
    p.add_argument("--no-loop", action="store_true")
    p.add_argument("--trajectory-out", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json-out", default=None,
                   help="also write the metrics JSON to this path")
    args = p.parse_args(argv)
    out = run_trajectory_eval(
        n_frames=args.frames, width=args.width, height=args.height,
        depth_noise=args.depth_noise, loop_closure=not args.no_loop,
        trajectory_out=args.trajectory_out, seed=args.seed, progress=True,
    )
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
