"""Diagnostic run of the trajectory_bench sequence with per-frame dumps."""
import json
import sys
import time

import numpy as np
import jax.numpy as jnp

from ra_slam_tpu.core.config import FeatureConfig, TrackingConfig
from ra_slam_tpu.core.se3 import SE3
from ra_slam_tpu.eval.ate import ate_rmse, rpe_rmse
from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
from ra_slam_tpu.slam.system import SlamSystem

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 150
width, height = 320, 240
f = width / 2.0
spec = SyntheticCameraSpec(fx=f, fy=f, cx=width / 2 - 0.5, cy=height / 2 - 0.5,
                           width=width, height=height)
ds = SyntheticBoxDataset(num_frames=120, cam=spec, radius=1.0,
                         depth_noise=0.005, seed=0)
slam = SlamSystem(
    ds.camera,
    fcfg=FeatureConfig(max_num_keypoints=600, num_levels=4),
    tcfg=TrackingConfig(min_inliers=15, match_radius=30.0),
    ba_window=6, ba_max_points=2048, ba_iterations=5,
    loop_every_kf=1, loop_min_inliers=20,
    loop_min_gap=15,
)

gt = []
infos = []
t0 = time.perf_counter()
for i in range(n_frames):
    fr = ds.frame(i)
    hint = SE3.from_matrix(jnp.asarray(fr.cam_T_world)) if i == 0 else None
    info = slam.feed_rgbd_frame(fr.rgb, fr.depth, fr.timestamp, frame_id=i,
                                pose_hint=hint)
    infos.append(info)
    gt.append((i, np.asarray(fr.cam_T_world)[:3, :4]))
    if i == 0:
        print(f"first frame done at {time.perf_counter()-t0:.0f}s", flush=True)
    if i % 25 == 24:
        print(f"frame {i+1} at {time.perf_counter()-t0:.0f}s", flush=True)
infos[-1].block()
dt = time.perf_counter() - t0
print(f"total {dt:.1f}s ({n_frames/dt:.2f} f/s)")

# per-frame diagnostic table
print("frm trk rel kf  match inl  trmse jmp_t jmp_r  ba_rmse  lcand linl lrmse  ldt   ldr   err_t")
est_poses = {}
for fid, p34 in slam.trajectory():
    est_poses[fid] = p34
for i, inf in enumerate(infos):
    h = inf._pull()
    gt34 = gt[i][1]
    if i in est_poses:
        # translation error of camera center: C = -R^T t
        R, t = est_poses[i][:, :3], est_poses[i][:, 3]
        Rg, tg = gt34[:, :3], gt34[:, 3]
        err = np.linalg.norm(-R.T @ t - (-Rg.T @ tg))
    else:
        err = float("nan")
    flag = ""
    if bool(h.loop_closed):
        flag += " LOOP"
    if bool(h.relocalized):
        flag += " RELOC"
    print(f"{i:3d}  {int(h.tracked)}  {int(h.relocalized)}  "
          f"{int(h.inserted_keyframe)}  {int(h.num_matches):4d} "
          f"{int(h.num_inliers):4d}  {float(h.track_rmse):5.2f} "
          f"{float(h.jump_t):5.3f} {float(h.jump_r):5.3f}  "
          f"{float(h.ba_rmse):7.3f} "
          f"{int(h.loop_cand):4d} {int(h.loop_inliers):4d} "
          f"{float(h.loop_rmse):6.2f} {float(h.loop_delta_t):5.2f} "
          f"{float(h.loop_delta_r):5.2f}  {err:6.3f}{flag}")

est = slam.trajectory()
m = ate_rmse(est, gt)
print(json.dumps({
    "ate_rmse_m": round(float(m["ate_rmse"]), 4),
    "matched": int(m["matched_frames"]),
    "kfs": int(slam.state.track.kf_counter),
    "loops": slam.num_loop_closures,
    "relocs": slam.num_relocalizations,
    "lost": sum(0 if inf.tracked else 1 for inf in infos),
}))
