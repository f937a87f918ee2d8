"""Frame-to-map tracking on the synthetic box dataset."""

import pytest
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.core.camera import PinholeCamera
from ra_slam_tpu.core.config import FeatureConfig, TrackingConfig
from ra_slam_tpu.core.se3 import SE3, log_se3
from ra_slam_tpu.features.orb import detect_and_describe
from ra_slam_tpu.features.pyramid import rgb_to_gray
from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
from ra_slam_tpu.slam.tracker import (
    create_track_state,
    initialize_from_frame,
    insert_keyframe_landmarks,
    track_frame,
)


def _pose_err(a: SE3, b: SE3):
    xi = log_se3(a @ b.inverse())
    return float(jnp.linalg.norm(xi[:3])), float(jnp.linalg.norm(xi[3:]))


@pytest.mark.slow
def test_track_synthetic_orbit():
    spec = SyntheticCameraSpec(
        fx=160.0, fy=160.0, cx=159.5, cy=119.5, width=320, height=240
    )
    # 120 frames/orbit -> ~1.9 deg/frame rotation, trackable scale
    ds = SyntheticBoxDataset(num_frames=120, cam=spec, radius=1.0)
    cam = ds.camera
    fcfg = FeatureConfig(max_num_keypoints=600, num_levels=4)
    tcfg = TrackingConfig(min_inliers=15, match_radius=30.0)

    detect = jax.jit(lambda g: detect_and_describe(g, fcfg))
    track = jax.jit(functools.partial(track_frame, cam=cam, tcfg=tcfg))
    init = jax.jit(functools.partial(initialize_from_frame, cam=cam, tcfg=tcfg))
    ins = jax.jit(
        functools.partial(insert_keyframe_landmarks, cam=cam, tcfg=tcfg)
    )

    state = create_track_state(tcfg.max_map_points)

    f0 = ds.frame(0)
    kp0 = detect(rgb_to_gray(jnp.asarray(f0.rgb, jnp.float32)))
    gt0 = SE3.from_matrix(jnp.asarray(f0.cam_T_world))
    state, _, _ = init(state, kp0, jnp.asarray(f0.depth), pose=gt0)

    errs = []
    for i in range(1, 8):
        f = ds.frame(i)
        kp = detect(rgb_to_gray(jnp.asarray(f.rgb, jnp.float32)))
        state, res = track(state, kp, jnp.asarray(f.depth))
        assert not bool(state.lost), f"lost at frame {i} (inliers={int(res.num_inliers)})"
        if bool(res.need_keyframe):
            state, _, _ = ins(state, kp, jnp.asarray(f.depth), res.lm_idx)
        gt = SE3.from_matrix(jnp.asarray(f.cam_T_world))
        rot_e, tr_e = _pose_err(state.pose, gt)
        errs.append((rot_e, tr_e))

    rot_errs = [e[0] for e in errs]
    tr_errs = [e[1] for e in errs]
    # orbit radius 1 m, wall ~2 m away: a few cm / <2 deg budget
    assert max(tr_errs) < 0.05, f"translation errors {tr_errs}"
    assert max(rot_errs) < 0.035, f"rotation errors {rot_errs}"


@pytest.mark.slow
def test_tracking_lost_on_textureless():
    cam = PinholeCamera(
        fx=jnp.float32(160.0), fy=jnp.float32(160.0),
        cx=jnp.float32(159.5), cy=jnp.float32(119.5), width=320, height=240,
    )
    fcfg = FeatureConfig(max_num_keypoints=300, num_levels=2)
    tcfg = TrackingConfig()
    state = create_track_state(tcfg.max_map_points)
    state = state._replace(initialized=jnp.array(True))
    blank = jnp.zeros((240, 320))
    kp = detect_and_describe(blank, fcfg)
    state, res = track_frame(state, kp, blank, cam, tcfg)
    assert bool(state.lost)
    assert int(res.num_inliers) < tcfg.min_inliers
