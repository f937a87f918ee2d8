"""Frame-to-map RGB-D/stereo tracking.

The per-frame tracking loop the reference outsources to OpenVSLAM's
`tracker_->track_RGBD_image` (`/root/reference/modules/slam_module.cc:133`):
constant-velocity pose prediction, projective descriptor matching
against the landmark map, motion-only Gauss-Newton, keyframe policy.

TPU formulation: the match step is a dense Hamming matrix (one MXU
matmul) between the frame's features and ALL landmarks, gated by
projected pixel distance — replacing OpenVSLAM's per-cell reprojection
search with a single batched op. Everything is static-shape and jit-able
end to end; keyframe/new-landmark decisions come back as scalars the
host acts on.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ra_slam_tpu.core.camera import PinholeCamera, bilinear_sample, nearest_sample
from ra_slam_tpu.core.config import TrackingConfig
from ra_slam_tpu.core.se3 import SE3, exp_se3, log_se3
from ra_slam_tpu.features.matching import hamming_matrix
from ra_slam_tpu.features.orb import NUM_PAIRS, Keypoints
from ra_slam_tpu.slam.landmarks import (
    Landmarks,
    add_landmarks,
    cull_landmarks,
    record_observations,
)
from ra_slam_tpu.slam.pnp import motion_only_gn


class TrackState(NamedTuple):
    """Tracker pytree state threaded through frames."""

    pose: SE3  # cam_T_world of the last tracked frame
    velocity: jax.Array  # [6] twist: pose_k ~ exp(velocity) @ pose_{k-1}
    lms: Landmarks
    kf_counter: jax.Array  # int32 number of keyframes so far
    frames_since_kf: jax.Array  # int32
    last_kf_pose: SE3
    initialized: jax.Array  # bool
    lost: jax.Array  # bool


def create_track_state(max_landmarks: int) -> TrackState:
    from ra_slam_tpu.slam.landmarks import create_landmarks

    return TrackState(
        pose=SE3.identity(),
        velocity=jnp.zeros(6, jnp.float32),
        lms=create_landmarks(max_landmarks),
        kf_counter=jnp.int32(0),
        frames_since_kf=jnp.int32(0),
        last_kf_pose=SE3.identity(),
        initialized=jnp.array(False),
        lost=jnp.array(False),
    )


def match_frame_to_map(
    kp: Keypoints,
    lms: Landmarks,
    pose_pred: SE3,
    cam: PinholeCamera,
    tcfg: TrackingConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Projective-gated dense matching: feature i -> landmark idx (or -1).

    Returns (lm_idx [F] int32, valid [F] bool).
    """
    p_cam = pose_pred.apply(lms.pos)  # [M, 3]
    uv_lm, z = cam.project(p_cam)
    proj_ok = lms.valid & (z > 0.05) & cam.in_bounds(uv_lm)

    # packed XOR+popcount Hamming matrix — on TPU this is the Pallas
    # kernel (`ops/hamming.py`), avoiding the 32x unpack traffic of the
    # ±1-matmul formulation
    dist = hamming_matrix(kp.desc, lms.desc)  # [F, M] float32

    d2 = jnp.sum(
        (kp.uv[:, None, :] - uv_lm[None, :, :]) ** 2, axis=-1
    )  # [F, M] pixel distance^2
    r2 = float(tcfg.match_radius) ** 2
    gate = proj_ok[None, :] & (d2 <= r2)
    dist = jnp.where(gate, dist, jnp.inf)

    neg = -dist
    top2, idx2 = jax.lax.top_k(neg, 2)
    best, second = -top2[:, 0], -top2[:, 1]
    ok = (
        kp.valid
        & jnp.isfinite(best)
        & (best <= tcfg.match_hamming_max)
        & (best < tcfg.match_ratio * jnp.minimum(second, float(NUM_PAIRS)))
    )
    return jnp.where(ok, idx2[:, 0], -1).astype(jnp.int32), ok


class TrackResult(NamedTuple):
    num_matches: jax.Array
    num_inliers: jax.Array
    rmse: jax.Array
    need_keyframe: jax.Array
    lm_idx: jax.Array  # [F] matched landmark per feature (-1 none)
    inlier: jax.Array  # [F] bool
    # acceptance-gate observability: the refined pose's deviation from
    # the motion-model prediction (meters / radians)
    jump_t: jax.Array  # float32
    jump_r: jax.Array  # float32


def track_frame(
    state: TrackState,
    kp: Keypoints,
    cam: PinholeCamera,
    tcfg: TrackingConfig,
) -> Tuple[TrackState, TrackResult]:
    """Track one frame against the landmark map (pure, jit-able)."""
    pose_pred = exp_se3(state.velocity) @ state.pose

    lm_idx, mvalid = match_frame_to_map(kp, state.lms, pose_pred, cam, tcfg)
    pts = state.lms.pos[jnp.maximum(lm_idx, 0)]
    w = mvalid.astype(jnp.float32)
    n_match = jnp.sum(mvalid.astype(jnp.int32))

    res = motion_only_gn(
        pose_pred,
        pts,
        kp.uv,
        w,
        cam,
        iterations=tcfg.gn_iterations,
        huber_delta=tcfg.huber_delta,
    )

    # acceptance gates (see TrackingConfig): inlier count, residual,
    # single-frame jump vs the motion model, inlier/match ratio
    jump = log_se3(res.pose @ pose_pred.inverse())
    ok = (
        (res.num_inliers >= tcfg.min_inliers)
        & (res.rmse <= tcfg.max_track_rmse)
        & (jnp.linalg.norm(jump[3:]) <= tcfg.max_pose_jump_t)
        & (jnp.linalg.norm(jump[:3]) <= tcfg.max_pose_jump_r)
        & (
            res.num_inliers.astype(jnp.float32)
            >= tcfg.min_inlier_ratio * jnp.maximum(n_match, 1).astype(jnp.float32)
        )
    )
    pose_new = jax.tree.map(
        lambda a, b: jnp.where(ok, a, b), res.pose, pose_pred
    )
    vel_new = jnp.where(ok, log_se3(pose_new @ state.pose.inverse()), state.velocity * 0.0)

    inlier = res.inliers & mvalid
    lms = record_observations(state.lms, lm_idx, inlier, state.kf_counter)

    # keyframe policy (reference config semantics: min interval + motion
    # or weak tracking)
    rel = pose_new @ state.last_kf_pose.inverse()
    xi = log_se3(rel)
    moved = (
        (jnp.linalg.norm(xi[3:]) > tcfg.keyframe_translation)
        | (jnp.linalg.norm(xi[:3]) > tcfg.keyframe_rotation)
        | (res.num_inliers < tcfg.keyframe_min_inliers)
    )
    need_kf = state.initialized & ok & (
        (state.frames_since_kf >= tcfg.keyframe_min_interval) & moved
    )

    new_state = TrackState(
        pose=pose_new,
        velocity=vel_new,
        lms=lms,
        kf_counter=state.kf_counter,
        frames_since_kf=state.frames_since_kf + 1,
        last_kf_pose=state.last_kf_pose,
        initialized=state.initialized,
        lost=state.initialized & ~ok,
    )
    return new_state, TrackResult(
        num_matches=n_match,
        num_inliers=res.num_inliers,
        rmse=res.rmse,
        need_keyframe=need_kf,
        lm_idx=lm_idx,
        inlier=inlier,
        jump_t=jnp.linalg.norm(jump[3:]),
        jump_r=jnp.linalg.norm(jump[:3]),
    )


def insert_keyframe_landmarks(
    state: TrackState,
    kp: Keypoints,
    depth: jax.Array,  # [H, W] float32 meters (0 = invalid)
    lm_idx: jax.Array,  # [F] from TrackResult (-1 = unmatched)
    cam: PinholeCamera,
    tcfg: TrackingConfig,
) -> Tuple[TrackState, jax.Array, jax.Array]:
    """Keyframe insertion: unmatched keypoints with valid depth become
    new landmarks (RGB-D initialization — OpenVSLAM's stereo/depth
    keyframe landmark triangulation, simplified to direct unprojection).

    Returns (new state, per-feature landmark index [F] for the keyframe
    observation record: existing match or freshly inserted id or -1,
    per-feature measured depth [F] in meters, 0 = none — stored with
    the keyframe so BA gets its RGB-D depth residual).
    """
    # Edge-aware depth lookup: bilinear where the 2x2 neighborhood is
    # depth-continuous (subpixel accuracy to match the subpixel corners),
    # nearest at discontinuities (bilinear would smear foreground and
    # background into a phantom point).
    d_near, dvalid = nearest_sample(depth, kp.uv)
    d_bil, bvalid = bilinear_sample(depth, kp.uv)
    smooth = bvalid & (jnp.abs(d_bil - d_near) < 0.05 * jnp.maximum(d_near, 0.1))
    d = jnp.where(smooth, d_bil, d_near)
    has_depth = dvalid & (d > tcfg.min_depth) & (d < tcfg.max_depth)

    # Landmark fusion (OpenVSLAM local-mapping "fuse"): before spawning a
    # landmark for an unmatched feature, re-search the whole map with a
    # WIDE pixel gate + descriptor + depth agreement. Without this, every
    # revisit of a drifted region duplicates its landmarks into a second
    # inconsistent sheet that splits future inlier sets.
    p_cam_lm = state.pose.apply(state.lms.pos)  # [M, 3]
    uv_lm, z_lm = cam.project(p_cam_lm)
    hd = hamming_matrix(kp.desc, state.lms.desc)  # [F, M]
    d2 = jnp.sum((kp.uv[:, None, :] - uv_lm[None, :, :]) ** 2, axis=-1)
    depth_ok = (
        jnp.abs(z_lm[None, :] - d[:, None])
        <= tcfg.fuse_depth_ratio * d[:, None] + 0.05
    )
    gate = (
        state.lms.valid[None, :]
        & (z_lm[None, :] > 0.05)
        & (d2 <= float(tcfg.fuse_radius) ** 2)
        & depth_ok
    )
    hd = jnp.where(gate, hd, jnp.inf)
    fuse_best = jnp.argmin(hd, axis=1).astype(jnp.int32)
    fuse_ok = (
        has_depth
        & kp.valid
        & (jnp.min(hd, axis=1) <= tcfg.fuse_hamming_max)
    )
    eff_idx = jnp.where(
        lm_idx >= 0, lm_idx, jnp.where(fuse_ok, fuse_best, -1)
    )

    new_mask = kp.valid & (eff_idx < 0) & has_depth
    p_cam = cam.unproject(kp.uv, d)
    p_world = state.pose.inverse().apply(p_cam)

    lms, new_ids = add_landmarks(
        state.lms, p_world, kp.desc, new_mask, state.kf_counter
    )
    # fused re-observations count as sightings (keeps them from culling)
    lms = record_observations(
        lms, eff_idx, (eff_idx >= 0) & kp.valid, state.kf_counter
    )
    lms = cull_landmarks(
        lms, state.kf_counter,
        min_obs=tcfg.cull_min_obs, max_age=tcfg.cull_max_age,
    )
    obs_lm = jnp.where(eff_idx >= 0, eff_idx, new_ids)

    new_state = state._replace(
        lms=lms,
        kf_counter=state.kf_counter + 1,
        frames_since_kf=jnp.int32(0),
        last_kf_pose=state.pose,
        initialized=jnp.array(True),
    )
    obs_z = jnp.where(has_depth & kp.valid, d, 0.0)
    return new_state, obs_lm, obs_z


def initialize_from_frame(
    state: TrackState,
    kp: Keypoints,
    depth: jax.Array,
    cam: PinholeCamera,
    pose: SE3,
    tcfg: TrackingConfig,
) -> Tuple[TrackState, jax.Array, jax.Array]:
    """Bootstrap the map from the first frame at a known (or identity)
    pose: every valid-depth keypoint becomes a landmark."""
    state = state._replace(pose=pose, last_kf_pose=pose)
    lm_idx = jnp.full((kp.capacity,), -1, jnp.int32)
    return insert_keyframe_landmarks(state, kp, depth, lm_idx, cam, tcfg)
