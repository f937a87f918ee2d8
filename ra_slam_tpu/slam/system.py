"""Sparse visual SLAM system: tracking + keyframes + local BA.

The native replacement for the reference's `SLAMSystem` wrapper around
OpenVSLAM (`/root/reference/modules/slam_module.h:20-52`): per-frame it
extracts ORB features, tracks against the landmark map, decides
keyframes, and runs windowed Schur-complement BA after each insertion —
the roles OpenVSLAM splits across its tracking and local-mapping
threads. Here each stage is one jitted device step and the host loop is
just orchestration: XLA's async dispatch overlaps the stages without
explicit threads.

Feedback semantics mirror `feed_RGBD_images_w_feedback`
(`/root/reference/modules/slam_module.cc:165-185`): every processed
frame returns (pose, tracked_ok), and only tracked poses are registered
in the pose buffer for the mapper to query.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.core.camera import PinholeCamera
from ra_slam_tpu.core.config import FeatureConfig, TrackingConfig
from ra_slam_tpu.core.se3 import SE3
from ra_slam_tpu.features.orb import Keypoints, detect_and_describe
from ra_slam_tpu.features.pyramid import rgb_to_gray
from ra_slam_tpu.features.stereo import sparse_depth_image, stereo_keypoint_depth
from ra_slam_tpu.slam.ba import (
    global_bundle_adjustment,
    local_bundle_adjustment,
)
from ra_slam_tpu.slam.keyframes import Keyframes, create_keyframes, insert_keyframe
from ra_slam_tpu.slam.loop_closure import (
    LoopCandidate,
    RelocResult,
    detect_loop,
    relocalize,
)
from ra_slam_tpu.slam.pose_graph import (
    PoseGraphEdges,
    add_edge,
    correct_landmarks,
    create_edges,
    odometry_edge,
    optimize_pose_graph,
)
from ra_slam_tpu.slam.tracker import (
    TrackResult,
    TrackState,
    create_track_state,
    initialize_from_frame,
    insert_keyframe_landmarks,
    track_frame,
)
from ra_slam_tpu.utils.pose_buffer import PoseBuffer


class SlamState(NamedTuple):
    """Full sparse-SLAM pytree state (tracker + keyframe database)."""

    track: TrackState
    kfs: Keyframes


class FrameInfo(NamedTuple):
    """Host-side per-frame feedback (the `_w_feedback` tuple)."""

    pose: SE3
    tracked: bool
    num_inliers: int
    num_matches: int
    inserted_keyframe: bool
    ba_rmse: float
    loop_closed: bool = False
    relocalized: bool = False


def _insert_kf_step(
    state: SlamState,
    kp: Keypoints,
    depth: jax.Array,
    lm_idx: jax.Array,
    frame_id: jax.Array,
    timestamp: jax.Array,
    cam: PinholeCamera,
    tcfg: TrackingConfig,
) -> SlamState:
    """Insert the current frame as a keyframe into both databases."""
    slot = state.track.kf_counter  # insertion slot == counter (contiguous)
    track, obs_lm = insert_keyframe_landmarks(
        state.track, kp, depth, lm_idx, cam, tcfg
    )
    obs_w = (kp.valid & (obs_lm >= 0)).astype(jnp.float32)
    kfs = insert_keyframe(
        state.kfs, slot, track.pose, frame_id, timestamp,
        obs_lm, kp.uv, obs_w, kp.desc,
    )
    return SlamState(track=track, kfs=kfs)


def _ba_step(
    state: SlamState,
    cam: PinholeCamera,
    window: int,
    max_points: int,
    iterations: int,
) -> Tuple[SlamState, jax.Array]:
    """Local BA over the newest window; propagate the correction of the
    newest keyframe to the tracker's current pose and velocity frame."""
    kfc = state.track.kf_counter
    newest = jnp.maximum(kfc - 1, 0)
    old_kf = SE3(state.kfs.R[newest], state.kfs.t[newest])

    kfs, lms, stats = local_bundle_adjustment(
        state.kfs, lms=state.track.lms, kf_counter=kfc, cam=cam,
        window=window, max_points=max_points, iterations=iterations,
    )
    new_kf = SE3(kfs.R[newest], kfs.t[newest])

    # cam_T_world composition: current = (current ∘ old_kf⁻¹) ∘ new_kf
    rel = state.track.pose @ old_kf.inverse()
    track = state.track._replace(
        pose=rel @ new_kf,
        last_kf_pose=new_kf,
        lms=lms,
    )
    return SlamState(track=track, kfs=kfs), stats.rmse_after


def _gba_step(
    state: SlamState,
    cam: PinholeCamera,
    window: int,
    max_points: int,
    iterations: int,
    sweeps: int,
) -> Tuple[SlamState, jax.Array]:
    """Global BA over all keyframes (post-loop-closure map-wide
    refinement); propagates the newest-keyframe correction to the
    tracker's current pose like `_ba_step`."""
    kfc = state.track.kf_counter
    newest = jnp.maximum(kfc - 1, 0)
    old_kf = SE3(state.kfs.R[newest], state.kfs.t[newest])

    kfs, lms, stats = global_bundle_adjustment(
        state.kfs, state.track.lms, kfc, cam,
        window=window, max_points=max_points,
        iterations=iterations, sweeps=sweeps,
    )
    new_kf = SE3(kfs.R[newest], kfs.t[newest])
    rel = state.track.pose @ old_kf.inverse()
    track = state.track._replace(
        pose=rel @ new_kf, last_kf_pose=new_kf, lms=lms
    )
    return SlamState(track=track, kfs=kfs), stats.rmse_after


def _reloc_step(
    state: SlamState,
    kp: Keypoints,
    cam: PinholeCamera,
    tcfg: TrackingConfig,
    min_inliers: int,
) -> Tuple[SlamState, RelocResult]:
    """Attempt relocalization of a lost frame against the keyframe DB;
    on acceptance the tracker resumes from the recovered pose with zero
    velocity (OpenVSLAM relocalizer role,
    `/root/reference/modules/slam_module.cc:154-160`)."""
    res = relocalize(
        state.kfs, state.track.lms, kp.desc, kp.valid, kp.uv,
        state.track.kf_counter, cam, tcfg, min_inliers=min_inliers,
    )
    acc = res.accepted
    track = state.track._replace(
        pose=jax.tree.map(
            lambda a, b: jnp.where(acc, a, b), res.pose, state.track.pose
        ),
        velocity=jnp.where(acc, 0.0, state.track.velocity),
        lost=jnp.where(acc, False, state.track.lost),
    )
    return SlamState(track=track, kfs=state.kfs), res


def _frame_ref_rel(state: SlamState) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-frame statistics for matched-trajectory export: the reference
    keyframe slot (newest) and cam_T_keyframe of the current frame.

    Mirrors OpenVSLAM's per-frame `ref_keyfrm` + relative-pose statistics
    the reference composes in `SaveMatchedTrajectory`
    (`/root/reference/modules/slam_module.cc:38-54`)."""
    ref = jnp.maximum(state.track.kf_counter - 1, 0)
    kf = SE3(state.kfs.R[ref], state.kfs.t[ref])
    rel = state.track.pose @ kf.inverse()
    return ref, rel.R, rel.t


def _add_odometry_edge(
    edges: PoseGraphEdges, slot: jax.Array, kfs: Keyframes, new_slot: jax.Array
) -> PoseGraphEdges:
    """Sequential constraint between the two newest keyframes."""
    prev = jnp.maximum(new_slot - 1, 0)
    z = odometry_edge(
        SE3(kfs.R[prev], kfs.t[prev]), SE3(kfs.R[new_slot], kfs.t[new_slot])
    )
    return add_edge(edges, slot, prev, new_slot, z, weight=1.0)


def _loop_close_step(
    state: SlamState,
    edges: PoseGraphEdges,
    edge_slot: jax.Array,
    loop: LoopCandidate,
    query_slot: jax.Array,
    pgo_iterations: int,
):
    """Add the verified loop edge, optimize the pose graph, propagate the
    correction to landmarks and to the tracker's current pose."""
    edges = add_edge(
        edges, edge_slot, query_slot, jnp.maximum(loop.cand, 0),
        loop.rel_pose, weight=2.0,
    )
    old_R, old_t = state.kfs.R, state.kfs.t
    newest = jnp.maximum(state.track.kf_counter - 1, 0)
    old_kf = SE3(old_R[newest], old_t[newest])

    kfs, stats = optimize_pose_graph(
        state.kfs, edges, state.track.kf_counter,
        max_nodes=state.kfs.capacity, iterations=pgo_iterations,
    )
    lms = correct_landmarks(state.track.lms, old_R, old_t, kfs)

    new_kf = SE3(kfs.R[newest], kfs.t[newest])
    rel = state.track.pose @ old_kf.inverse()
    track = state.track._replace(
        pose=rel @ new_kf, last_kf_pose=new_kf, lms=lms
    )
    return SlamState(track=track, kfs=kfs), edges, stats.rmse_after


class SlamSystem:
    """Host facade: feed frames, get poses (reference `SLAMSystem` API)."""

    def __init__(
        self,
        cam: PinholeCamera,
        fcfg: FeatureConfig = FeatureConfig(),
        tcfg: TrackingConfig = TrackingConfig(),
        ba_window: int = 8,
        ba_max_points: int = 4096,
        ba_iterations: int = 6,
        ba_every_kf: int = 1,
        loop_every_kf: int = 5,
        loop_min_gap: int = 30,
        loop_min_score: float = 0.05,
        loop_min_inliers: int = 25,
        reloc_min_inliers: int = 20,
        pgo_iterations: int = 8,
        gba_after_loop: bool = True,
        gba_window: int = 16,
        gba_iterations: int = 4,
        gba_sweeps: int = 2,
        focal_x_baseline: float = 0.0,  # fx*b for stereo frames
        max_disparity: int = 64,
    ):
        self.cam = cam
        self.tcfg = tcfg
        self.focal_x_baseline = focal_x_baseline
        self.ba_every_kf = ba_every_kf
        self.loop_every_kf = loop_every_kf
        self.pose_buffer = PoseBuffer()

        self._detect = jax.jit(
            functools.partial(detect_and_describe, cfg=fcfg)
        )
        self._track = jax.jit(functools.partial(track_frame, cam=cam, tcfg=tcfg))
        self._init = jax.jit(
            functools.partial(initialize_from_frame, cam=cam, tcfg=tcfg)
        )
        self._insert = jax.jit(
            functools.partial(_insert_kf_step, cam=cam, tcfg=tcfg)
        )
        self._ba = jax.jit(
            functools.partial(
                _ba_step, cam=cam, window=ba_window,
                max_points=ba_max_points, iterations=ba_iterations,
            )
        )

        self._loop_detect = jax.jit(
            functools.partial(
                detect_loop,
                cam=cam,
                tcfg=tcfg,
                min_gap=loop_min_gap,
                min_score=loop_min_score,
                min_inliers=loop_min_inliers,
            )
        )
        self._loop_close = jax.jit(
            functools.partial(_loop_close_step, pgo_iterations=pgo_iterations)
        )
        self._add_odo_edge = jax.jit(_add_odometry_edge)
        self._ref_rel = jax.jit(_frame_ref_rel)
        self._reloc = jax.jit(
            functools.partial(
                _reloc_step, cam=cam, tcfg=tcfg,
                min_inliers=reloc_min_inliers,
            )
        )
        self.num_relocalizations = 0
        self.gba_after_loop = gba_after_loop
        self._gba = jax.jit(
            functools.partial(
                _gba_step, cam=cam, window=gba_window,
                max_points=ba_max_points, iterations=gba_iterations,
                sweeps=gba_sweeps,
            )
        )
        if focal_x_baseline > 0:
            def _stereo(gray_l, gray_r, uv, valid):
                d, ok = stereo_keypoint_depth(
                    gray_l, gray_r, uv, valid,
                    focal_x_baseline=focal_x_baseline,
                    max_disparity=max_disparity,
                    min_depth=tcfg.min_depth, max_depth=tcfg.max_depth,
                )
                return sparse_depth_image(uv, d, ok, cam.height, cam.width)

            self._stereo_depth = jax.jit(_stereo)

        from ra_slam_tpu.features.orb import keypoint_capacity

        self.state = SlamState(
            track=create_track_state(tcfg.max_map_points),
            kfs=create_keyframes(tcfg.max_keyframes, keypoint_capacity(fcfg)),
        )
        self.edges = create_edges(2 * tcfg.max_keyframes)
        self._n_edges = 0
        self.num_loop_closures = 0
        self._frames: list[Tuple[int, float]] = []  # (frame_id, timestamp)
        # per-frame (frame_id, timestamp, ref_kf_slot, rel R 3x3, rel t 3)
        # for matched-trajectory export (reference frame statistics,
        # `/root/reference/modules/slam_module.cc:38-54`)
        self._frame_stats: list[
            Tuple[int, float, int, np.ndarray, np.ndarray]
        ] = []

    # ------------------------------------------------------------------
    def feed_rgbd_frame(
        self,
        rgb: np.ndarray,  # [H, W, 3] uint8/float
        depth: np.ndarray,  # [H, W] float32 meters
        timestamp: float,
        frame_id: Optional[int] = None,
        pose_hint: Optional[SE3] = None,
    ) -> FrameInfo:
        """Track one RGB-D frame; returns (pose, tracked, ...) feedback
        (reference `feed_RGBD_images_w_feedback`)."""
        gray = rgb_to_gray(jnp.asarray(rgb, jnp.float32))
        kp = self._detect(gray)
        depth_j = jnp.asarray(depth, jnp.float32)
        return self._feed(kp, depth_j, timestamp, frame_id, pose_hint)

    def feed_stereo_frame(
        self,
        left: np.ndarray,  # [H, W, 3] or [H, W] rectified left
        right: np.ndarray,  # rectified right
        timestamp: float,
        frame_id: Optional[int] = None,
        pose_hint: Optional[SE3] = None,
    ) -> FrameInfo:
        """Track one rectified stereo pair: per-keypoint epipolar ZNCC
        depth feeds the same landmark path as RGB-D (reference
        `feed_stereo_images_w_feedback`,
        `/root/reference/modules/slam_module.cc:143-163`)."""
        assert self.focal_x_baseline > 0, (
            "stereo tracking needs focal_x_baseline (see StereoRectifier)"
        )
        l = jnp.asarray(left, jnp.float32)
        r = jnp.asarray(right, jnp.float32)
        gray_l = rgb_to_gray(l) if l.ndim == 3 else l
        gray_r = rgb_to_gray(r) if r.ndim == 3 else r
        kp = self._detect(gray_l)
        depth_img = self._stereo_depth(gray_l, gray_r, kp.uv, kp.valid)
        return self._feed(kp, depth_img, timestamp, frame_id, pose_hint)

    def _feed(
        self,
        kp: Keypoints,
        depth_j: jax.Array,
        timestamp: float,
        frame_id: Optional[int],
        pose_hint: Optional[SE3],
    ) -> FrameInfo:
        fid = len(self._frames) if frame_id is None else frame_id
        self._frames.append((fid, timestamp))

        if not bool(self.state.track.initialized):
            pose0 = pose_hint if pose_hint is not None else SE3.identity()
            track, lm_idx = self._init(self.state.track, kp, depth_j, pose=pose0)
            state = SlamState(track=track, kfs=self.state.kfs)
            # initialize_from_frame bumped the counter; record kf 0 in the db
            obs_w = (kp.valid & (lm_idx >= 0)).astype(jnp.float32)
            kfs = insert_keyframe(
                state.kfs, jnp.int32(0), track.pose, jnp.int32(fid),
                jnp.float32(timestamp), lm_idx, kp.uv, obs_w, kp.desc,
            )
            self.state = SlamState(track=track, kfs=kfs)
            self.pose_buffer.register(timestamp, track.pose)
            self._frame_stats.append(
                (fid, timestamp, 0, np.eye(3, dtype=np.float32),
                 np.zeros(3, np.float32))
            )
            return FrameInfo(track.pose, True, 0, 0, True, 0.0)

        state = self.state
        track, res = self._track(state.track, kp)
        state = SlamState(track=track, kfs=state.kfs)

        relocalized = False
        if bool(track.lost):
            state, rres = self._reloc(state, kp)
            if bool(rres.accepted):
                relocalized = True
                self.num_relocalizations += 1

        inserted = False
        loop_closed = False
        ba_rmse = float("nan")
        if bool(res.need_keyframe):
            state = self._insert(
                state, kp, depth_j, res.lm_idx,
                jnp.int32(fid), jnp.float32(timestamp),
            )
            inserted = True
            kfc = int(state.track.kf_counter)
            if kfc >= 2 and self._n_edges < self.edges.capacity:
                self.edges = self._add_odo_edge(
                    self.edges, jnp.int32(self._n_edges), state.kfs,
                    jnp.int32(kfc - 1),
                )
                self._n_edges += 1
            if kfc % self.ba_every_kf == 0:
                state, rmse = self._ba(state)
                ba_rmse = float(rmse)
            if (
                kfc % self.loop_every_kf == 0
                and self._n_edges + 1 < self.edges.capacity
            ):
                newest = jnp.int32(kfc - 1)
                loop = self._loop_detect(
                    state.kfs, state.track.lms, newest, state.track.kf_counter
                )
                if bool(loop.accepted):
                    state, self.edges, _ = self._loop_close(
                        state, self.edges, jnp.int32(self._n_edges), loop, newest
                    )
                    self._n_edges += 1
                    self.num_loop_closures += 1
                    loop_closed = True
                    if self.gba_after_loop:
                        # map-wide structure refinement after the
                        # pose-graph correction (OpenVSLAM's background
                        # global BA role, SURVEY.md §2.8)
                        state, rmse = self._gba(state)
                        ba_rmse = float(rmse)

        self.state = state
        tracked = not bool(state.track.lost)
        if tracked:
            self.pose_buffer.register(timestamp, state.track.pose)
            ref, rel_R, rel_t = self._ref_rel(state)
            self._frame_stats.append(
                (fid, timestamp, int(ref),
                 np.asarray(rel_R), np.asarray(rel_t))
            )
        return FrameInfo(
            pose=state.track.pose,
            tracked=tracked,
            num_inliers=int(res.num_inliers),
            num_matches=int(res.num_matches),
            inserted_keyframe=inserted,
            ba_rmse=ba_rmse,
            loop_closed=loop_closed,
            relocalized=relocalized,
        )

    # ------------------------------------------------------------------
    @property
    def lost(self) -> bool:
        """True while tracking is lost (pre-relocalization)."""
        return bool(self.state.track.lost)

    def query_pose(self, timestamp: float) -> Optional[SE3]:
        """Interpolated cam_T_world for a mapper timestamp (the facade's
        `query_camera_pose`, `/root/reference/disinfect_slam/disinfect_slam.cc`)."""
        return self.pose_buffer.query(timestamp)

    def trajectory(self) -> list[Tuple[int, np.ndarray]]:
        """(frame_id, 3x4 cam_T_world) rows for **every tracked frame**,
        composed as `cTw = cTk · kTw` from each frame's reference-keyframe
        statistics and the *current* (BA/PGO-refined) keyframe poses — the
        reference's `SaveMatchedTrajectory` semantics, where later
        refinements propagate to all frames
        (`/root/reference/modules/slam_module.cc:20-66`)."""
        kfs = self.state.kfs
        Rk = np.asarray(kfs.R)
        tk = np.asarray(kfs.t)
        out = []
        for fid, _ts, ref, rel_R, rel_t in self._frame_stats:
            R = rel_R @ Rk[ref]
            t = rel_R @ tk[ref] + rel_t
            out.append((fid, np.concatenate([R, t[:, None]], axis=1)))
        return out

    def keyframe_trajectory(self) -> list[Tuple[int, np.ndarray]]:
        """(frame_id, 3x4 cam_T_world) rows for keyframes only."""
        kfs = self.state.kfs
        n = int(self.state.track.kf_counter)
        out = []
        for k in range(n):
            m = np.concatenate(
                [np.asarray(kfs.R[k]), np.asarray(kfs.t[k])[:, None]], axis=1
            )
            out.append((int(kfs.frame_id[k]), m))
        return out
