"""Thread-safe timestamped pose buffer.

Capability parity with the reference's `pose_manager`
(`/root/reference/utils/rotation_math/pose_manager.h:16`,
`pose_manager.cc:7-86`): tracking and mapping run at different sensor
rates, bridged only by this buffer — the tracker registers (timestamp,
pose) pairs, the mapper queries the pose for a depth frame's timestamp.

The reference binary-searches and snaps to the nearest pose, leaving
interpolation as a TODO (`pose_manager.cc:33`); we SLERP rotation and
lerp translation between the two bracketing poses. Host-side numpy: this
is cross-thread plumbing, not device compute.
"""

from __future__ import annotations

import bisect
import threading
from typing import Optional

import numpy as np

from ra_slam_tpu.core.se3 import SE3, mat_to_quat, quat_slerp, quat_to_mat


class PoseBuffer:
    """Monotonic timestamped cam_T_world buffer with interpolating query."""

    def __init__(self, capacity: int = 100_000):
        self._lock = threading.Lock()
        self._capacity = capacity
        self._ts: list[float] = []
        self._quat: list[np.ndarray] = []  # (w, x, y, z)
        self._trans: list[np.ndarray] = []
        # (timestamp, device SE3, device tracked flag) not yet synced
        self._pending: list = []

    def register_lazy(self, timestamp: float, pose: SE3, valid) -> None:
        """Queue a device-resident pose without forcing a host sync.

        The tracker calls this on its hot path; poses (and their tracked
        flags, still device scalars) are pulled in one bulk transfer the
        first time anything reads the buffer. Untracked poses are then
        discarded, preserving `register`'s only-valid-poses semantics."""
        with self._lock:
            self._pending.append((timestamp, pose, valid))

    def _flush(self) -> None:
        """Sync and register all pending lazy entries. Caller must NOT
        hold the lock."""
        with self._lock:
            pending, self._pending = self._pending, []
        if not pending:
            return
        import jax

        host = jax.device_get(
            [(p.R, p.t, v) for (_t, p, v) in pending]
        )
        for (ts, _p, _v), (R, t, v) in zip(pending, host):
            if bool(v):
                self.register(ts, SE3(np.asarray(R), np.asarray(t)))

    def __len__(self) -> int:
        self._flush()
        with self._lock:
            return len(self._ts)

    def register(self, timestamp: float, pose: SE3) -> None:
        """Record a valid tracked pose (invalid poses are simply not
        registered — the reference's lost-tracking behavior,
        `/root/reference/disinfect_slam/disinfect_slam.cc:45-51`)."""
        q = np.asarray(mat_to_quat(pose.R), np.float64)
        t = np.asarray(pose.t, np.float64)
        with self._lock:
            if self._ts and timestamp <= self._ts[-1]:
                # out-of-order registration: insert sorted (rare)
                i = bisect.bisect_left(self._ts, timestamp)
                self._ts.insert(i, timestamp)
                self._quat.insert(i, q)
                self._trans.insert(i, t)
            else:
                self._ts.append(timestamp)
                self._quat.append(q)
                self._trans.append(t)
            if len(self._ts) > self._capacity:
                del self._ts[0], self._quat[0], self._trans[0]

    def query(self, timestamp: float) -> Optional[SE3]:
        """Pose at `timestamp`, SLERP-interpolated between the bracketing
        registered poses (clamped at the ends). None if empty."""
        self._flush()
        with self._lock:
            if not self._ts:
                return None
            i = bisect.bisect_left(self._ts, timestamp)
            if i <= 0:
                q, t = self._quat[0], self._trans[0]
            elif i >= len(self._ts):
                q, t = self._quat[-1], self._trans[-1]
            else:
                t0, t1 = self._ts[i - 1], self._ts[i]
                u = 0.0 if t1 <= t0 else (timestamp - t0) / (t1 - t0)
                q = np.asarray(
                    quat_slerp(self._quat[i - 1], self._quat[i], u), np.float64
                )
                t = (1.0 - u) * self._trans[i - 1] + u * self._trans[i]
        R = np.asarray(quat_to_mat(q), np.float32)
        return SE3(R, t.astype(np.float32))

    def latest(self) -> Optional[SE3]:
        self._flush()
        with self._lock:
            if not self._ts:
                return None
            q, t = self._quat[-1], self._trans[-1]
        return SE3(np.asarray(quat_to_mat(q), np.float32), t.astype(np.float32))

    def entries(self):
        """Snapshot of (timestamp, SE3) pairs (for checkpointing)."""
        self._flush()
        with self._lock:
            ts = list(self._ts)
            qs = [np.array(q) for q in self._quat]
            trs = [np.array(t) for t in self._trans]
        return [
            (t, SE3(np.asarray(quat_to_mat(q), np.float32), tr.astype(np.float32)))
            for t, q, tr in zip(ts, qs, trs)
        ]
