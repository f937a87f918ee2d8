"""Asynchronous data logger.

Parity with the reference's generic double-buffered background-thread
logger (`/root/reference/utils/data_logger.hpp:14-81`): producers enqueue
items without blocking; a daemon thread drains and writes; when the
writer can't keep up the oldest pending batch is dropped with a warning
count (`data_logger.hpp:39-41`). `FrameLogger` is the concrete PNG
frame dumper used to capture replay datasets
(`examples/visual_slam/run_zed_native_l515.cc:39-58`).
"""

from __future__ import annotations

import logging
import os
import queue
import threading
from typing import Callable, Generic, List, Optional, Tuple, TypeVar

import numpy as np

T = TypeVar("T")
log = logging.getLogger("ra_slam_tpu")


class AsyncLogger(Generic[T]):
    """Background-thread writer with bounded buffering + drop counting."""

    def __init__(self, write_fn: Callable[[T], None], capacity: int = 32):
        self._write_fn = write_fn
        self._q: "queue.Queue[T]" = queue.Queue(maxsize=capacity)
        self._dropped = 0
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def log(self, item: T) -> bool:
        """Enqueue; returns False (and counts a drop) when full."""
        if self._closed:
            return False
        try:
            self._q.put_nowait(item)
            return True
        except queue.Full:
            self._dropped += 1
            log.warning("AsyncLogger overrun: dropped item (%d total)",
                        self._dropped)
            return False

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                self._write_fn(item)
            except Exception:  # pragma: no cover
                log.exception("AsyncLogger write failed")

    @property
    def dropped(self) -> int:
        return self._dropped

    def close(self) -> None:
        """Flush and join."""
        if not self._closed:
            self._closed = True
            self._q.put(None)
            self._thread.join()


class FrameLogger:
    """Logs (frame_id, rgb, depth[, ht, lt]) tuples to the replay-folder
    layout and records the ids for trajectory matching."""

    def __init__(self, folder: str, depth_factor: float = 1000.0,
                 capacity: int = 32):
        os.makedirs(folder, exist_ok=True)
        self.folder = folder
        self.depth_factor = depth_factor
        self.logged_ids: List[int] = []
        self._logger: AsyncLogger = AsyncLogger(self._write, capacity)

    def log_frame(
        self,
        frame_id: int,
        rgb: np.ndarray,
        depth: np.ndarray,
        ht: Optional[np.ndarray] = None,
        lt: Optional[np.ndarray] = None,
    ) -> bool:
        ok = self._logger.log((frame_id, rgb, depth, ht, lt))
        if ok:
            self.logged_ids.append(frame_id)
        return ok

    def _write(self, item: Tuple) -> None:
        import cv2

        fid, rgb, depth, ht, lt = item
        cv2.imwrite(
            os.path.join(self.folder, f"{fid}_rgb.png"),
            cv2.cvtColor(np.asarray(rgb, np.uint8), cv2.COLOR_RGB2BGR),
        )
        raw = np.clip(
            np.asarray(depth, np.float32) * self.depth_factor, 0, 65535
        ).astype(np.uint16)
        cv2.imwrite(os.path.join(self.folder, f"{fid}_depth.png"), raw)
        if ht is not None:
            cv2.imwrite(os.path.join(self.folder, f"{fid}_ht.png"),
                        (np.clip(ht, 0, 1) * 255).astype(np.uint8))
        if lt is not None:
            cv2.imwrite(os.path.join(self.folder, f"{fid}_no_ht.png"),
                        (np.clip(lt, 0, 1) * 255).astype(np.uint8))

    def save_trajectory(self, entries) -> None:
        """Write the matched trajectory for the logged frames
        (reference `SaveMatchedTrajectory` flow)."""
        from ra_slam_tpu.io.folder import save_trajectory

        logged = set(self.logged_ids)
        save_trajectory(
            os.path.join(self.folder, "trajectory.txt"),
            [(fid, m) for fid, m in entries if fid in logged],
        )

    @property
    def dropped(self) -> int:
        return self._logger.dropped

    def close(self) -> None:
        self._logger.close()
