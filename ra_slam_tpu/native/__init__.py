"""ctypes bindings for the C++ native runtime (`runtime.cc`).

Builds the shared library on first import if missing/stale (g++, links
zlib + libjpeg), then exposes:

  NativeSensReader  — RGBDDataset over .sens backed by the C++ decoder
  SensPrefetcher    — N decode threads + ordered ring; iterate decoded
                      frames while the device computes
  ByteQueue         — bounded drop-on-overrun blob queue (the data
                      logger / TSDF feed-queue semantics,
                      `/root/reference/utils/data_logger.hpp:14-81`)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "runtime.cc")
_SO = os.path.join(_DIR, "libra_slam_native.so")


def ensure_built() -> str:
    """Compile runtime.cc -> .so when missing or older than the source."""
    if (
        not os.path.exists(_SO)
        or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
            "-o", _SO, "-lz", "-ljpeg", "-lpng16", "-lpthread",
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _SO


_lib = None


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(ensure_built())
    lib.sens_open.restype = ctypes.c_void_p
    lib.sens_open.argtypes = [ctypes.c_char_p]
    lib.sens_close.argtypes = [ctypes.c_void_p]
    lib.sens_info.restype = ctypes.c_int
    lib.sens_info.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_int)
    ] * 5 + [ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.sens_pose.restype = ctypes.c_int
    lib.sens_pose.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)
    ]
    lib.sens_timestamp.restype = ctypes.c_double
    lib.sens_timestamp.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sens_decode.restype = ctypes.c_int
    lib.sens_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint16),
    ]
    lib.prefetch_create.restype = ctypes.c_void_p
    lib.prefetch_create.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.prefetch_next.restype = ctypes.c_int
    lib.prefetch_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_double),
    ]
    lib.prefetch_destroy.argtypes = [ctypes.c_void_p]
    lib.queue_create.restype = ctypes.c_void_p
    lib.queue_create.argtypes = [ctypes.c_int]
    lib.queue_push.restype = ctypes.c_int
    lib.queue_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
    lib.queue_pop.restype = ctypes.c_long
    lib.queue_pop.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_double
    ]
    lib.queue_close.argtypes = [ctypes.c_void_p]
    lib.queue_dropped.restype = ctypes.c_long
    lib.queue_dropped.argtypes = [ctypes.c_void_p]
    lib.queue_size.restype = ctypes.c_long
    lib.queue_size.argtypes = [ctypes.c_void_p]
    lib.queue_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _u16p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeSensReader:
    """C++-backed .sens reader with the RGBDDataset frame interface."""

    def __init__(self, path: str, target_size: Optional[Tuple[int, int]] = None):
        self._lib = load()
        self._h = self._lib.sens_open(path.encode())
        if not self._h:
            raise IOError(f"failed to open {path}")
        n = ctypes.c_int()
        cw, ch, dw, dh = (ctypes.c_int() for _ in range(4))
        shift = ctypes.c_float()
        k = np.zeros(16, np.float32)
        self._lib.sens_info(
            self._h, ctypes.byref(n), ctypes.byref(cw), ctypes.byref(ch),
            ctypes.byref(dw), ctypes.byref(dh), ctypes.byref(shift), _f32p(k),
        )
        self.n_frames = n.value
        self.color_size = (cw.value, ch.value)
        self.depth_size = (dw.value, dh.value)
        self.depth_shift = shift.value
        self.intrinsic = k.reshape(4, 4)
        self._out_w, self._out_h = target_size or self.depth_size

    def __len__(self) -> int:
        return self.n_frames

    @property
    def camera(self):
        from ra_slam_tpu.core.camera import PinholeCamera

        sx = self._out_w / self.depth_size[0]
        sy = self._out_h / self.depth_size[1]
        return PinholeCamera.create(
            fx=float(self.intrinsic[0, 0]) * sx,
            fy=float(self.intrinsic[1, 1]) * sy,
            cx=float(self.intrinsic[0, 2]) * sx,
            cy=float(self.intrinsic[1, 2]) * sy,
            width=self._out_w, height=self._out_h,
        )

    @property
    def depth_factor(self) -> float:
        return float(self.depth_shift)

    def pose(self, idx: int) -> np.ndarray:
        c2w = np.zeros(16, np.float32)
        if self._lib.sens_pose(self._h, idx, _f32p(c2w)) != 0:
            raise IndexError(idx)
        return np.linalg.inv(c2w.reshape(4, 4).astype(np.float64)).astype(
            np.float32
        )

    def _finish_frame(self, idx, rgb, depth_raw, c2w, ts):
        import cv2

        from ra_slam_tpu.io.dataset import Frame

        if rgb.shape[:2] != (self._out_h, self._out_w):
            rgb = cv2.resize(rgb, (self._out_w, self._out_h))
        if depth_raw.shape != (self._out_h, self._out_w):
            depth_raw = cv2.resize(
                depth_raw, (self._out_w, self._out_h),
                interpolation=cv2.INTER_NEAREST,
            )
        w2c = np.linalg.inv(c2w.astype(np.float64)).astype(np.float32)
        return Frame(
            frame_id=idx, timestamp=ts, rgb=rgb,
            depth=depth_raw.astype(np.float32) / self.depth_shift,
            cam_T_world=w2c,
        )

    def frame(self, idx: int):
        cw, ch = self.color_size
        dw, dh = self.depth_size
        rgb = np.empty((ch, cw, 3), np.uint8)
        depth = np.empty((dh, dw), np.uint16)
        st = self._lib.sens_decode(self._h, idx, _u8p(rgb), _u16p(depth))
        if st != 0:
            raise IOError(f"decode failed for frame {idx}: {st}")
        ts = float(self._lib.sens_timestamp(self._h, idx))
        c2w = np.zeros(16, np.float32)
        self._lib.sens_pose(self._h, idx, _f32p(c2w))
        return self._finish_frame(idx, rgb, depth, c2w.reshape(4, 4), ts)

    def __iter__(self):
        for i in range(len(self)):
            yield self.frame(i)

    def prefetch(self, num_threads: int = 2, capacity: int = 8) -> "Iterator":
        """Iterate frames decoded ahead by C++ worker threads."""
        p = self._lib.prefetch_create(self._h, num_threads, capacity)
        if not p:
            raise RuntimeError("prefetch_create failed")
        cw, ch = self.color_size
        dw, dh = self.depth_size
        try:
            while True:
                rgb = np.empty((ch, cw, 3), np.uint8)
                depth = np.empty((dh, dw), np.uint16)
                c2w = np.zeros(16, np.float32)
                ts = ctypes.c_double()
                idx = self._lib.prefetch_next(
                    p, _u8p(rgb), _u16p(depth), _f32p(c2w), ctypes.byref(ts)
                )
                if idx == -1:
                    return
                if idx == -2:
                    raise IOError("prefetch decode error")
                yield self._finish_frame(
                    idx, rgb, depth, c2w.reshape(4, 4), ts.value
                )
        finally:
            self._lib.prefetch_destroy(p)

    def close(self) -> None:
        if self._h:
            self._lib.sens_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class ByteQueue:
    """Bounded drop-on-overrun queue of byte blobs (C++ backed)."""

    def __init__(self, capacity: int = 16):
        self._lib = load()
        self._h = self._lib.queue_create(capacity)

    def push(self, data: bytes) -> bool:
        """True if queued, False if dropped (queue full / closed)."""
        return (
            self._lib.queue_push(self._h, data, len(data)) == 0
        )

    def pop(self, max_bytes: int = 1 << 22, timeout: float = -1.0):
        """Blocking pop; None on timeout, raises StopIteration when
        closed and drained."""
        buf = ctypes.create_string_buffer(max_bytes)
        n = self._lib.queue_pop(self._h, buf, max_bytes, timeout)
        if n == 0:
            return None
        if n < 0:
            raise StopIteration
        return buf.raw[:n]

    def close(self) -> None:
        self._lib.queue_close(self._h)

    @property
    def dropped(self) -> int:
        return int(self._lib.queue_dropped(self._h))

    def __len__(self) -> int:
        return int(self._lib.queue_size(self._h))

    def destroy(self) -> None:
        if self._h:
            self._lib.queue_destroy(self._h)
            self._h = None


__all__ = ["ByteQueue", "NativeSensReader", "ensure_built", "load"]
