"""ScanNet `.sens` sequence reader (and writer, for tests/export).

Pure-Python decoder for the ScanNet binary capture format, replacing the
reference's vendored `ml::SensorData` C++ decoder
(`/root/reference/third_party/scannet/sensorData.hpp:491-530`, consumed
by `/root/reference/utils/offline_data_provider/scannet_sens_reader.cc`).

File layout (little-endian, version 4):

    u32  version
    u64  sensor-name length, then that many bytes
    4x4 f32 color intrinsic | 4x4 f32 color extrinsic
    4x4 f32 depth intrinsic | 4x4 f32 depth extrinsic
    i32  color compression (0 raw, 1 png, 2 jpeg)
    i32  depth compression (0 raw_ushort, 1 zlib_ushort, 2 occi_ushort)
    u32  colorWidth, colorHeight, depthWidth, depthHeight
    f32  depthShift (raw units per meter)
    u64  numFrames, then per frame:
        4x4 f32 camera-to-world, u64 tsColor, u64 tsDepth,
        u64 colorBytes, u64 depthBytes, color blob, depth blob
    u64  numIMUFrames, then 5*vec3d + u64 each (skipped)

Reader semantics match `scannet_sens_reader.cc`: intrinsics come from
the depth calibration, extrinsics are asserted identity, color is
resized to the depth resolution, and the stored camera-to-world pose is
inverted to cam_T_world (`scannet_sens_reader.cc:70-78`).
"""

from __future__ import annotations

import struct
import zlib
from typing import BinaryIO, List, Optional, Sequence, Tuple

import numpy as np

from ra_slam_tpu.core.camera import PinholeCamera
from ra_slam_tpu.io.dataset import Frame, RGBDDataset

COLOR_RAW, COLOR_PNG, COLOR_JPEG = 0, 1, 2
DEPTH_RAW_USHORT, DEPTH_ZLIB_USHORT, DEPTH_OCCI_USHORT = 0, 1, 2

_MAT4 = struct.Struct("<16f")
_FRAME_HDR = struct.Struct("<16fQQQQ")


def _read_exact(f: BinaryIO, n: int) -> bytes:
    buf = f.read(n)
    if len(buf) != n:
        raise EOFError(f"truncated .sens file: wanted {n} bytes, got {len(buf)}")
    return buf


def _read_mat4(f: BinaryIO) -> np.ndarray:
    return np.array(_MAT4.unpack(_read_exact(f, 64)), np.float32).reshape(4, 4)


def _decode_image_blob(blob: bytes) -> np.ndarray:
    import cv2

    img = cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("failed to decode color blob")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class SensReader(RGBDDataset):
    """Random-access reader over a `.sens` file.

    Frame headers and blob offsets are indexed once at open; per-frame
    decode (JPEG + zlib inflate) happens lazily in `frame()` so a
    prefetcher thread can overlap it with device compute.
    """

    def __init__(self, path: str, target_size: Optional[Tuple[int, int]] = None):
        self.path = path
        self._f = open(path, "rb")
        f = self._f

        (self.version,) = struct.unpack("<I", _read_exact(f, 4))
        (name_len,) = struct.unpack("<Q", _read_exact(f, 8))
        self.sensor_name = _read_exact(f, name_len).decode("ascii", "replace")

        self.color_intrinsic = _read_mat4(f)
        self.color_extrinsic = _read_mat4(f)
        self.depth_intrinsic = _read_mat4(f)
        self.depth_extrinsic = _read_mat4(f)
        if not np.allclose(self.depth_extrinsic, np.eye(4)):
            raise ValueError(
                "ScanNet depth extrinsics must be identity "
                "(scannet_sens_reader.cc:20-36 semantics)"
            )

        self.color_compression, self.depth_compression = struct.unpack(
            "<ii", _read_exact(f, 8)
        )
        (
            self.color_width,
            self.color_height,
            self.depth_width,
            self.depth_height,
        ) = struct.unpack("<4I", _read_exact(f, 16))
        (self.depth_shift,) = struct.unpack("<f", _read_exact(f, 4))

        (num_frames,) = struct.unpack("<Q", _read_exact(f, 8))
        # index pass: record header values + blob offsets, skip blobs
        self._poses: List[np.ndarray] = []
        self._ts: List[float] = []
        self._blob_ofs: List[Tuple[int, int, int, int]] = []
        for _ in range(num_frames):
            hdr = _FRAME_HDR.unpack(_read_exact(f, _FRAME_HDR.size))
            c2w = np.array(hdr[:16], np.float32).reshape(4, 4)
            ts_color, _ts_depth, color_bytes, depth_bytes = hdr[16:]
            ofs = f.tell()
            f.seek(color_bytes + depth_bytes, 1)
            self._poses.append(c2w)
            self._ts.append(ts_color * 1e-6)  # microseconds -> seconds
            self._blob_ofs.append((ofs, color_bytes, ofs + color_bytes, depth_bytes))

        # output resolution: reference fixes 640x480 (= ScanNet depth res)
        self._out_w, self._out_h = target_size or (
            int(self.depth_width),
            int(self.depth_height),
        )

    # -- RGBDDataset interface ------------------------------------------------
    def __len__(self) -> int:
        return len(self._poses)

    @property
    def camera(self) -> PinholeCamera:
        """Depth-camera intrinsics (`scannet_sens_reader.cc:12-18`),
        rescaled if a non-native target size was requested."""
        k = self.depth_intrinsic
        sx = self._out_w / float(self.depth_width)
        sy = self._out_h / float(self.depth_height)
        return PinholeCamera.create(
            fx=float(k[0, 0]) * sx,
            fy=float(k[1, 1]) * sy,
            cx=float(k[0, 2]) * sx,
            cy=float(k[1, 2]) * sy,
            width=self._out_w,
            height=self._out_h,
        )

    @property
    def depth_factor(self) -> float:
        return float(self.depth_shift)

    def pose(self, idx: int) -> np.ndarray:
        """cam_T_world = inverse(stored camera-to-world)."""
        c2w = self._poses[idx].astype(np.float64)
        w2c = np.linalg.inv(c2w)
        return w2c.astype(np.float32)

    def _raw_color(self, idx: int) -> np.ndarray:
        ofs, nbytes, _, _ = self._blob_ofs[idx]
        self._f.seek(ofs)
        blob = _read_exact(self._f, nbytes)
        if self.color_compression in (COLOR_JPEG, COLOR_PNG):
            return _decode_image_blob(blob)
        arr = np.frombuffer(blob, np.uint8)
        return arr.reshape(self.color_height, self.color_width, 3)

    def _raw_depth(self, idx: int) -> np.ndarray:
        _, _, ofs, nbytes = self._blob_ofs[idx]
        self._f.seek(ofs)
        blob = _read_exact(self._f, nbytes)
        if self.depth_compression == DEPTH_ZLIB_USHORT:
            blob = zlib.decompress(blob)
        elif self.depth_compression != DEPTH_RAW_USHORT:
            raise NotImplementedError(
                f"depth compression {self.depth_compression} not supported"
            )
        arr = np.frombuffer(blob, "<u2")
        return arr.reshape(self.depth_height, self.depth_width)

    def frame(self, idx: int) -> Frame:
        import cv2

        rgb = self._raw_color(idx)
        if rgb.shape[:2] != (self._out_h, self._out_w):
            rgb = cv2.resize(rgb, (self._out_w, self._out_h))
        depth_raw = self._raw_depth(idx)
        if depth_raw.shape != (self._out_h, self._out_w):
            depth_raw = cv2.resize(
                depth_raw, (self._out_w, self._out_h), interpolation=cv2.INTER_NEAREST
            )
        depth = depth_raw.astype(np.float32) / self.depth_shift
        return Frame(
            frame_id=idx,
            timestamp=self._ts[idx],
            rgb=rgb,
            depth=depth,
            cam_T_world=self.pose(idx),
        )

    def close(self) -> None:
        self._f.close()


def write_sens(
    path: str,
    rgbs: Sequence[np.ndarray],  # [H, W, 3] uint8 each
    depths_raw: Sequence[np.ndarray],  # [H, W] uint16 each
    camera_to_world: Sequence[np.ndarray],  # [4, 4] float32 each
    intrinsic: np.ndarray,  # [4, 4] (or [3, 3]) float32
    depth_shift: float = 1000.0,
    sensor_name: str = "ra_slam_tpu",
    timestamps_us: Optional[Sequence[int]] = None,
    color_compression: int = COLOR_JPEG,
) -> None:
    """Write a version-4 `.sens` file (JPEG or PNG color + zlib depth).

    Mirrors `SensorData::saveToFile` (`sensorData.hpp:296-340`); used for
    fixtures and for re-exporting captured sequences. ScanNet v2 ships
    JPEG color, but the format allows PNG (`sensorData.hpp` TYPE_PNG) —
    both are supported for full format parity.
    """
    import cv2

    if color_compression not in (COLOR_JPEG, COLOR_PNG):
        raise ValueError("color_compression must be COLOR_JPEG or COLOR_PNG")

    k4 = np.eye(4, dtype=np.float32)
    intrinsic = np.asarray(intrinsic, np.float32)
    k4[: intrinsic.shape[0], : intrinsic.shape[1]] = intrinsic
    h, w = depths_raw[0].shape
    ch, cw = rgbs[0].shape[:2]

    with open(path, "wb") as f:
        f.write(struct.pack("<I", 4))
        name = sensor_name.encode("ascii")
        f.write(struct.pack("<Q", len(name)) + name)
        for mat in (k4, np.eye(4, dtype=np.float32), k4, np.eye(4, dtype=np.float32)):
            f.write(mat.astype("<f4").tobytes())
        f.write(struct.pack("<ii", color_compression, DEPTH_ZLIB_USHORT))
        f.write(struct.pack("<4I", cw, ch, w, h))
        f.write(struct.pack("<f", float(depth_shift)))
        f.write(struct.pack("<Q", len(rgbs)))
        for i, (rgb, d, c2w) in enumerate(zip(rgbs, depths_raw, camera_to_world)):
            if color_compression == COLOR_JPEG:
                ok, enc = cv2.imencode(
                    ".jpg",
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95],
                )
            else:
                ok, enc = cv2.imencode(
                    ".png", cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR)
                )
            assert ok
            color_blob = enc.tobytes()
            depth_blob = zlib.compress(
                np.ascontiguousarray(d, "<u2").tobytes(), 6
            )
            ts = int(timestamps_us[i]) if timestamps_us is not None else i * 33333
            f.write(
                _FRAME_HDR.pack(
                    *np.asarray(c2w, np.float32).reshape(-1).tolist(),
                    ts,
                    ts,
                    len(color_blob),
                    len(depth_blob),
                )
            )
            f.write(color_blob)
            f.write(depth_blob)
        f.write(struct.pack("<Q", 0))  # no IMU frames
