"""Stereo rectification.

Parity with the reference's `StereoRectifier`
(`/root/reference/utils/stereo_rectifier.cc:10-102`): build
undistort/rectify maps from a `Calibration.left/right.*` YAML block
(Rodrigues rotation vector + translation), rectify image pairs, and
expose the rectified pinhole intrinsics including `focal_x_baseline`.
Host-side preprocessing uses OpenCV exactly like the reference; the
rectified images feed the JAX tracking/stereo-matching path.

`rewrite_camera_config` mirrors `GetAndSetConfig`
(`/root/reference/utils/config_reader.hpp:32-42`): the raw YAML camera
block is replaced with the rectified intrinsics before tracking sees it.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ra_slam_tpu.core.camera import PinholeCamera


@dataclasses.dataclass(frozen=True)
class CalibMono:
    fx: float
    fy: float
    cx: float
    cy: float
    distortion: List[float]  # k1 k2 p1 p2 [k3]


@dataclasses.dataclass(frozen=True)
class CalibStereo:
    left: CalibMono
    right: CalibMono
    rotation: List[float]  # Rodrigues vector, right_R_left
    translation: List[float]  # right_t_left (meters)


def _k_matrix(c: CalibMono) -> np.ndarray:
    return np.array(
        [[c.fx, 0, c.cx], [0, c.fy, c.cy], [0, 0, 1]], np.float64
    )


class StereoRectifier:
    def __init__(self, img_size: Tuple[int, int], calib: CalibStereo):
        """img_size = (width, height)."""
        import cv2

        K_l, K_r = _k_matrix(calib.left), _k_matrix(calib.right)
        D_l = np.array(calib.left.distortion, np.float64)
        D_r = np.array(calib.right.distortion, np.float64)
        R, _ = cv2.Rodrigues(np.array(calib.rotation, np.float64))
        t = np.array(calib.translation, np.float64).reshape(3, 1)

        R_l, R_r, P_l, P_r, Q, _, _ = cv2.stereoRectify(
            K_l, D_l, K_r, D_r, img_size, R, t,
            flags=cv2.CALIB_ZERO_DISPARITY, alpha=0, newImageSize=img_size,
        )
        self.cam_rect_matrix = P_r  # rectified 3x4 (reference keeps P_r)
        self.reproj_mat = Q
        self._map_l = cv2.initUndistortRectifyMap(
            K_l, D_l, R_l, P_l, img_size, cv2.CV_32FC1
        )
        self._map_r = cv2.initUndistortRectifyMap(
            K_r, D_r, R_r, P_r, img_size, cv2.CV_32FC1
        )
        self.img_size = img_size

    @staticmethod
    def from_yaml(path: str) -> "StereoRectifier":
        import yaml

        with open(path) as f:
            node = yaml.safe_load(f)
        size = (int(node["Camera.cols"]), int(node["Camera.rows"]))
        calib = CalibStereo(
            left=CalibMono(
                fx=float(node["Calibration.left.fx"]),
                fy=float(node["Calibration.left.fy"]),
                cx=float(node["Calibration.left.cx"]),
                cy=float(node["Calibration.left.cy"]),
                distortion=[float(v) for v in node["Calibration.left.distortion"]],
            ),
            right=CalibMono(
                fx=float(node["Calibration.right.fx"]),
                fy=float(node["Calibration.right.fy"]),
                cx=float(node["Calibration.right.cx"]),
                cy=float(node["Calibration.right.cy"]),
                distortion=[float(v) for v in node["Calibration.right.distortion"]],
            ),
            rotation=[float(v) for v in node["Calibration.rotation"]],
            translation=[float(v) for v in node["Calibration.translation"]],
        )
        return StereoRectifier(size, calib)

    def rectify(
        self, img_l: np.ndarray, img_r: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        import cv2

        out_l = cv2.remap(img_l, *self._map_l, interpolation=cv2.INTER_LINEAR)
        out_r = cv2.remap(img_r, *self._map_r, interpolation=cv2.INTER_LINEAR)
        return out_l, out_r

    @property
    def rectified_intrinsics(self) -> np.ndarray:
        """3x4 rectified projection (reference `RectifiedIntrinsics`)."""
        return np.asarray(self.cam_rect_matrix)

    @property
    def focal_x_baseline(self) -> float:
        """fx * baseline (meters*pixels) — P_r[0,3] = -fx*b for the right
        camera with CALIB_ZERO_DISPARITY."""
        return float(abs(self.cam_rect_matrix[0, 3]))

    def rectified_camera(self) -> PinholeCamera:
        P = self.cam_rect_matrix
        return PinholeCamera.create(
            fx=float(P[0, 0]), fy=float(P[1, 1]),
            cx=float(P[0, 2]), cy=float(P[1, 2]),
            width=self.img_size[0], height=self.img_size[1],
        )


def rewrite_camera_config(cfg, rectifier: StereoRectifier):
    """Return a SystemConfig whose camera block holds the rectified
    intrinsics + focal_x_baseline (reference `GetAndSetConfig`)."""
    import dataclasses as dc

    P = rectifier.cam_rect_matrix
    cam = dc.replace(
        cfg.camera,
        fx=float(P[0, 0]), fy=float(P[1, 1]),
        cx=float(P[0, 2]), cy=float(P[1, 2]),
        width=rectifier.img_size[0], height=rectifier.img_size[1],
        focal_x_baseline=rectifier.focal_x_baseline,
    )
    return dc.replace(cfg, camera=cam)
