"""Synthetic RGB-D scenes with analytic ground truth.

The reference has no synthetic data path — its deterministic replay
fixture is a logged real dataset (`/root/reference/utils/offline_data_provider/
folder_reader.h:36-47`). For a hardware-portable framework we add an
analytic generator: a colored axis-aligned box room rendered by exact
ray-box intersection, with a parametric orbit trajectory. Gives
pixel-perfect depth + pose ground truth for map/tracking/BA tests and
benchmarks with zero dataset downloads.

Everything here is host-side numpy (it plays the role of a camera
driver / dataset decoder, cf. `/root/reference/cameras/`).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ra_slam_tpu.core.camera import PinholeCamera
from ra_slam_tpu.io.dataset import Frame, RGBDDataset

# Per-face wall colors (+x, -x, +y, -y, +z, -z), and which faces are
# "high-touch" for semantic GT (the +x wall plays the role of the
# reference's high-touch class).
_FACE_COLORS = np.array(
    [
        [200, 60, 60],  # +x  (high touch)
        [60, 200, 60],  # -x
        [60, 60, 200],  # +y
        [200, 200, 60],  # -y
        [200, 60, 200],  # +z
        [60, 200, 200],  # -z
    ],
    dtype=np.float32,
)
_FACE_HT = np.array([0.95, 0.05, 0.05, 0.05, 0.05, 0.05], dtype=np.float32)


def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, -1.0, 0.0)) -> np.ndarray:
    """world_T_cam (camera-to-world) 4x4 for a camera at `eye` looking at
    `target`. Camera convention: +z forward, +x right, +y down (OpenCV)."""
    fwd = np.asarray(target, np.float64) - np.asarray(eye, np.float64)
    fwd = fwd / np.linalg.norm(fwd)
    upv = np.asarray(up, np.float64)
    right = np.cross(-upv, fwd)  # x = (-up) x z for y-down convention
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    m = np.eye(4)
    m[:3, 0] = right
    m[:3, 1] = down
    m[:3, 2] = fwd
    m[:3, 3] = eye
    return m.astype(np.float32)


def render_box_room(
    cam: "SyntheticCameraSpec",
    world_T_cam: np.ndarray,
    half_extents: np.ndarray,
    checker: float = 0.5,
):
    """Exact render of the inside of an axis-aligned box centered at the
    origin. Returns (rgb uint8 [H,W,3], depth float32 [H,W] z-meters,
    ht float32 [H,W], lt float32 [H,W])."""
    H, W = cam.height, cam.width
    u = np.arange(W, dtype=np.float64)[None, :].repeat(H, 0)
    v = np.arange(H, dtype=np.float64)[:, None].repeat(W, 1)
    # camera-frame ray with z=1 so the intersection parameter IS the z-depth
    d_cam = np.stack(
        [(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, np.ones_like(u)], axis=-1
    )
    R = world_T_cam[:3, :3].astype(np.float64)
    o = world_T_cam[:3, 3].astype(np.float64)
    d_world = d_cam @ R.T  # [H, W, 3]

    he = np.asarray(half_extents, np.float64)
    # slab exit parameter per axis (camera is inside the box)
    with np.errstate(divide="ignore", invalid="ignore"):
        t_pos = (he[None, None] - o) / d_world
        t_neg = (-he[None, None] - o) / d_world
    t_exit = np.where(d_world > 0, t_pos, t_neg)
    t_exit = np.where(np.abs(d_world) < 1e-12, np.inf, t_exit)
    axis = np.argmin(t_exit, axis=-1)  # which wall
    t = np.take_along_axis(t_exit, axis[..., None], axis=-1)[..., 0]
    sign_pos = np.take_along_axis(d_world, axis[..., None], axis=-1)[..., 0] > 0
    face = axis * 2 + (~sign_pos).astype(np.int64)  # (+x,-x,+y,-y,+z,-z)

    hit = o + t[..., None] * d_world
    # Per-cell pseudo-random shading in the two in-plane coordinates.
    # NOT a binary checkerboard on purpose: FAST-9/16 cannot fire on
    # checkerboard X-junctions (two bright + two dark arcs of ~8 circle
    # pixels each, never 9 contiguous), so a checker room is effectively
    # textureless to the frontend. Hashed cell intensities make every
    # cell junction an L-corner between >=3 distinct levels, which FAST
    # detects and ORB matches view-consistently.
    a1 = np.take_along_axis(hit, ((axis + 1) % 3)[..., None], -1)[..., 0]
    a2 = np.take_along_axis(hit, ((axis + 2) % 3)[..., None], -1)[..., 0]
    i1 = np.floor(a1 / checker).astype(np.int64)
    i2 = np.floor(a2 / checker).astype(np.int64)
    h = (i1 * 73856093) ^ (i2 * 19349663) ^ (face * 83492791)
    h = (h ^ (h >> 13)) * 1274126177
    shade = 0.45 + 0.55 * (((h ^ (h >> 16)) & 0xFF).astype(np.float64) / 255.0)

    rgb = (_FACE_COLORS[face] * shade[..., None]).clip(0, 255).astype(np.uint8)
    depth = t.astype(np.float32)
    ht = _FACE_HT[face]
    lt = (1.0 - ht).astype(np.float32)
    return rgb, depth, ht.astype(np.float32), lt


@dataclasses.dataclass(frozen=True)
class SyntheticCameraSpec:
    fx: float = 320.0
    fy: float = 320.0
    cx: float = 319.5
    cy: float = 239.5
    width: int = 640
    height: int = 480


class SyntheticBoxDataset(RGBDDataset):
    """Orbit inside a colored box room.

    The camera circles the room center at `radius`, always looking at the
    wall it faces (outward), covering all four side walls over one loop.
    """

    def __init__(
        self,
        num_frames: int = 60,
        cam: SyntheticCameraSpec = SyntheticCameraSpec(),
        half_extents=(3.0, 2.0, 3.0),
        radius: float = 1.0,
        fps: float = 30.0,
        depth_noise: float = 0.0,
        seed: int = 0,
    ):
        self.num_frames = num_frames
        self.spec = cam
        self.half_extents = np.asarray(half_extents, np.float32)
        self.radius = radius
        self.fps = fps
        self.depth_noise = depth_noise
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self.num_frames

    @property
    def camera(self) -> PinholeCamera:
        s = self.spec
        return PinholeCamera.create(s.fx, s.fy, s.cx, s.cy, s.width, s.height)

    def world_T_cam(self, idx: int) -> np.ndarray:
        ang = 2.0 * np.pi * idx / self.num_frames
        eye = np.array(
            [self.radius * np.cos(ang), 0.0, self.radius * np.sin(ang)]
        )
        target = np.array([2.0 * np.cos(ang), 0.0, 2.0 * np.sin(ang)])
        return look_at(eye, target)

    def frame(self, idx: int) -> Frame:
        wTc = self.world_T_cam(idx)
        rgb, depth, ht, lt = render_box_room(self.spec, wTc, self.half_extents)
        if self.depth_noise > 0:
            rng = np.random.default_rng(idx * 7919 + 13)
            depth = depth + rng.normal(0, self.depth_noise, depth.shape).astype(
                np.float32
            ) * depth
        cTw = np.linalg.inv(wTc.astype(np.float64)).astype(np.float32)
        return Frame(
            frame_id=idx,
            timestamp=idx / self.fps,
            rgb=rgb,
            depth=depth,
            cam_T_world=cTw,
            ht=ht,
            lt=lt,
        )
