"""Raw capture + factory-calibration tooling for stereo/RGB-D rigs.

Native replacement for the reference's capture scripts
(`/root/reference/python_utils/zed/raw_capture.py`,
`raw_l515_capture.py`, `calib.py`): grab raw side-by-side ZED stereo
pairs over UVC (no ZED SDK) or L515 RGB-D frames for offline
calibration, and parse the ZED factory calibration .conf into the
framework's `CalibStereo` YAML keys so `StereoRectifier` can consume it.

Hardware-gated: needs cv2 with a camera, or pyrealsense2. Everything is
host-side IO (the capture role of `/root/reference/cameras/`).

    python -m ra_slam_tpu.io.capture zed  -r 720p -o out/ [-c 0]
    python -m ra_slam_tpu.io.capture l515 -o out/
    python -m ra_slam_tpu.io.capture calib SN12345.conf -r 720p
"""

from __future__ import annotations

import argparse
import configparser
import os
from typing import Dict, Tuple

import numpy as np

# ZED UVC side-by-side resolutions (per-eye width, height)
RESOLUTIONS: Dict[str, Tuple[int, int]] = {
    "2k": (2208, 1242),
    "1080p": (1920, 1080),
    "720p": (1280, 720),
    "vga": (672, 376),
}

# calibration-section suffix per resolution in the ZED factory .conf
_CALIB_SECTION = {"2k": "2K", "1080p": "FHD", "720p": "HD", "vga": "VGA"}


def parse_zed_conf(path: str, resolution: str) -> dict:
    """ZED factory calibration .conf -> the `Calibration.*` dict the
    YAML config system / `StereoRectifier` consume (fx, fy, cx, cy,
    k1..k3, p1, p2 per eye + baseline + stereo rotation)."""
    cp = configparser.ConfigParser()
    with open(path) as f:
        cp.read_string(f.read())
    suf = _CALIB_SECTION[resolution]

    def cam(side: str) -> dict:
        s = cp[f"{side}_CAM_{suf}"]
        return {
            "fx": s.getfloat("fx"),
            "fy": s.getfloat("fy"),
            "cx": s.getfloat("cx"),
            "cy": s.getfloat("cy"),
            "k1": s.getfloat("k1", 0.0),
            "k2": s.getfloat("k2", 0.0),
            "k3": s.getfloat("k3", 0.0),
            "p1": s.getfloat("p1", 0.0),
            "p2": s.getfloat("p2", 0.0),
        }

    st = cp["STEREO"]
    return {
        "left": cam("LEFT"),
        "right": cam("RIGHT"),
        "baseline": st.getfloat("Baseline") / 1000.0,  # mm -> m
        "rotation": [
            st.getfloat(f"RX_{suf}", 0.0),
            st.getfloat(f"CV_{suf}", 0.0),
            st.getfloat(f"RZ_{suf}", 0.0),
        ],
    }


def calib_to_yaml(calib: dict, width: int, height: int) -> str:
    """Render the parsed calibration as the reference-format YAML block
    (`/root/reference/configs/zed_native_l515.yaml` `Calibration.*`)."""
    lines = [f"Camera.cols: {width}", f"Camera.rows: {height}"]
    for side in ("left", "right"):
        c = calib[side]
        lines += [
            f"Calibration.{side}.fx: {c['fx']}",
            f"Calibration.{side}.fy: {c['fy']}",
            f"Calibration.{side}.cx: {c['cx']}",
            f"Calibration.{side}.cy: {c['cy']}",
            f"Calibration.{side}.distortion: "
            f"[{c['k1']}, {c['k2']}, {c['p1']}, {c['p2']}, {c['k3']}]",
        ]
    lines += [
        f"Calibration.baseline: {calib['baseline']}",
        f"Calibration.rotation: {list(calib['rotation'])}",
    ]
    return "\n".join(lines) + "\n"


def capture_zed(
    output: str,
    resolution: str = "720p",
    camera: int = 0,
    gain: float | None = None,
    brightness: float | None = None,
    max_frames: int = 0,
) -> int:
    """Interactive raw side-by-side capture (UVC): SPACE saves a pair
    into output/left, output/right; q quits. Returns frames saved."""
    import cv2

    w, h = RESOLUTIONS[resolution]
    cap = cv2.VideoCapture(camera)
    cap.set(cv2.CAP_PROP_FRAME_WIDTH, w * 2)
    cap.set(cv2.CAP_PROP_FRAME_HEIGHT, h)
    cap.set(cv2.CAP_PROP_FPS, 60)
    if gain is not None:
        cap.set(cv2.CAP_PROP_GAIN, gain)
    if brightness is not None:
        cap.set(cv2.CAP_PROP_BRIGHTNESS, brightness)
    left_dir = os.path.join(output, "left")
    right_dir = os.path.join(output, "right")
    os.makedirs(left_dir, exist_ok=True)
    os.makedirs(right_dir, exist_ok=True)

    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        left, right = frame[:, :w], frame[:, w:]
        cv2.imshow("zed raw capture (SPACE=save, q=quit)", frame)
        key = cv2.waitKey(1) & 0xFF
        if key == ord("q"):
            break
        if key == ord(" "):
            cv2.imwrite(os.path.join(left_dir, f"{n:06d}.png"), left)
            cv2.imwrite(os.path.join(right_dir, f"{n:06d}.png"), right)
            n += 1
            if max_frames and n >= max_frames:
                break
    cap.release()
    return n


def capture_l515(output: str, max_frames: int = 0) -> int:
    """Raw L515 RGB-D capture via pyrealsense2 into a TUM-style folder
    (the format `FolderReader` replays)."""
    import cv2

    from ra_slam_tpu.io.cameras import RealSenseCamera

    os.makedirs(output, exist_ok=True)
    cam = RealSenseCamera()
    n = 0
    try:
        while True:
            rgb, depth, ts = cam.get_rgbd_frame()
            cv2.imwrite(
                os.path.join(output, f"{n}_rgb.png"),
                cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR),
            )
            cv2.imwrite(
                os.path.join(output, f"{n}_depth.png"),
                (np.asarray(depth) * 1000.0).astype(np.uint16),
            )
            n += 1
            if max_frames and n >= max_frames:
                break
    finally:
        cam.close()
    return n


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pz = sub.add_parser("zed", help="raw UVC stereo capture")
    pz.add_argument("-r", "--resolution", choices=RESOLUTIONS, default="720p")
    pz.add_argument("-o", "--output", required=True)
    pz.add_argument("-c", "--camera", type=int, default=0)
    pz.add_argument("-g", "--gain", type=float, default=None)
    pz.add_argument("-b", "--brightness", type=float, default=None)
    pz.add_argument("-n", "--max-frames", type=int, default=0)

    pl = sub.add_parser("l515", help="raw RGB-D capture")
    pl.add_argument("-o", "--output", required=True)
    pl.add_argument("-n", "--max-frames", type=int, default=0)

    pc = sub.add_parser("calib", help="parse ZED factory .conf to YAML")
    pc.add_argument("conf", help="SN*.conf factory calibration file")
    pc.add_argument("-r", "--resolution", choices=RESOLUTIONS, default="720p")
    pc.add_argument("-o", "--output", default=None, help="YAML out (stdout)")

    args = p.parse_args(argv)
    if args.cmd == "zed":
        n = capture_zed(
            args.output, args.resolution, args.camera, args.gain,
            args.brightness, args.max_frames,
        )
        print(f"saved {n} stereo pairs")
    elif args.cmd == "l515":
        n = capture_l515(args.output, args.max_frames)
        print(f"saved {n} rgbd frames")
    else:
        calib = parse_zed_conf(args.conf, args.resolution)
        w, h = RESOLUTIONS[args.resolution]
        yaml_text = calib_to_yaml(calib, w, h)
        if args.output:
            with open(args.output, "w") as f:
                f.write(yaml_text)
        else:
            print(yaml_text)


if __name__ == "__main__":
    main()
