"""Live robot pipeline: stereo tracking thread + RGB-D mapping thread.

Parity with `main/live_camera` (`/root/reference/main/live_camera.cc:16-94`):
two free-running camera loops bridged only by the timestamped pose
buffer — thread 1 feeds the stereo tracking camera into SLAM, thread 2
feeds the RGB-D depth camera through segmentation into the TSDF map
with timestamp-interpolated poses, and the main thread periodically
renders raycast previews (the ImGui window's role) and handles
shutdown. Camera drivers come from `io/cameras.py` and require real
hardware; everything else is the same code path exercised by the
offline tests.

    python -m ra_slam_tpu.pipeline.live --config zed_l515.yaml \
        --model seg.msgpack --out /tmp/live
"""

from __future__ import annotations

import argparse
import logging
import os
import threading
import time


def run(system, stereo_cam, rgbd_cam, out_dir=None, render_every_s=2.0,
        stop_after_s=None, stop_after_frames=None):
    """The reference's `run()` thread layout (`live_camera.cc:16-38`).

    Camera threads are daemon threads joined with a timeout on shutdown:
    the join gives in-flight JAX dispatches time to finish cleanly, while
    daemon status guarantees a camera driver hung inside `get_*` (no
    capture timeout) cannot wedge interpreter exit — the stuck thread is
    logged and abandoned instead. A camera exception stops the whole
    session cleanly. Returns (previews, slam_frames, tsdf_frames).
    """
    stop = threading.Event()
    counts = {"slam": 0, "tsdf": 0}
    errors: list = []

    def loop(name, get, feed):
        try:
            while not stop.is_set():
                frame = get()
                if stop.is_set():
                    break
                feed(*frame)
                counts[name] += 1
                if (
                    stop_after_frames is not None
                    and counts[name] >= stop_after_frames
                ):
                    break
        except Exception as e:  # pragma: no cover - hardware faults
            errors.append((name, e))
        finally:
            stop_if_done()

    def stop_if_done():
        if errors or (
            stop_after_frames is not None
            and counts["slam"] >= stop_after_frames
            and counts["tsdf"] >= stop_after_frames
        ):
            stop.set()

    threads = [
        threading.Thread(
            target=loop, name="t_slam",
            args=("slam", stereo_cam.get_stereo_frame,
                  system.feed_stereo_frame),
        ),
        threading.Thread(
            target=loop, name="t_tsdf",
            args=("tsdf", rgbd_cam.get_rgbd_frame, system.feed_rgbd_frame),
        ),
    ]
    for t in threads:
        t.daemon = True
        t.start()

    def render_preview(i):
        pose = system.slam.pose_buffer.latest() if system.slam else None
        if pose is None or not out_dir:
            return False
        import cv2
        import numpy as np

        out = system.render(pose)
        os.makedirs(out_dir, exist_ok=True)
        cv2.imwrite(
            os.path.join(out_dir, f"live_{i:05d}.png"),
            cv2.cvtColor(
                np.asarray(out["rgba"], np.uint8), cv2.COLOR_RGBA2BGRA
            ),
        )
        return True

    t0 = time.monotonic()
    last_render = t0
    i = 0
    try:
        while not stop.is_set() and any(t.is_alive() for t in threads):
            time.sleep(0.05)
            now = time.monotonic()
            if now - last_render >= render_every_s:
                last_render = now
                i += int(render_preview(i))
            if stop_after_s and now - t0 > stop_after_s:
                break
    except KeyboardInterrupt:
        pass
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30.0)
            if t.is_alive():  # pragma: no cover - hung camera driver
                logging.getLogger(__name__).error(
                    "camera thread %s did not stop within 30 s "
                    "(driver hung in capture?); abandoning it",
                    t.name,
                )
    if i == 0:  # session ended before the first render tick
        i += int(render_preview(0))
    if errors:
        name, e = errors[0]
        raise RuntimeError(f"camera thread '{name}' failed: {e}") from e
    return i, counts["slam"], counts["tsdf"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True, help="system YAML (reference schema)")
    p.add_argument("--calib", default=None,
                   help="stereo calibration YAML (Calibration.* keys); "
                        "defaults to --config")
    p.add_argument("--model", default=None, help="segmentation checkpoint")
    p.add_argument("--out", default=None, help="render preview dir")
    p.add_argument("--zed-device", type=int, default=0)
    p.add_argument("--duration", type=float, default=None, help="seconds")
    args = p.parse_args(argv)

    from ra_slam_tpu.core.config import load_yaml_config
    from ra_slam_tpu.core.rectify import StereoRectifier, rewrite_camera_config
    from ra_slam_tpu.io.cameras import RealSenseCamera, ZedNativeCamera
    from ra_slam_tpu.pipeline.system import RaSlamSystem

    cfg = load_yaml_config(args.config)
    rectifier = StereoRectifier.from_yaml(args.calib or args.config)
    cfg = rewrite_camera_config(cfg, rectifier)

    system = RaSlamSystem(cfg, segmentation_model=args.model)
    stereo = ZedNativeCamera(rectifier, device_id=args.zed_device)
    rgbd = RealSenseCamera()
    try:
        n, n_slam, n_tsdf = run(system, stereo, rgbd, out_dir=args.out,
                                stop_after_s=args.duration)
        print(f"live session done: {system.num_integrated} frames fused "
              f"({n_slam} tracked / {n_tsdf} rgbd), {n} previews")
    finally:
        stereo.close()
        rgbd.close()


if __name__ == "__main__":
    main()
