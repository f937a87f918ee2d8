"""C++ native runtime tests: .sens decode parity vs the Python reader,
ordered prefetching, and the bounded drop-on-overrun queue."""

import threading
import time

import numpy as np
import pytest

from ra_slam_tpu.io import SensReader, write_sens
from ra_slam_tpu.native import ByteQueue, NativeSensReader, ensure_built


@pytest.fixture(scope="module")
def built():
    ensure_built()


@pytest.fixture()
def sens_path(tmp_path):
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgbs, depths, poses = [], [], []
    for i in range(5):
        rgbs.append(
            np.stack(
                [xx / w * 255, yy / h * 255, np.full_like(xx, 30.0 * i)], -1
            ).astype(np.uint8)
        )
        depths.append((1000 + 37 * i + yy * 3 + xx).astype(np.uint16))
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [0.1 * i, 0, 0]
        poses.append(m)
    path = str(tmp_path / "scene.sens")
    write_sens(path, rgbs, depths, poses, np.eye(4, dtype=np.float32) * 1.0,
               depth_shift=1000.0)
    return path


def test_native_matches_python_reader(built, sens_path):
    py = SensReader(sens_path)
    nat = NativeSensReader(sens_path)
    assert len(nat) == len(py) == 5
    assert nat.depth_factor == py.depth_factor
    np.testing.assert_allclose(
        np.asarray(nat.camera.fx), np.asarray(py.camera.fx)
    )
    for i in (0, 2, 4):
        fp, fn = py.frame(i), nat.frame(i)
        np.testing.assert_allclose(fn.depth, fp.depth)  # zlib: exact
        np.testing.assert_allclose(fn.cam_T_world, fp.cam_T_world, atol=1e-6)
        assert abs(fn.timestamp - fp.timestamp) < 1e-9
        # both use libjpeg-family decoders; tolerate small differences
        diff = np.abs(fn.rgb.astype(float) - fp.rgb.astype(float))
        assert diff.mean() < 2.0
    nat.close()


def test_native_prefetch_ordered(built, sens_path):
    nat = NativeSensReader(sens_path)
    ref = [nat.frame(i) for i in range(5)]
    seen = []
    for fr in nat.prefetch(num_threads=3, capacity=2):
        seen.append(fr)
    assert [f.frame_id for f in seen] == [0, 1, 2, 3, 4]
    for a, b in zip(ref, seen):
        np.testing.assert_allclose(a.depth, b.depth)
        np.testing.assert_allclose(a.cam_T_world, b.cam_T_world)
    nat.close()


def test_byte_queue_drop_semantics(built):
    q = ByteQueue(capacity=2)
    assert q.push(b"a") and q.push(b"bb")
    assert not q.push(b"ccc")  # full -> dropped, producer not blocked
    assert q.dropped == 1
    assert len(q) == 2
    assert q.pop() == b"a"
    assert q.pop() == b"bb"
    assert q.pop(timeout=0.05) is None  # timeout
    q.close()
    with pytest.raises(StopIteration):
        q.pop()
    q.destroy()


def test_byte_queue_threaded(built):
    q = ByteQueue(capacity=64)
    items = [bytes([i]) * (i + 1) for i in range(32)]

    def producer():
        for it in items:
            while not q.push(it):
                time.sleep(0.001)
        q.close()

    t = threading.Thread(target=producer)
    t.start()
    got = []
    while True:
        try:
            b = q.pop(timeout=2.0)
        except StopIteration:
            break
        if b is not None:
            got.append(b)
    t.join()
    assert got == items
    q.destroy()


def test_png_sens_roundtrip(tmp_path):
    """PNG color parity (`sensorData.hpp` TYPE_PNG): write a PNG .sens,
    read it back losslessly through BOTH decoders (pure-Python and the
    C++ runtime)."""
    import numpy as np
    from ra_slam_tpu.io.sens import COLOR_PNG, SensReader, write_sens

    rng = np.random.default_rng(3)
    rgbs = [rng.integers(0, 255, (24, 32, 3), np.uint8) for _ in range(3)]
    depths = [rng.integers(500, 3000, (24, 32), np.uint16) for _ in range(3)]
    poses = [np.eye(4, dtype=np.float32) for _ in range(3)]
    k = np.eye(4, dtype=np.float32); k[0, 0] = k[1, 1] = 20.0
    path = str(tmp_path / "png.sens")
    write_sens(path, rgbs, depths, poses, k, color_compression=COLOR_PNG)

    r = SensReader(path)
    assert r.color_compression == COLOR_PNG
    f0 = r.frame(0)
    np.testing.assert_array_equal(f0.rgb, rgbs[0])  # PNG is lossless
    r.close()

    from ra_slam_tpu.native import NativeSensReader
    nat = NativeSensReader(path)
    f1 = nat.frame(1)
    np.testing.assert_array_equal(f1.rgb, rgbs[1])
    np.testing.assert_array_equal(
        (f1.depth * 1000.0 + 0.5).astype(np.uint16), depths[1]
    )
    nat.close()
