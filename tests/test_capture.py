"""Capture tooling: ZED factory-calibration parsing (hardware-free part
of `/root/reference/python_utils/zed/calib.py` / `raw_capture.py`)."""

import numpy as np

from ra_slam_tpu.io.capture import (
    RESOLUTIONS,
    calib_to_yaml,
    parse_zed_conf,
)

_CONF = """
[LEFT_CAM_HD]
fx=700.1
fy=700.2
cx=640.3
cy=360.4
k1=-0.17
k2=0.026
k3=0.0
p1=0.0001
p2=-0.0002

[RIGHT_CAM_HD]
fx=701.0
fy=701.1
cx=639.0
cy=361.0
k1=-0.171
k2=0.027

[STEREO]
Baseline=119.887
RX_HD=0.0021
CV_HD=0.0058
RZ_HD=-0.0009
"""


def test_parse_zed_conf(tmp_path):
    p = tmp_path / "SN000.conf"
    p.write_text(_CONF)
    calib = parse_zed_conf(str(p), "720p")
    assert abs(calib["left"]["fx"] - 700.1) < 1e-9
    assert abs(calib["right"]["k2"] - 0.027) < 1e-9
    assert abs(calib["baseline"] - 0.119887) < 1e-9  # mm -> m
    assert np.allclose(calib["rotation"], [0.0021, 0.0058, -0.0009])
    # missing distortion fields default to 0
    assert calib["right"]["p1"] == 0.0


def test_calib_yaml_parses_with_rectifier_keys(tmp_path):
    p = tmp_path / "SN000.conf"
    p.write_text(_CONF)
    calib = parse_zed_conf(str(p), "720p")
    w, h = RESOLUTIONS["720p"]
    text = calib_to_yaml(calib, w, h)
    import yaml

    d = yaml.safe_load(text)
    assert d["Camera.cols"] == 1280
    assert abs(d["Calibration.left.fx"] - 700.1) < 1e-9
    assert len(d["Calibration.right.distortion"]) == 5
    assert abs(d["Calibration.baseline"] - 0.119887) < 1e-9
