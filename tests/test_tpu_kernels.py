"""Real-TPU kernel tests (non-interpreted Pallas).

The main suite runs on a forced-CPU virtual mesh (tests/conftest.py), so
these tests drive the actual TPU backend in a clean subprocess (the
sitecustomize re-registers the remote TPU there). Skipped when no TPU is
reachable — mirroring the reference's CI, which compiles CUDA but can
only execute kernels on a GPU machine (SURVEY.md §4).
"""

import os
import subprocess
import sys

import pytest

_PROBE = """
import jax, sys
sys.exit(0 if jax.default_backend() == "tpu" else 3)
"""

_KERNEL_TEST = """
import numpy as np, jax, jax.numpy as jnp
assert jax.default_backend() == "tpu", jax.default_backend()
from ra_slam_tpu.ops.hamming import hamming_matrix_pallas
from ra_slam_tpu.features.matching import hamming_matrix_popcount
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 2**32, (300, 8), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 2**32, (500, 8), dtype=np.uint32))
out = hamming_matrix_pallas(a, b)  # compiled, NOT interpret mode
ref = hamming_matrix_popcount(a, b)
assert out.shape == (300, 500)
assert bool(jnp.all(out == ref)), "pallas kernel != popcount reference"
print("OK")
"""


def _clean_env():
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS", "XLA_FLAGS"):
        env.pop(k, None)
    return env


def _tpu_available() -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE], env=_clean_env(), timeout=120,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


@pytest.mark.tpu
@pytest.mark.slow
def test_hamming_pallas_compiled_on_tpu():
    if not _tpu_available():
        pytest.skip("no TPU backend reachable")
    r = subprocess.run(
        [sys.executable, "-c", _KERNEL_TEST], env=_clean_env(), timeout=420,
        capture_output=True, text=True,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "OK" in r.stdout


_TSDF_TEST = """
import functools, os
import numpy as np, jax, jax.numpy as jnp
assert jax.default_backend() == "tpu", jax.default_backend()
from ra_slam_tpu.core.config import TsdfConfig
from ra_slam_tpu.core.se3 import SE3
from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
from ra_slam_tpu.map.voxel_map import (
    create_map, integrate_frame, integrate, visible_blocks, num_active)

spec = SyntheticCameraSpec(fx=80.0, fy=80.0, cx=79.5, cy=59.5, width=160, height=120)
ds = SyntheticBoxDataset(num_frames=12, cam=spec, radius=1.0, depth_noise=0.0, seed=0)
cfg = TsdfConfig(voxel_size=0.04, truncation=0.16, max_depth=6.0,
                 log2_num_blocks=12, log2_hash_size=14,
                 max_visible_blocks=2048, max_new_blocks=4096, width=160, height=120)
cam = ds.camera
step = jax.jit(functools.partial(integrate_frame, cfg=cfg), donate_argnums=(0,))
m = create_map(cfg)
for i in range(0, 12, 2):
    f = ds.frame(i)
    m, st = step(m, jnp.asarray(f.rgb, jnp.float32), jnp.asarray(f.depth),
                 jnp.asarray(f.ht), jnp.asarray(f.lt), cam,
                 SE3.from_matrix(jnp.asarray(f.cam_T_world)))
assert int(num_active(m)) > 500 and int(m.alloc_failures) == 0

f = ds.frame(1)
pose = SE3.from_matrix(jnp.asarray(f.cam_T_world))
args = (jnp.asarray(f.rgb, jnp.float32), jnp.asarray(f.depth),
        jnp.asarray(f.ht), jnp.asarray(f.lt))
vis = visible_blocks(m, cam, pose, cfg)
m_pallas = jax.jit(functools.partial(integrate, cfg=cfg, carve=True))(m, vis[0], vis[1], *args, cam, pose)
os.environ["RA_SLAM_NO_PALLAS"] = "1"
m_jnp = jax.jit(functools.partial(integrate, cfg=cfg, carve=True))(m, vis[0], vis[1], *args, cam, pose)
# the Pallas resolve keeps GEOMETRY bit-exact (the depth channel
# gathers at HIGHEST precision, so sdf/gate/tsdf/weight match the f32
# einsum path exactly) while the five appearance channels resolve in
# one bf16 MXU pass (ops/tsdf_pallas.py): colors are 0..255 at ~0.2%
# relative, probabilities feed the log-odds update
tol = {"tsdf": 2e-5, "weight": 2e-5, "prob": 5e-3, "rgb": 1.5}
for name in ("tsdf", "weight", "prob", "rgb"):
    a, b = np.asarray(getattr(m_pallas, name)), np.asarray(getattr(m_jnp, name))
    assert np.max(np.abs(a - b)) < tol[name], (name, np.max(np.abs(a - b)))
for name in ("block_key", "active"):
    a, b = np.asarray(getattr(m_pallas, name)), np.asarray(getattr(m_jnp, name))
    assert (a == b).all(), name
print("OK")
"""


@pytest.mark.tpu
@pytest.mark.slow
def test_tsdf_pallas_matches_einsum_on_tpu():
    """The compiled Pallas TSDF integrate+carve kernel must equal the
    XLA einsum path on the same fused map (ops/tsdf_pallas.py)."""
    if not _tpu_available():
        pytest.skip("no TPU backend reachable")
    # three fused-step compiles; the remote compile service runs
    # 100-500 s each under load (measured 73-490 s for one step), so
    # this test wants an otherwise-idle machine
    r = subprocess.run(
        [sys.executable, "-c", _TSDF_TEST], env=_clean_env(), timeout=1800,
        capture_output=True, text=True,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "OK" in r.stdout
