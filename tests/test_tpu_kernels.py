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
