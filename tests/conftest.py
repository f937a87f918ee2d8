"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Real-TPU behavior is exercised by bench.py and the driver's
compile-checks; tests stay deterministic and multi-device-capable on CPU
(the reference could only test on a physical GPU — SURVEY.md §4).

Note: the environment's sitecustomize registers a remote-TPU backend and
forces `jax_platforms` via jax.config (so env vars alone don't stick); we
override it the same way, after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
