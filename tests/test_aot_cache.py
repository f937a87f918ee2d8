"""AOT executable cache: miss -> persist -> hit, identical results.

The real cross-process / real-chip evidence is
`scripts/profile_cold_start.py` (bit-identical digests, 0.13 s load);
these tests cover the cache mechanics on the CPU backend.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.utils.aot_cache import cached_compile


def _fn(x, w):
    return jnp.tanh(x @ w).sum(axis=1)


def test_miss_then_hit_same_outputs(tmp_path):
    d = str(tmp_path / "aot")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 32)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(32, 16)), jnp.float32)
    jf = jax.jit(_fn)
    c1, info1 = cached_compile(jf, (x, w), extra="t1", cache_dir=d)
    assert info1["status"] in ("miss", "nocache")
    out1 = np.asarray(c1(x, w))
    if info1["status"] == "nocache":
        return  # backend cannot serialize executables; nothing to hit
    c2, info2 = cached_compile(jax.jit(_fn), (x, w), extra="t1", cache_dir=d)
    assert info2["status"] == "hit", info2
    np.testing.assert_array_equal(out1, np.asarray(c2(x, w)))


def test_key_isolation(tmp_path):
    d = str(tmp_path / "aot")
    x = jnp.ones((8, 8), jnp.float32)
    jf = jax.jit(_fn)
    _, a = cached_compile(jf, (x, x), extra="ka", cache_dir=d)
    _, b = cached_compile(jax.jit(_fn), (x, x), extra="kb", cache_dir=d)
    # different extra -> different key -> second call cannot hit the first
    assert b["status"] != "hit" or a["status"] == "hit"


def test_caller_independent_key(tmp_path):
    """The key must not depend on the caller's stack (Pallas payloads
    embed Python frame locations; `_lower_canonical` strips that by
    lowering on a fresh thread)."""
    d = str(tmp_path / "aot")
    x = jnp.ones((16, 16), jnp.float32)

    def caller_one():
        return cached_compile(jax.jit(_fn), (x, x), extra="kc", cache_dir=d)

    def a_differently_shaped_caller_with_more_frames():
        def inner():
            return cached_compile(jax.jit(_fn), (x, x), extra="kc", cache_dir=d)

        return inner()

    _, i1 = caller_one()
    if i1["status"] == "nocache":
        return
    _, i2 = a_differently_shaped_caller_with_more_frames()
    assert i2["status"] == "hit", (i1, i2)
