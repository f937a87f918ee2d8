"""Persistent AOT-compiled-executable cache.

The axon remote-TPU rig never consults the XLA persistent compilation
cache (measured, round 4: entries are written but every process
recompiles — the fused TSDF step costs 73-490 s of remote compile
before frame 1, where the reference robot just boots,
`/root/reference/main/live_camera.cc`). Round 5 measured the remaining
avenue (`scripts/aot_probe.py`): `jax.experimental.serialize_executable`
round-trips a compiled PjRt executable through pickle, and a FRESH
process `deserialize_and_load`s it in **0.04 s** (vs 22.7 s compiling
the same mid-size program; `jax.export` by contrast re-compiles on
load). So the deployable cold-start story is: compile once per
(program, jax version, backend), persist the executable, boot by
loading it.

Scope: a loaded executable is pinned to the exact input avals/shardings
and device topology it was compiled for — exactly the framework's
situation (static shapes, fixed config). Cache entries key on the
sha256 of the lowered StableHLO text + jax version + backend, so any
config / code / compiler change misses cleanly. Corrupt or
incompatible entries fall back to a fresh compile.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys
import tempfile
import threading
import time
from typing import Any, Tuple

import jax

DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".aot_cache")


def _cache_dir() -> str:
    return os.environ.get("RA_SLAM_AOT_CACHE") or DEFAULT_DIR


def _key(lowered, extra: str) -> str:
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(sys.version.encode())
    h.update(jax.default_backend().encode())
    h.update(extra.encode())
    h.update(lowered.as_text().encode())
    return h.hexdigest()[:32]


def _lower_canonical(jit_fn, example_args):
    """Lower on a FRESH thread so the Python stack jax bakes into MLIR
    location metadata is identical no matter who calls us. (Measured:
    the Pallas/Mosaic kernel payload embeds the full caller stack's
    file:line info, so the same program lowered from bench.py, the
    facade, and a REPL hashed to three different keys — every boot
    'missed' its own cache. A thread's stack starts at its run()
    target, which canonicalizes the captured frames.)"""
    out: dict = {}

    def run():
        try:
            out["lowered"] = jit_fn.lower(*example_args)
        except BaseException as e:  # re-raise in caller
            out["err"] = e

    t = threading.Thread(target=run, name="aot-lower")
    t.start()
    t.join()
    if "err" in out:
        raise out["err"]
    return out["lowered"]


def cached_compile(
    jit_fn,
    example_args: tuple,
    extra: str = "",
    cache_dir: str | None = None,
) -> Tuple[Any, dict]:
    """Lower `jit_fn` on `example_args`, then load the persisted
    executable if one matches, else compile and persist it.

    Returns (compiled_callable, info) where info records
    {"status": "hit"|"miss"|"nocache", "lower_s", "load_s"|"compile_s"}.
    The callable is an AOT `Compiled`: it accepts exactly the example
    argument structure/shapes (donation from the jit wrapper applies).
    """
    cache_dir = cache_dir or _cache_dir()
    t0 = time.perf_counter()
    lowered = _lower_canonical(jit_fn, example_args)
    lower_s = time.perf_counter() - t0
    path = os.path.join(cache_dir, _key(lowered, extra) + ".exe")

    # XLA:CPU AOT results are machine-feature pinned and refuse to
    # execute even on the compiling host (measured: '+prefer-no-scatter
    # ... not supported on the host machine' -> JaxRuntimeError);
    # the cache targets the TPU path, where round-trips are verified
    # bit-identical (scripts/profile_cold_start.py)
    persist = jax.default_backend() != "cpu"

    if persist and os.path.exists(path):
        try:
            from jax.experimental import serialize_executable as se

            t0 = time.perf_counter()
            with open(path, "rb") as f:
                payload = pickle.load(f)
            loaded = (
                se.deserialize_and_load(*payload)
                if isinstance(payload, tuple)
                else se.deserialize_and_load(payload)
            )
            return loaded, {
                "status": "hit",
                "lower_s": round(lower_s, 2),
                "load_s": round(time.perf_counter() - t0, 2),
            }
        except Exception:  # stale/corrupt/unsupported -> recompile
            pass

    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    status = "miss" if persist else "nocache"
    if persist:
        try:
            from jax.experimental import serialize_executable as se

            payload = se.serialize(compiled)
            os.makedirs(cache_dir, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                pickle.dump(payload, f)
            os.replace(tmp, path)  # atomic: no torn files for racers
        except Exception:
            status = "nocache"
    return compiled, {
        "status": status,
        "lower_s": round(lower_s, 2),
        "compile_s": round(compile_s, 2),
    }
