"""Can a compiled executable be persisted across processes on this rig?

The axon remote-TPU backend never consults the XLA persistent
compilation cache (measured, round 4: entries are written but every
process recompiles — `ra_slam_tpu/__init__.py` docstring). This probe
measures the two remaining AOT avenues on a mid-size program:

  save:  jit(f).lower(args).compile()          -- timed
         jax.experimental.serialize_executable -- pickle the PjRt exe
         jax.export.export(jit(f))(args)       -- StableHLO bytes
  load:  deserialize_and_load(payload)         -- does it skip compile?
         jax.export.deserialize(...).call      -- expected to recompile

Run:  python scripts/aot_probe.py save   (fresh process)
      python scripts/aot_probe.py load   (fresh process)
"""

import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

SAVE_EXE = "/tmp/aot_exe.pkl"
SAVE_EXPORT = "/tmp/aot_export.bin"


def make_fn_args():
    # mid-size stand-in with the fused step's flavor: sort + gather +
    # matmul + scatter (compiles in ~tens of seconds, not 300)
    def f(x, idx, w):
        s = jnp.sort(x)
        g = s[idx]
        h = jnp.tanh(g.reshape(-1, 256) @ w)
        return jnp.zeros((1 << 20,), jnp.float32).at[idx[: h.size]].add(
            h.reshape(-1)
        )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1 << 22,)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 1 << 20, (1 << 20,)), jnp.int32)
    w = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    return f, (x, idx, w)


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:42s} {dt:8.2f}s", flush=True)
    return out


def main():
    mode = sys.argv[1]
    f, args = make_fn_args()
    jit_f = jax.jit(f)

    if mode == "save":
        lowered = t("lower", lambda: jit_f.lower(*args))
        compiled = t("compile", lambda: lowered.compile())
        t("first run", lambda: jax.device_get(compiled(*args)[0]))

        try:
            from jax.experimental import serialize_executable as se

            payload = t("serialize_executable", lambda: se.serialize(compiled))
            with open(SAVE_EXE, "wb") as fh:
                pickle.dump(payload, fh)
            print(f"  exe payload: {sum(len(p) if isinstance(p, bytes) else 0 for p in jax.tree.leaves(payload)) or 'opaque'}")
        except Exception as e:
            print(f"serialize_executable FAILED: {type(e).__name__}: {e}")

        try:
            exp = t("jax.export.export", lambda: jax.export.export(jit_f)(*args))
            blob = exp.serialize()
            with open(SAVE_EXPORT, "wb") as fh:
                fh.write(blob)
            print(f"  export blob: {len(blob)} bytes")
        except Exception as e:
            print(f"jax.export FAILED: {type(e).__name__}: {e}")

    elif mode == "load":
        try:
            from jax.experimental import serialize_executable as se

            with open(SAVE_EXE, "rb") as fh:
                payload = pickle.load(fh)
            loaded = t("deserialize_and_load", lambda: se.deserialize_and_load(
                *payload) if isinstance(payload, tuple) else se.deserialize_and_load(payload))
            t("first run (deserialized exe)", lambda: jax.device_get(loaded(*args)[0]))
        except Exception as e:
            print(f"exe load FAILED: {type(e).__name__}: {e}")

        try:
            with open(SAVE_EXPORT, "rb") as fh:
                blob = fh.read()
            exp = t("jax.export.deserialize", lambda: jax.export.deserialize(blob))
            t("first call (exported)", lambda: jax.device_get(exp.call(*args)[0]))
        except Exception as e:
            print(f"export load FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
