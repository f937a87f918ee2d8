"""Measure the host<->device round-trip latency and re-measure
primitives with enough iterations to amortize it."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    x = jnp.float32(1.0) + 0
    jax.device_get(x)
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.device_get(x)
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3
    print(f"device_get scalar RTT: median {np.median(ts):.2f} ms  min {ts.min():.2f}  max {ts.max():.2f}")

    # host->device transfer of a 640x480 frame (6 channels worth)
    img = np.random.default_rng(0).random((480, 640, 4), np.float32)
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(img)
        jax.device_get(d[0, 0, 0])
        print(f"device_put 4.9MB + sync: {(time.perf_counter()-t0)*1e3:.2f} ms")

    # device->host of 1 MB / 16 MB
    big = jnp.ones((1 << 22,), jnp.float32)
    jax.device_get(big[0])
    for nb in (1 << 18, 1 << 22):
        t0 = time.perf_counter()
        jax.device_get(big[:nb])
        dt = time.perf_counter() - t0
        print(f"device_get {nb*4/1e6:.1f}MB: {dt*1e3:.2f} ms  {nb*4/dt/1e9:.2f} GB/s")

    def t(name, fn, *args, iters=100):
        jax.device_get(jax.tree.leaves(fn(*args))[0].reshape(-1)[0])
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        jax.device_get(jax.tree.leaves(o)[0].reshape(-1)[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:50s} {dt*1e3:8.3f} ms", flush=True)

    # dispatch floor with 100 chained tiny programs
    tiny = jnp.ones((8, 128), jnp.float32)
    t("tiny dispatch (x100 chained)", jax.jit(lambda v: v + 1.0), tiny)

    k1 = jnp.asarray(np.random.default_rng(0).integers(0, 2**31, 1 << 20, dtype=np.int32))
    t("sort 1M i32 (x100 chained)", jax.jit(lambda k: jnp.sort(k ^ 1)), k1)

    n_pix = 640 * 480
    pix = jnp.asarray(np.random.default_rng(0).integers(0, n_pix, 1 << 20, dtype=np.int32))
    z = jnp.asarray(np.random.default_rng(1).random(1 << 20, dtype=np.float32))
    f = jax.jit(lambda p, zz: jnp.full((n_pix,), jnp.inf, jnp.float32).at[p].min(zz, mode="drop"))
    t("scatter-min 1M (x100 chained)", lambda: f(pix, z), iters=100)

    src = jnp.asarray(np.random.default_rng(2).random(1 << 22, dtype=np.float32))
    gi = jnp.asarray(np.random.default_rng(3).integers(0, 1 << 22, 1 << 20, dtype=np.int32))
    g = jax.jit(lambda s, i: s[i])
    t("gather 1M from 4.2M (x100 chained)", lambda: g(src, gi), iters=100)

    x16 = jnp.ones((1 << 22,), jnp.float32)
    t("fma 16MB (x100 chained)", jax.jit(lambda v: v * 1.000001 + 1.0), x16)
    x128 = jnp.ones((1 << 25,), jnp.float32)
    t("fma 128MB (x100 chained)", jax.jit(lambda v: v * 1.000001 + 1.0), x128, iters=50)

    a = jnp.ones((4096, 4096), jnp.bfloat16)
    t("matmul 4096^3 bf16 (x50 chained)", jax.jit(lambda m: jnp.dot(m, m, preferred_element_type=jnp.bfloat16)), a, iters=50)


if __name__ == "__main__":
    main()
