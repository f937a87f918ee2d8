"""Characterize host<->device transfer cost vs size on the axon tunnel."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    base = jnp.arange(1 << 25, dtype=jnp.int32)  # 128 MB source
    jax.device_get(base[:1])
    print("device_get (fresh slices, so no host-side caching):")
    for nb in (1 << 10, 1 << 14, 1 << 18, 1 << 20, 1 << 22, 1 << 24):
        f = jax.jit(lambda b, k=nb: b[:k] + 1)
        o = f(base)
        t0 = time.perf_counter()
        jax.device_get(o)
        dt = time.perf_counter() - t0
        mb = nb * 4 / 1e6
        print(f"  {mb:9.3f} MB: {dt*1e3:9.2f} ms  {mb/1e3/dt:8.3f} GB/s", flush=True)
    # repeat 1MB a few times for variance
    for i in range(3):
        o = jax.jit(lambda b: b[: 1 << 18] + i)(base)
        t0 = time.perf_counter()
        jax.device_get(o)
        print(f"  1.05 MB repeat: {(time.perf_counter()-t0)*1e3:9.2f} ms")

    print("device_put:")
    rng = np.random.default_rng(0)
    for nb in (1 << 14, 1 << 18, 1 << 20, 1 << 22, 1 << 24):
        a = rng.integers(0, 100, nb, dtype=np.int32)
        t0 = time.perf_counter()
        d = jax.device_put(a)
        jax.device_get(d[:1])
        dt = time.perf_counter() - t0
        mb = nb * 4 / 1e6
        print(f"  {mb:9.3f} MB: {dt*1e3:9.2f} ms  {mb/1e3/dt:8.3f} GB/s", flush=True)
    # pipelined puts (enqueue 8 then sync): does overlap help?
    arrs = [rng.integers(0, 100, 1 << 20, dtype=np.int32) for _ in range(8)]
    t0 = time.perf_counter()
    ds = [jax.device_put(a) for a in arrs]
    for d in ds:
        jax.device_get(d[:1])
    dt = time.perf_counter() - t0
    print(f"  8x 4.2MB pipelined: {dt*1e3:9.2f} ms  {8*4.2/1e3/dt:8.3f} GB/s")


if __name__ == "__main__":
    main()
