"""Isolate per-program dispatch overhead vs real device compute.

Times (a) a trivial kernel dispatched N times, (b) the same work chained
inside ONE program via lax.scan, (c) a big-matmul kernel for the compute
roofline. If (a) >> (b)/N, dispatch overhead dominates and hot loops
must fuse more work per program.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    x = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def tiny(x):
        return x + 1.0

    tiny(x).block_until_ready()
    jax.device_get(tiny(x)[0, 0])
    n = 50
    t0 = time.perf_counter()
    y = x
    for _ in range(n):
        y = tiny(y)
    jax.device_get(y[0, 0])
    print(f"tiny kernel x{n} chained dispatches: {(time.perf_counter()-t0)/n*1e3:.3f} ms/dispatch")

    @jax.jit
    def tiny_scan(x):
        return jax.lax.scan(lambda c, _: (c + 1.0, None), x, None, length=n)[0]

    jax.device_get(tiny_scan(x)[0, 0])
    t0 = time.perf_counter()
    jax.device_get(tiny_scan(x)[0, 0])
    print(f"tiny kernel x{n} in one scan:       {(time.perf_counter()-t0)/n*1e3:.3f} ms/iter")

    # independent dispatches (no data dependency): can they overlap?
    t0 = time.perf_counter()
    outs = [tiny(x + i) for i in range(n)]
    for o in outs:
        jax.device_get(o[0, 0])
    print(f"tiny kernel x{n} independent:       {(time.perf_counter()-t0)/n*1e3:.3f} ms/dispatch")

    # cumsum 4M inside scan of 10 — device-bound repeat
    big = jnp.asarray(np.random.default_rng(0).integers(0, 2, 1 << 22, dtype=np.int32))

    @jax.jit
    def cs10(b):
        def body(c, _):
            s = jnp.cumsum(b + c)
            return c + s[-1] % 2, None
        return jax.lax.scan(body, jnp.int32(0), None, length=10)[0]

    jax.device_get(cs10(big))
    t0 = time.perf_counter()
    jax.device_get(cs10(big))
    print(f"cumsum 4.2M x10 in one program:     {(time.perf_counter()-t0)/10*1e3:.3f} ms/cumsum")

    # sort 1M inside a 10-iter scan
    keys = jnp.asarray(np.random.default_rng(0).integers(0, 2**31, 1 << 20, dtype=np.int32))

    @jax.jit
    def sort10(k):
        def body(c, _):
            s = jnp.sort(k ^ c)
            return c ^ s[0], None
        return jax.lax.scan(body, jnp.int32(1), None, length=10)[0]

    jax.device_get(sort10(keys))
    t0 = time.perf_counter()
    jax.device_get(sort10(keys))
    print(f"sort 1M x10 in one program:         {(time.perf_counter()-t0)/10*1e3:.3f} ms/sort")

    # scatter-min 1M inside a 10-iter scan
    n_pix = 640 * 480
    pix = jnp.asarray(np.random.default_rng(0).integers(0, n_pix, 1 << 20, dtype=np.int32))
    z = jnp.asarray(np.random.default_rng(1).random(1 << 20, dtype=np.float32))

    @jax.jit
    def scat10(p, z):
        def body(c, _):
            img = jnp.full((n_pix,), jnp.inf, jnp.float32).at[p].min(z + c, mode="drop")
            return c + img[0] * 0.0, None
        return jax.lax.scan(body, jnp.float32(0), None, length=10)[0]

    jax.device_get(scat10(pix, z))
    t0 = time.perf_counter()
    jax.device_get(scat10(pix, z))
    print(f"scatter-min 1M x10 in one program:  {(time.perf_counter()-t0)/10*1e3:.3f} ms/scatter")

    # element-gather 1M from 4.2M inside a 10-iter scan
    src = jnp.asarray(np.random.default_rng(2).random(1 << 22, dtype=np.float32))
    gidx = jnp.asarray(np.random.default_rng(3).integers(0, 1 << 22, 1 << 20, dtype=np.int32))

    @jax.jit
    def gath10(s, i):
        def body(c, _):
            g = s[(i + c) & ((1 << 22) - 1)]
            return c + (g[0] > 2).astype(jnp.int32), None
        return jax.lax.scan(body, jnp.int32(0), None, length=10)[0]

    jax.device_get(gath10(src, gidx))
    t0 = time.perf_counter()
    jax.device_get(gath10(src, gidx))
    print(f"gather 1M/4.2M x10 in one program:  {(time.perf_counter()-t0)/10*1e3:.3f} ms/gather")

    # matmul roofline bf16
    a = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def mm10(a):
        def body(c, _):
            return jnp.dot(c, a, preferred_element_type=jnp.bfloat16), None
        return jax.lax.scan(body, a, None, length=10)[0]

    jax.device_get(mm10(a)[0, 0])
    t0 = time.perf_counter()
    jax.device_get(mm10(a)[0, 0])
    dt = (time.perf_counter() - t0) / 10
    print(f"matmul 4k^3 bf16: {dt*1e3:.3f} ms = {2*4096**3/dt/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
