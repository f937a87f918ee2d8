"""Pin down the ~3.2ms floor: per scan-iteration, per dispatch, or per op?"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, *args, div=1):
    jax.device_get(jax.tree.leaves(fn(*args))[0].reshape(-1)[0])
    t0 = time.perf_counter()
    jax.device_get(jax.tree.leaves(fn(*args))[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / div
    print(f"{name:56s} {dt*1e3:8.3f} ms", flush=True)


def main():
    x16 = jnp.ones((1 << 22,), jnp.float32)   # 16 MB
    x512 = jnp.ones((1 << 27,), jnp.float32)  # 512 MB

    # flat chain of 10 dependent fmas, one program, no scan
    @jax.jit
    def flat10(x):
        for _ in range(10):
            x = x * 1.000001 + 1.0
        return x

    t("flat chain 10 fma on 16MB (one program)", flat10, x16, div=10)

    @jax.jit
    def flat10_big(x):
        for _ in range(10):
            x = x * 1.000001 + 1.0
        return x

    t("flat chain 10 fma on 512MB (one program)", flat10_big, x512, div=10)

    # one fma on 512MB: bandwidth above the floor?
    @jax.jit
    def one_big(x):
        return x * 1.000001 + 1.0

    jax.device_get(one_big(x512)[0])
    t0 = time.perf_counter()
    for _ in range(5):
        y = one_big(x512)
    jax.device_get(y[0])
    dt = (time.perf_counter() - t0) / 5
    print(f"{'single fma 512MB dispatched':56s} {dt*1e3:8.3f} ms  {2*512e6/dt/1e9:6.1f} GB/s")

    # scan with big carry but tiny compute
    @jax.jit
    def scan_carry_big(x):
        def body(c, _):
            return c, None
        return jax.lax.scan(body, x, None, length=20)[0]

    t("scan x20 identity carry 16MB", scan_carry_big, x16, div=20)

    # scan over 10 iters of flat-10-fma body (100 fmas total)
    @jax.jit
    def scan_fat_body(x):
        def body(c, _):
            for _ in range(10):
                c = c * 1.000001 + 1.0
            return c, None
        return jax.lax.scan(body, x, None, length=10)[0]

    t("scan x10 of 10-fma body on 16MB (per body)", scan_fat_body, x16, div=10)

    # 10 dependent cumsums flat in one program
    @jax.jit
    def flat_cumsum(x):
        for _ in range(10):
            x = jnp.cumsum(x) * 1e-9
        return x

    t("flat chain 10 cumsum 16MB (one program)", flat_cumsum, x16, div=10)

    # 10 dependent sorts flat
    k = jnp.asarray(np.random.default_rng(0).integers(0, 2**31, 1 << 20, dtype=np.int32))

    @jax.jit
    def flat_sort(k):
        for i in range(10):
            k = jnp.sort(k ^ i)
        return k

    t("flat chain 10 sort-1M (one program)", flat_sort, k, div=10)

    # 10 dependent scatter-mins flat
    n_pix = 640 * 480
    pix = jnp.asarray(np.random.default_rng(0).integers(0, n_pix, 1 << 20, dtype=np.int32))
    z = jnp.asarray(np.random.default_rng(1).random(1 << 20, dtype=np.float32))

    @jax.jit
    def flat_scat(p, z):
        acc = jnp.float32(0)
        for i in range(10):
            img = jnp.full((n_pix,), jnp.inf, jnp.float32).at[p].min(z + acc, mode="drop")
            acc = acc + img[0] * 0.0
        return acc

    t("flat chain 10 scatter-min-1M (one program)", flat_scat, pix, z, div=10)

    # 10 dependent element-gathers flat
    src = jnp.asarray(np.random.default_rng(2).random(1 << 22, dtype=np.float32))
    gi = jnp.asarray(np.random.default_rng(3).integers(0, 1 << 22, 1 << 20, dtype=np.int32))

    @jax.jit
    def flat_gather(s, i):
        c = jnp.int32(0)
        for _ in range(10):
            g = s[(i + c) & ((1 << 22) - 1)]
            c = c + (g[0] > 2).astype(jnp.int32)
        return c

    t("flat chain 10 gather-1M/4.2M (one program)", flat_gather, src, gi, div=10)


if __name__ == "__main__":
    main()
