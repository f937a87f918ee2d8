"""Microbenchmarks of the primitive ops the hot paths are built from,
on the real backend: sort variants, scatter variants, gathers.

Informs the raycast/meshing redesign: on this chip scatters cost ~10 ns
per UPDATE element regardless of payload size, so every design question
reduces to "how few scattered elements can express the result, and is a
sort cheaper than a scatter here".
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    n_pix = 640 * 480

    for n in (1 << 20, 1 << 22):
        keys = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
        vals = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32))
        f32 = jnp.asarray(rng.random(n, dtype=np.float32))

        timeit(f"sort u32 [{n>>20}M]", jax.jit(jnp.sort), keys)
        timeit(
            f"sort u32+carry i32 [{n>>20}M]",
            jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)),
            keys,
            vals,
        )
        timeit(
            f"argsort u32 [{n>>20}M]",
            jax.jit(lambda k: jnp.argsort(k)),
            keys,
        )

    pix1m = jnp.asarray(
        rng.integers(0, n_pix, 1 << 20, dtype=np.int32)
    )
    z1m = jnp.asarray(rng.random(1 << 20, dtype=np.float32))
    pix640k = pix1m[: 640 * 1024]
    z640k = z1m[: 640 * 1024]

    timeit(
        "scatter-min f32 1M -> 307k",
        jax.jit(
            lambda p, z: jnp.full((n_pix,), jnp.inf, jnp.float32)
            .at[p]
            .min(z, mode="drop")
        ),
        pix1m,
        z1m,
    )
    timeit(
        "scatter-min f32 640k -> 307k",
        jax.jit(
            lambda p, z: jnp.full((n_pix,), jnp.inf, jnp.float32)
            .at[p]
            .min(z, mode="drop")
        ),
        pix640k,
        z640k,
    )
    # unique-index set-scatter (winner list -> dense image)
    pix_u = jnp.asarray(rng.permutation(n_pix)[: 1 << 18].astype(np.int32))
    z_u = jnp.asarray(rng.random(1 << 18, dtype=np.float32))
    timeit(
        "scatter-set f32 256k unique -> 307k",
        jax.jit(
            lambda p, z: jnp.zeros((n_pix,), jnp.float32)
            .at[p]
            .set(z, mode="drop")
        ),
        pix_u,
        z_u,
    )
    # multi-channel set-scatter at same indices ([256k, 8] rows)
    rows = jnp.asarray(rng.random((1 << 18, 8), dtype=np.float32))
    timeit(
        "scatter-set f32x8 rows 256k unique -> 307k",
        jax.jit(
            lambda p, r: jnp.zeros((n_pix, 8), jnp.float32)
            .at[p]
            .set(r, mode="drop")
        ),
        pix_u,
        rows,
    )
    # gather comparison: 1M element gather from 4.2M
    src = jnp.asarray(rng.random(1 << 22, dtype=np.float32))
    gidx = jnp.asarray(rng.integers(0, 1 << 22, 1 << 20, dtype=np.int32))
    timeit(
        "gather f32 1M from 4.2M",
        jax.jit(lambda s, i: s[i]),
        src,
        gidx,
    )
    # row gather (the fast path): 1M rows of 8 from 4.2M rows
    src_r = jnp.asarray(rng.random((1 << 19, 8), dtype=np.float32))
    gidx_r = jnp.asarray(rng.integers(0, 1 << 19, 1 << 20, dtype=np.int32))
    timeit(
        "row-gather f32[...,8] 1M rows",
        jax.jit(lambda s, i: s[i]),
        src_r,
        gidx_r,
    )
    # cumsum over 4.2M (compaction building block)
    big = jnp.asarray(rng.integers(0, 2, 1 << 22, dtype=np.int32))
    timeit("cumsum i32 4.2M", jax.jit(jnp.cumsum), big)
    # segment-min alternative: sorted-key + min over runs via
    # associative scan? approximate with sort+compare
    def sort_winner(p, z):
        zq = jnp.minimum((z * 8191).astype(jnp.uint32), 8191)
        key = (p.astype(jnp.uint32) << jnp.uint32(13)) | zq
        sk = jnp.sort(key)
        pix_s = (sk >> jnp.uint32(13)).astype(jnp.int32)
        first = jnp.concatenate(
            [jnp.array([True]), pix_s[1:] != pix_s[:-1]]
        )
        zs = (sk & jnp.uint32(8191)).astype(jnp.float32) / 8191.0
        img = (
            jnp.full((n_pix,), jnp.inf, jnp.float32)
            .at[jnp.where(first, pix_s, n_pix)]
            .set(zs, mode="drop")
        )
        return img

    timeit("sort-based z-buffer 1M (sort+unique set)", jax.jit(sort_winner), pix1m, z1m)


if __name__ == "__main__":
    main()
