"""Payload gather layout shootout at the integrate operating point:
8192 visible rows out of a 131072-row pool, 6 f32 channels x 512 voxels
per row. SoA x4 gathers (current) vs one fused [N, 6*512] gather vs
fused bf16. Also the matching scatters (non-donated)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, *args, iters=30):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    print(f"{name:56s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms", flush=True)
    return out


def main():
    N, V = 1 << 17, 1 << 13
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, V, dtype=np.int32))

    tsdf = jnp.ones((N, 512), jnp.float32)
    weight = jnp.ones((N, 512), jnp.float32)
    prob = jnp.ones((N, 512), jnp.float32)
    rgb = jnp.ones((N, 3, 512), jnp.float32)
    fused = jnp.ones((N, 6 * 512), jnp.float32)

    t("SoA gather x4 (t,w,p,[3]rgb)",
      lambda i: (tsdf[i], weight[i], prob[i], rgb[i]), idx)
    t("fused gather [N, 3072]", lambda i: fused[i], idx)
    t("gather tsdf only [N, 512]", lambda i: tsdf[i], idx)
    t("gather rgb only [N, 3, 512]", lambda i: rgb[i], idx)

    g = fused[idx]
    gs = (tsdf[idx], weight[idx], prob[idx], rgb[idx])

    def scatter_soa(i, a, b, c, d):
        return (tsdf.at[i].set(a), weight.at[i].set(b),
                prob.at[i].set(c), rgb.at[i].set(d))

    t("SoA scatter x4 (copies pool)", scatter_soa, idx, *gs)
    t("fused scatter (copies pool)", lambda i, x: fused.at[i].set(x), idx, g)

    def donated_step(pool, i, x):
        return pool.at[i].set(x * 1.5)

    dstep = jax.jit(donated_step, donate_argnums=(0,))
    pool = jnp.ones((N, 6 * 512), jnp.float32)
    pool = dstep(pool, idx, g)
    jax.device_get(pool[0, 0])
    t0 = time.perf_counter()
    for _ in range(30):
        pool = dstep(pool, idx, g)
    jax.device_get(pool[0, 0])
    print(f"{'fused scatter DONATED':56s} {(time.perf_counter()-t0)/30*1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
