"""Micro-profile allocate_keys internals at the bench operating point
(stride-3 VGA candidates = 171k keys, take = 8192) to find where the
~7-12 ms of the allocation stage actually goes."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, *args, iters=40):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    print(f"{name:52s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms", flush=True)


def main():
    from ra_slam_tpu.map.blocks import INVALID_KEY
    from ra_slam_tpu.map.hash_table import HashTable, ht_insert, ht_lookup

    rng = np.random.default_rng(0)
    M = 171_264  # 160x214x5 candidates, stride 3
    take = 8192
    u_cap = 2 * take
    N = 1 << 17  # pool rows
    # realistic duplication: ~6k distinct blocks drawn per frame
    distinct = rng.integers(0, 1 << 24, 6000, dtype=np.int32)
    cand = jnp.asarray(distinct[rng.integers(0, 6000, M)], jnp.int32)

    table = HashTable.create(19)
    keys_in = jnp.asarray(
        rng.integers(0, 1 << 24, 40_000, dtype=np.int32))
    vals_in = jnp.arange(40_000, dtype=jnp.int32)
    table, _, _ = jax.jit(ht_insert)(table, keys_in, vals_in,
                                     jnp.ones((40_000,), bool))
    jax.device_get(table.key[0])

    t("sort 171k i32", jnp.sort, cand)

    def dedup_compact(sk):
        uniq = (sk != jnp.roll(sk, 1)) & (sk != INVALID_KEY)
        uniq = uniq.at[0].set(sk[0] != INVALID_KEY)
        dest = jnp.cumsum(uniq.astype(jnp.int32)) - 1
        dest = jnp.where(uniq & (dest < u_cap), dest, u_cap)
        return jnp.full((u_cap,), INVALID_KEY, jnp.int32).at[dest].set(
            sk, mode="drop")

    sk = jnp.sort(cand)
    t("dedup cumsum+scatter 171k->16k", dedup_compact, sk)

    ukeys = dedup_compact(sk)
    t("ht_lookup 16k (bucket row-gather)", ht_lookup, table, ukeys)

    def freelist(active):
        free = ~active
        rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        dest = jnp.where(free & (rank < take), rank, take)
        return jnp.full((take,), -1, jnp.int32).at[dest].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop")

    active = jnp.asarray(rng.random(N) < 0.3)
    t("freelist cumsum 131k + scatter", freelist, active)

    ins_keys = jnp.asarray(rng.integers(0, 1 << 24, take, dtype=np.int32))
    ins_vals = jnp.arange(take, dtype=jnp.int32)
    ins_valid = jnp.asarray(rng.random(take) < 0.05)  # steady state: few new
    t("ht_insert 8192 (sort+rank+scatter)", ht_insert,
      table, ins_keys, ins_vals, ins_valid)

    # ---- staging-hash alternative for the dedup: scatter candidates
    # into a 32k staging array (collisions lose a key for one frame),
    # then compact occupied slots
    S_LOG2 = 15

    def staging(cand, salt):
        from ra_slam_tpu.map.blocks import hash_key
        slot = hash_key(cand ^ salt, S_LOG2)
        stage = jnp.full((1 << S_LOG2,), INVALID_KEY, jnp.int32)
        stage = stage.at[jnp.where(cand != INVALID_KEY, slot, 1 << S_LOG2)
                         ].set(cand, mode="drop")
        occ = stage != INVALID_KEY
        dest = jnp.cumsum(occ.astype(jnp.int32)) - 1
        dest = jnp.where(occ & (dest < u_cap), dest, u_cap)
        return jnp.full((u_cap,), INVALID_KEY, jnp.int32).at[dest].set(
            stage, mode="drop")

    t("staging-hash scatter 171k->32k + compact", staging, cand,
      jnp.int32(17))


if __name__ == "__main__":
    main()
