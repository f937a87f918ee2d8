"""Stage-level profile of mesh extraction at bench scale.

Builds the analytic box-room map (no fused-integrate compile needed),
then times: census / emission chunk loop / device dedup / transfer /
host assembly. Stage timings are measured by syncing between stages —
note each sync costs the NEXT stage a ~0.8 s post-readback dispatch
stall on this rig, so the uninstrumented end-to-end medians are the
ground truth and the stage deltas are attribution.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from ra_slam_tpu.core.config import TsdfConfig
from ra_slam_tpu.map import meshing as M
from ra_slam_tpu.map.synthetic_map import analytic_box_map


def log(msg):
    print(f"[+{time.monotonic()-T0:7.1f}s] {msg}", flush=True)


T0 = time.monotonic()


def main():
    cfg = TsdfConfig(
        voxel_size=0.01, truncation=0.06, max_depth=6.0,
        log2_num_blocks=17, log2_hash_size=19,
        max_visible_blocks=1 << 13, max_new_blocks=1 << 13,
        width=640, height=480,
    )
    t0 = time.perf_counter()
    m = analytic_box_map(cfg)
    n_act = int(jnp.sum(m.active))
    log(f"map built: {n_act} active blocks ({time.perf_counter()-t0:.1f}s)")

    # --- census ---
    t0 = time.perf_counter()
    surf_idx, surf_counts = M._surface_census(m, 1.5)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    surf_idx, surf_counts = M._surface_census(m, 1.5)
    warm = time.perf_counter() - t0
    n = int(surf_counts.sum())
    log(f"census: cold {cold:.2f}s warm {warm:.2f}s; "
        f"{len(surf_idx)} surf blocks, {n} tris")

    # --- emission loop ---
    chunk = 1024
    order, c_max = M._plan_chunks(surf_idx, surf_counts, chunk)
    cap = 1 << max(14, (n - 1).bit_length())
    cap = min(cap, max(1 << 23, n))
    log(f"plan: {order.shape[0]} chunks of {chunk}, c_max {c_max}, cap {cap}")

    def emit():
        sent = jnp.uint32(0xFFFFFFFF)
        bh = jnp.full(((cap + c_max) * 3,), sent)
        bl = jnp.full(((cap + c_max) * 3,), sent)
        ba = jnp.full(((cap + c_max) * 3,), sent)
        off = jnp.int32(0)
        for c in range(order.shape[0]):
            bh, bl, ba, off = M._mesh_chunk(
                m, jnp.asarray(order[c]), bh, bl, ba, off, 1.5, c_max)
        return bh, bl, ba, off

    t0 = time.perf_counter()
    bh, bl, ba, off = emit()
    jax.device_get(off)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    bh, bl, ba, off = emit()
    jax.device_get(off)
    warm = time.perf_counter() - t0
    log(f"emission: cold {cold:.2f}s warm {warm:.2f}s ({int(off)} tris)")

    # --- dedup (new signature: renumber + delta encode fused) ---
    t0 = time.perf_counter()
    out = M._dedup_device(bh[: cap * 3], bl[: cap * 3], ba[: cap * 3],
                          cfg.voxel_size)
    v = int(out[7])
    cold = time.perf_counter() - t0
    bh, bl, ba, off = emit()
    jax.device_get(off)
    t0 = time.perf_counter()
    out = M._dedup_device(bh[: cap * 3], bl[: cap * 3], ba[: cap * 3],
                          cfg.voxel_size)
    v = int(out[7])
    warm = time.perf_counter() - t0
    log(f"dedup: cold {cold:.2f}s warm {warm:.2f}s ({v} verts, "
        f"{int(out[6])} exc)")

    # --- stream + assemble (chunked transfer overlapped with host) ---
    xq, yq, zq, pq, d16, exc_vals, n_exc, n_verts_d, aabb_lo, aabb_scale = out
    t0 = time.perf_counter()
    idx_ch = M._stream_chunks(d16, 3 * n)
    exc_pref = exc_vals[: min(1 << 17, exc_vals.shape[0])]
    exc_pref.copy_to_host_async()
    for c in idx_ch:
        c.copy_to_host_async()
    vert_ch = [M._stream_chunks(a, v) for a in (xq, yq, zq, pq)]
    for chs in vert_ch:
        for c in chs:
            c.copy_to_host_async()
    indices = M._decode_index_stream(
        idx_ch, 3 * n, np.asarray(exc_pref), exc_vals).reshape(-1, 3)
    lo_h = np.asarray(aabb_lo); sc_h = np.asarray(aabb_scale)
    vertices = np.empty((v, 3), np.float32)
    for k, chs in enumerate(vert_ch[:3]):
        vertices[:, k] = M._cat_chunks(chs, v).astype(np.float32) * (
            sc_h[k] / 65535.0) + lo_h[k]
    probs = M._cat_chunks(vert_ch[3], v).astype(np.float32) / 65535.0
    nondeg = ((indices[:, 0] != indices[:, 1])
              & (indices[:, 1] != indices[:, 2])
              & (indices[:, 0] != indices[:, 2]))
    indices = indices[nondeg]
    dt = time.perf_counter() - t0
    nbytes = 3 * n * 2 + v * 8
    log(f"stream+assemble: {nbytes/1e6:.1f} MB in {dt:.2f}s "
        f"({nbytes/1e6/dt:.1f} MB/s)  {len(vertices)} verts {len(indices)} tris")

    # --- uninstrumented end-to-end, 3 passes ---
    dts = []
    for i in range(3):
        t0 = time.perf_counter()
        verts, idx, probs = M.extract_mesh(m, cfg, max_tris=1 << 24)
        dts.append(time.perf_counter() - t0)
        log(f"extract_mesh pass {i}: {dts[-1]:.2f}s")
    log(f"end-to-end warm: median {sorted(dts)[1]:.2f}s  all {[round(d,2) for d in dts]}")


if __name__ == "__main__":
    main()
