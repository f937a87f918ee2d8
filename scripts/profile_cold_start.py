"""Cold-start measurement + correctness check of the AOT executable
cache on the real integrate step.

Phase "a" (fresh process, empty cache): boot -> cached_compile MISSES
-> remote compile + persist; fuse 4 frames; save output checksums.
Phase "b" (fresh process, warm cache): boot -> cached_compile HITS
(0.04 s class); fuse the same 4 frames; assert BIT-IDENTICAL outputs.

Uses a small-but-real config (QVGA, 2 cm voxels) so phase "a"'s compile
is minutes not Mississippi; the mechanism is size-independent and
bench.py wires the same cache into the bench-scale step.

  python scripts/profile_cold_start.py a && python scripts/profile_cold_start.py b
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

STATE = "/tmp/cold_start_state.npz"


def main():
    phase = sys.argv[1]
    t_boot = time.perf_counter()
    import functools

    import jax
    import jax.numpy as jnp

    from ra_slam_tpu.core.config import TsdfConfig
    from ra_slam_tpu.core.se3 import SE3
    from ra_slam_tpu.io.synthetic import SyntheticBoxDataset, SyntheticCameraSpec
    from ra_slam_tpu.map.voxel_map import create_map, integrate_frame
    from ra_slam_tpu.utils.aot_cache import cached_compile

    cfg = TsdfConfig(
        voxel_size=0.02, truncation=0.12, max_depth=6.0,
        log2_num_blocks=15, log2_hash_size=17,
        max_visible_blocks=1 << 12, max_new_blocks=1 << 13,
        width=320, height=240,
    )
    ds = SyntheticBoxDataset(
        num_frames=4,
        cam=SyntheticCameraSpec(fx=160.0, fy=160.0, cx=159.5, cy=119.5,
                                width=320, height=240),
        half_extents=(3.0, 2.0, 3.0), radius=1.0,
    )
    cam = ds.camera
    frames = [ds.frame(i) for i in range(4)]
    args = [
        (jnp.asarray(f.rgb, jnp.float32), jnp.asarray(f.depth),
         jnp.asarray(f.ht), jnp.asarray(f.lt),
         SE3.from_matrix(jnp.asarray(f.cam_T_world)))
        for f in frames
    ]

    jit_step = jax.jit(
        functools.partial(integrate_frame, cfg=cfg, alloc_stride=2),
        donate_argnums=(0,),
    )
    m = create_map(cfg)
    step, info = cached_compile(
        jit_step, (m, *args[0][:4], cam, args[0][4]), extra="cold_start_v1"
    )
    t_ready = time.perf_counter() - t_boot
    for rgb, depth, ht, lt, pose in args:
        m, stats = step(m, rgb, depth, ht, lt, cam, pose)
    tsdf = np.asarray(m.tsdf)
    w = np.asarray(m.weight)
    digest = dict(
        num_active=int(np.asarray(stats["num_active"])),
        tsdf_sum=float(tsdf.astype(np.float64).sum()),
        w_sum=float(w.astype(np.float64).sum()),
        tsdf_crc=int(np.frombuffer(tsdf.tobytes(), np.uint32).sum(dtype=np.uint64) & 0xFFFFFFFF),
    )
    out = {"phase": phase, "ready_s": round(t_ready, 2), **info, **digest}
    print(json.dumps(out), flush=True)

    if phase == "a":
        np.savez(STATE, **digest)
    else:
        ref = np.load(STATE)
        for k in digest:
            assert np.isclose(float(ref[k]), float(digest[k]), rtol=0, atol=0), (
                k, float(ref[k]), float(digest[k])
            )
        print("BIT-IDENTICAL across processes: ok", flush=True)


if __name__ == "__main__":
    main()
