"""Sub-stage profile of ORB detect at VGA/1000kp/4 levels: which of
pyramid / FAST score / nms+select / blur / orientation / descriptors
owns the 14 ms."""
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
    return out


def main():
    from ra_slam_tpu.core.config import FeatureConfig
    from ra_slam_tpu.features.fast import _cell_select, _nms3, fast_corners, fast_score
    from ra_slam_tpu.features.orb import (
        detect_and_describe, level_quotas, orb_descriptors, orientation,
    )
    from ra_slam_tpu.features.pyramid import build_pyramid, gaussian_blur

    cfg = FeatureConfig(max_num_keypoints=1000, num_levels=4)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (480, 640)), jnp.float32)

    t("FULL detect_and_describe", lambda x: detect_and_describe(x, cfg), img)
    t("build_pyramid (4 lvls)", lambda x: build_pyramid(x, 4, 1.2), img)

    levels = build_pyramid(img, 4, 1.2)
    quotas = level_quotas(cfg)
    for lvl, (li, q) in enumerate(zip(levels, quotas)):
        li = jax.device_put(li)
        t(f"L{lvl} fast_score", lambda x: fast_score(x, 20.0), li)
        s = _nms3(fast_score(li, 20.0))
        t(f"L{lvl} nms3", _nms3, s)
        t(f"L{lvl} cell_select (2x top_k)",
          lambda x: _cell_select(x, q, 32), s)
        t(f"L{lvl} fast_corners FULL (2 thresh)",
          lambda x: fast_corners(x, 20.0, q, min_threshold=7.0,
                                 cell_size=32), li)
        t(f"L{lvl} gaussian_blur", gaussian_blur, li)
        uv, sc, valid = fast_corners(li, 20.0, q, min_threshold=7.0,
                                     cell_size=32)
        t(f"L{lvl} orientation", orientation, li, uv)
        ang = orientation(li, uv)
        blur = gaussian_blur(li)
        t(f"L{lvl} orb_descriptors", orb_descriptors, blur, uv, ang)


if __name__ == "__main__":
    main()
