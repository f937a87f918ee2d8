"""Stereo keypoint depth from rectified image pairs.

The reference gets stereo depth inside OpenVSLAM's tracker (per-keypoint
epipolar patch matching on rectified pairs; SURVEY.md §2.8). TPU-native
formulation: gather one left patch and one right epipolar strip per
keypoint in a single batched gather, compute all candidate ZNCC scores
as one [F, D] tensor contraction (VPU-friendly, no per-ray loops),
take the arg-best with subpixel parabola refinement, and convert
disparity to depth with fx*baseline. All shapes static.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _gather_patches(img: jax.Array, vi: jax.Array, ui: jax.Array, dy, dx):
    """img [H, W]; vi/ui [F]; dy [P]; dx [Q] -> patches [F, P, Q]."""
    H, W = img.shape
    vv = jnp.clip(vi[:, None, None] + dy[None, :, None], 0, H - 1)
    uu = jnp.clip(ui[:, None, None] + dx[None, None, :], 0, W - 1)
    return img[vv, uu]


def stereo_keypoint_depth(
    gray_l: jax.Array,  # [H, W] float32 rectified left
    gray_r: jax.Array,  # [H, W] float32 rectified right
    uv: jax.Array,  # [F, 2] left keypoint pixels
    valid: jax.Array,  # [F] bool
    focal_x_baseline: float,  # fx * baseline (pixel * meters)
    max_disparity: int = 64,
    patch: int = 7,
    min_zncc: float = 0.6,
    min_depth: float = 0.1,
    max_depth: float = 40.0,
    min_texture: float = 2.0,  # mean |horizontal gradient| gate
) -> Tuple[jax.Array, jax.Array]:
    """Per-keypoint depth by epipolar ZNCC matching.

    Returns (depth [F] float32 — 0 where invalid, valid [F] bool).
    """
    H, W = gray_l.shape
    F = uv.shape[0]
    P = patch
    D = max_disparity
    half = P // 2

    ui = jnp.round(uv[:, 0]).astype(jnp.int32)
    vi = jnp.round(uv[:, 1]).astype(jnp.int32)
    dy = jnp.arange(-half, half + 1)
    dx = jnp.arange(-half, half + 1)

    left = _gather_patches(gray_l, vi, ui, dy, dx)  # [F, P, P]
    # right strip covers disparities 0..D-1: u' = u - d
    strip_dx = jnp.arange(-half - (D - 1), half + 1)  # [P + D - 1]
    strip = _gather_patches(gray_r, vi, ui, dy, strip_dx)  # [F, P, P+D-1]

    # candidate windows: strip column of offset (dx - d) is
    # dx - d + half + (D-1); window d covers [D-1-d, D-1-d+P)
    cols = (D - 1) + half + dx[None, :] - jnp.arange(D)[:, None]  # [D, P]
    wins = strip[:, :, cols]  # [F, P, D, P]
    wins = jnp.moveaxis(wins, 2, 1)  # [F, D, P, P]

    # ZNCC over the patch
    lf = left.reshape(F, 1, P * P)
    rf = wins.reshape(F, D, P * P)
    lm = lf - lf.mean(-1, keepdims=True)
    rm = rf - rf.mean(-1, keepdims=True)
    num = jnp.sum(lm * rm, -1)
    den = jnp.sqrt(
        jnp.sum(lm * lm, -1) * jnp.sum(rm * rm, -1) + 1e-9
    )
    zncc = num / den  # [F, D]

    best = jnp.argmax(zncc, axis=-1)  # [F]
    score = jnp.take_along_axis(zncc, best[:, None], -1)[:, 0]

    # subpixel parabola around the best integer disparity
    bm1 = jnp.clip(best - 1, 0, D - 1)
    bp1 = jnp.clip(best + 1, 0, D - 1)
    y0 = jnp.take_along_axis(zncc, bm1[:, None], -1)[:, 0]
    y2 = jnp.take_along_axis(zncc, bp1[:, None], -1)[:, 0]
    denom = y0 - 2 * score + y2
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (y0 - y2) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    disp = best.astype(jnp.float32) + delta

    depth = focal_x_baseline / jnp.maximum(disp, 1e-3)
    # aperture gate: without horizontal texture every shift matches
    # equally well (zncc stays high on a horizontal-only edge)
    h_grad = jnp.mean(jnp.abs(left[:, :, 1:] - left[:, :, :-1]), axis=(1, 2))
    ok = (
        valid
        & (h_grad >= min_texture)
        & (score >= min_zncc)
        & (best > 0)
        & (best < D - 1)
        & (depth > min_depth)
        & (depth < max_depth)
        # strip must not have been clipped at the image border
        & (ui - (best + half) >= 0)
        & (ui + half < W)
        & (vi - half >= 0)
        & (vi + half < H)
    )
    return jnp.where(ok, depth, 0.0), ok


def sparse_depth_image(
    uv: jax.Array,  # [F, 2]
    depth: jax.Array,  # [F]
    valid: jax.Array,  # [F] bool
    height: int,
    width: int,
) -> jax.Array:
    """Scatter per-keypoint depths into a [H, W] image (0 elsewhere) so
    stereo frames reuse the RGB-D landmark-creation path (depth is only
    read at keypoint pixels, `slam/tracker.py:insert_keyframe_landmarks`)."""
    ui = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, width - 1)
    vi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, height - 1)
    flat = jnp.where(valid, vi * width + ui, height * width)
    img = jnp.zeros((height * width,), jnp.float32)
    img = img.at[flat].set(depth, mode="drop")
    return img.reshape(height, width)
