"""FAST-9/16 corner detection, fully vectorized.

The reference consumes OpenVSLAM's per-cell FAST with a two-threshold
fallback (SURVEY.md §2.8: ini 20 / min 7). GPU FAST walks the 16-pixel
Bresenham circle per thread with early exits; on TPU we instead build 16
*shifted copies* of the whole image and evaluate every pixel's circle
simultaneously — dense vector ops, no divergence, one pass.

Segment test: a corner needs >= 9 *contiguous* circle pixels all
brighter (or all darker) than center +- t. Contiguity over a circular
window is a rolling AND of 9 rotations of the 16-lane mask.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (the standard FAST-16 ring, clockwise).
_CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
ARC = 9
BORDER = 3


def _ring_stack(img: jax.Array) -> jax.Array:
    """[16, H, W]: circle pixel k of every center (zero-padded borders)."""
    rings = []
    for dx, dy in _CIRCLE:
        rings.append(jnp.roll(img, shift=(-dy, -dx), axis=(0, 1)))
    return jnp.stack(rings, axis=0)


def fast_score(img: jax.Array, threshold: float) -> jax.Array:
    """[H, W] corner score: 0 for non-corners, else the sum-of-absolute
    -differences-beyond-threshold strength (OpenCV-style V score)."""
    H, W = img.shape
    ring = _ring_stack(img)  # [16, H, W]
    center = img[None]
    bright = ring > center + threshold
    dark = ring < center - threshold

    def has_arc(mask):
        run = mask
        for k in range(1, ARC):
            run = run & jnp.roll(mask, -k, axis=0)
        return jnp.any(run, axis=0)

    is_corner = has_arc(bright) | has_arc(dark)

    db = jnp.where(bright, ring - center - threshold, 0.0)
    dd = jnp.where(dark, center - threshold - ring, 0.0)
    score = jnp.maximum(jnp.sum(db, axis=0), jnp.sum(dd, axis=0))

    # zero the 3-pixel border (circle would wrap)
    u = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    inb = (u >= BORDER) & (u < W - BORDER) & (v >= BORDER) & (v < H - BORDER)
    return jnp.where(is_corner & inb, score, 0.0)


def _nms3(score: jax.Array) -> jax.Array:
    """3x3 non-maximum suppression (keep strict local maxima)."""
    neigh = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= neigh, score, 0.0)


def fast_corners(
    img: jax.Array,
    threshold: float,
    max_corners: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Detect up to `max_corners` FAST corners on one image.

    Returns (uv [K, 2] float32, score [K], valid [K] bool) — fixed K,
    selected by global top-k score after 3x3 NMS.
    """
    H, W = img.shape
    raw = fast_score(img, threshold)
    s = _nms3(raw)
    flat = s.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_corners)
    ui = (idx % W).astype(jnp.int32)
    vi = (idx // W).astype(jnp.int32)
    valid = vals > 0.0

    # Subpixel localization: 1-D parabola fits on the raw corner score in
    # u and v. Integer-pixel corners cost ~0.5 px of reprojection noise
    # (= centimeters of pose error at SLAM working depths); the fit
    # recovers most of it for free.
    uc = jnp.clip(ui, 1, W - 2)
    vc = jnp.clip(vi, 1, H - 2)
    c = raw[vc, uc]
    left, right = raw[vc, uc - 1], raw[vc, uc + 1]
    up, down = raw[vc - 1, uc], raw[vc + 1, uc]
    du = _parabola_offset(left, c, right)
    dv = _parabola_offset(up, c, down)
    u = ui.astype(jnp.float32) + jnp.where(valid, du, 0.0)
    v = vi.astype(jnp.float32) + jnp.where(valid, dv, 0.0)
    return jnp.stack([u, v], axis=-1), vals, valid


def _parabola_offset(lo: jax.Array, c: jax.Array, hi: jax.Array) -> jax.Array:
    """Vertex offset in [-0.5, 0.5] of the parabola through (-1,lo),(0,c),(1,hi)."""
    denom = 2.0 * c - lo - hi
    off = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (hi - lo) / jnp.maximum(denom, 1e-6), 0.0)
    return jnp.clip(off, -0.5, 0.5)
