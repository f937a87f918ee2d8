"""Oriented BRIEF (ORB) keypoints + descriptors, batched.

Replaces the capability the reference outsources to OpenVSLAM's ORB
extractor (SURVEY.md §2.8: pyramid FAST + intensity-centroid orientation
+ rotated BRIEF, 1000 kps / 8 levels / scale 1.2). TPU formulation:
every keypoint's orientation patch and all 256 descriptor point-pairs
are gathered as one big batched lookup — [K, P] index arithmetic into
the flat image, no per-keypoint loops.

The 256-pair sampling pattern is generated from a fixed-seed isotropic
Gaussian (sigma = patch/5, the classic BRIEF recipe) rather than copying
OpenCV's learned pattern; matching quality differences are small and the
pattern is a deterministic constant baked into the program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ra_slam_tpu.core.config import FeatureConfig
from ra_slam_tpu.features.fast import fast_corners
from ra_slam_tpu.features.pyramid import build_pyramid, gaussian_blur, rgb_to_gray

PATCH_RADIUS = 15  # 31x31 orientation / descriptor patch
NUM_PAIRS = 256
DESC_WORDS = 8  # 256 bits packed into 8 x uint32


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set for one image (a pytree).

    uv is in full-resolution pixel coordinates; level/score/angle per
    keypoint; desc packs 256 BRIEF bits into 8 uint32 words; valid masks
    real detections.
    """

    uv: jax.Array  # [K, 2] float32
    level: jax.Array  # [K] int32
    score: jax.Array  # [K] float32
    angle: jax.Array  # [K] float32 radians
    desc: jax.Array  # [K, 8] uint32
    valid: jax.Array  # [K] bool

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]


@functools.lru_cache()
def _pattern() -> np.ndarray:
    """[256, 4] int32 (x1, y1, x2, y2) BRIEF test pairs."""
    rng = np.random.default_rng(8571)
    sigma = PATCH_RADIUS / 1.5
    pts = rng.normal(0.0, sigma, size=(NUM_PAIRS, 4))
    return np.clip(np.round(pts), -PATCH_RADIUS + 1, PATCH_RADIUS - 1).astype(
        np.int32
    )


@functools.lru_cache()
def _centroid_offsets() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Circular-patch offsets and weights for the intensity centroid."""
    ys, xs = np.mgrid[-PATCH_RADIUS : PATCH_RADIUS + 1, -PATCH_RADIUS : PATCH_RADIUS + 1]
    inside = xs**2 + ys**2 <= PATCH_RADIUS**2
    return xs[inside].astype(np.int32), ys[inside].astype(np.int32), inside


def _gather(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Clamped 2-D gather of img [H, W] at int coords (any shape)."""
    H, W = img.shape
    xc = jnp.clip(x, 0, W - 1)
    yc = jnp.clip(y, 0, H - 1)
    return img[yc, xc]


def orientation(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Intensity-centroid angle (rad) for keypoints uv [K, 2] on img."""
    xs, ys, _ = _centroid_offsets()
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    xi = jnp.round(uv[:, 0]).astype(jnp.int32)[:, None] + xs[None]
    yi = jnp.round(uv[:, 1]).astype(jnp.int32)[:, None] + ys[None]
    vals = _gather(img, xi, yi)  # [K, P]
    m10 = jnp.sum(vals * xs[None].astype(jnp.float32), axis=1)
    m01 = jnp.sum(vals * ys[None].astype(jnp.float32), axis=1)
    return jnp.arctan2(m01, m10)


def orb_descriptors(
    img_blur: jax.Array, uv: jax.Array, angle: jax.Array
) -> jax.Array:
    """Steered-BRIEF descriptors: [K, 8] uint32 for keypoints on one level.

    img_blur must be pre-smoothed (gaussian_blur).
    """
    pat = jnp.asarray(_pattern(), dtype=jnp.float32)  # [256, 4]
    ca = jnp.cos(angle)[:, None]  # [K, 1]
    sa = jnp.sin(angle)[:, None]

    def rot(px, py):
        # rotate pattern offsets by keypoint angle
        rx = ca * px[None] - sa * py[None]
        ry = sa * px[None] + ca * py[None]
        return rx, ry

    x1, y1 = rot(pat[:, 0], pat[:, 1])
    x2, y2 = rot(pat[:, 2], pat[:, 3])
    u = uv[:, 0:1]
    v = uv[:, 1:2]
    p1 = _gather(img_blur, jnp.round(u + x1).astype(jnp.int32), jnp.round(v + y1).astype(jnp.int32))
    p2 = _gather(img_blur, jnp.round(u + x2).astype(jnp.int32), jnp.round(v + y2).astype(jnp.int32))
    bits = (p1 < p2).astype(jnp.uint32)  # [K, 256]

    shifts = jnp.asarray(np.arange(NUM_PAIRS) % 32, dtype=jnp.uint32)
    words = bits << shifts[None]
    return jnp.sum(
        words.reshape(-1, DESC_WORDS, 32), axis=2, dtype=jnp.uint32
    )  # [K, 8]


def level_quotas(cfg: FeatureConfig) -> list:
    """Per-level keypoint quotas: geometric (1/s)^l weighting, min 16."""
    inv = [1.0 / (cfg.scale_factor**l) for l in range(cfg.num_levels)]
    total = sum(inv)
    return [max(int(round(cfg.max_num_keypoints * w / total)), 16) for w in inv]


def keypoint_capacity(cfg: FeatureConfig) -> int:
    """Actual fixed Keypoints capacity (sum of level quotas — rounding
    can differ slightly from cfg.max_num_keypoints; any consumer sizing
    per-feature arrays must use THIS)."""
    return sum(level_quotas(cfg))


def detect_and_describe(
    gray: jax.Array,
    cfg: FeatureConfig,
) -> Keypoints:
    """Full ORB pipeline on one grayscale image: pyramid -> FAST ->
    orientation -> steered BRIEF. Fixed total capacity
    cfg.max_num_keypoints, distributed across levels by the geometric
    level weighting OpenVSLAM uses (more keypoints at finer levels).
    """
    levels = build_pyramid(gray, cfg.num_levels, cfg.scale_factor)
    quotas = level_quotas(cfg)

    all_parts = []
    for lvl, (img, quota) in enumerate(zip(levels, quotas)):
        s = cfg.scale_factor**lvl
        uv, score, valid = fast_corners(
            img, float(cfg.ini_fast_threshold), quota,
            min_threshold=float(cfg.min_fast_threshold),
            cell_size=int(cfg.cell_size),
        )
        blur = gaussian_blur(img)
        ang = orientation(img, uv)
        desc = orb_descriptors(blur, uv, ang)
        all_parts.append(
            Keypoints(
                uv=uv * s,
                level=jnp.full((quota,), lvl, jnp.int32),
                score=score,
                angle=ang,
                desc=desc,
                valid=valid,
            )
        )

    return Keypoints(
        uv=jnp.concatenate([p.uv for p in all_parts]),
        level=jnp.concatenate([p.level for p in all_parts]),
        score=jnp.concatenate([p.score for p in all_parts]),
        angle=jnp.concatenate([p.angle for p in all_parts]),
        desc=jnp.concatenate([p.desc for p in all_parts]),
        valid=jnp.concatenate([p.valid for p in all_parts]),
    )


def detect_and_describe_rgb(rgb: jax.Array, cfg: FeatureConfig) -> Keypoints:
    return detect_and_describe(rgb_to_gray(rgb), cfg)
