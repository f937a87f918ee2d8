"""Pinhole camera model.

Parity with the reference's device camera structs
(`/root/reference/utils/cuda/camera.cuh:13-68`: `CameraIntrinsics` with a
closed-form inverse and projection `operator*`, and `CameraParams` bundling
intrinsics + inverse + image size), reworked as a batched JAX pytree.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    """Pinhole intrinsics + image size. All fields are scalars (or batched)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    width: int = 640
    height: int = 480

    @staticmethod
    def create(fx, fy, cx, cy, width, height, scale: float = 1.0) -> "PinholeCamera":
        """Build, optionally rescaling intrinsics to a resized image
        (the reference's `CameraIntrinsics(... / downsample)` pattern)."""
        f = jnp.float32
        return PinholeCamera(
            f(fx * scale), f(fy * scale), f(cx * scale), f(cy * scale),
            int(round(width * scale)), int(round(height * scale)),
        )

    def matrix(self) -> jax.Array:
        """3x3 K matrix."""
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )

    def project(self, pts_cam: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Camera-frame points [..., 3] -> (pixel uv [..., 2], depth [...]).

        uv is in continuous pixel coordinates; depth is the z coordinate.
        """
        z = pts_cam[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = pts_cam[..., 0] * inv_z * self.fx + self.cx
        v = pts_cam[..., 1] * inv_z * self.fy + self.cy
        return jnp.stack([u, v], axis=-1), z

    def unproject(self, uv: jax.Array, depth: jax.Array) -> jax.Array:
        """Pixels [..., 2] + depth [...] -> camera-frame points [..., 3]."""
        x = (uv[..., 0] - self.cx) / self.fx * depth
        y = (uv[..., 1] - self.cy) / self.fy * depth
        return jnp.stack([x, y, depth], axis=-1)

    def pixel_grid(self) -> jax.Array:
        """[H, W, 2] grid of (u, v) pixel-center coordinates."""
        u = jax.lax.broadcasted_iota(jnp.float32, (self.height, self.width), 1)
        v = jax.lax.broadcasted_iota(jnp.float32, (self.height, self.width), 0)
        return jnp.stack([u, v], axis=-1)

    def in_bounds(self, uv: jax.Array, margin: float = 0.0) -> jax.Array:
        """Boolean mask: uv within the image rectangle (exclusive upper)."""
        u, v = uv[..., 0], uv[..., 1]
        return (
            (u >= margin)
            & (u <= self.width - 1 - margin)
            & (v >= margin)
            & (v <= self.height - 1 - margin)
        )

    def resized(self, new_width: int, new_height: int) -> "PinholeCamera":
        sx = new_width / self.width
        sy = new_height / self.height
        return PinholeCamera(
            self.fx * sx, self.fy * sy, self.cx * sx, self.cy * sy,
            new_width, new_height,
        )


def bilinear_sample(img: jax.Array, uv: jax.Array, fill: float = 0.0):
    """Bilinearly sample img [H, W] or [H, W, C] at continuous uv [..., 2].

    Returns (values, valid_mask). Out-of-bounds samples return `fill`.
    """
    H, W = img.shape[0], img.shape[1]
    u, v = uv[..., 0], uv[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    valid = (u0i >= 0) & (u0i < W - 1) & (v0i >= 0) & (v0i < H - 1)
    u0c = jnp.clip(u0i, 0, W - 2)
    v0c = jnp.clip(v0i, 0, H - 2)

    def gather(yy, xx):
        return img[yy, xx]

    p00 = gather(v0c, u0c)
    p01 = gather(v0c, u0c + 1)
    p10 = gather(v0c + 1, u0c)
    p11 = gather(v0c + 1, u0c + 1)
    if img.ndim == 3:
        du = du[..., None]
        dv = dv[..., None]
        vmask = valid[..., None]
    else:
        vmask = valid
    out = (
        p00 * (1 - du) * (1 - dv)
        + p01 * du * (1 - dv)
        + p10 * (1 - du) * dv
        + p11 * du * dv
    )
    return jnp.where(vmask, out, fill), valid


def nearest_sample(img: jax.Array, uv: jax.Array, fill: float = 0.0):
    """Nearest-neighbor sample (the reference integrate kernel's image
    lookup, `/root/reference/utils/tsdf/voxel_tsdf.cu:196-199`).

    Returns (values, valid_mask).
    """
    H, W = img.shape[0], img.shape[1]
    ui = jnp.round(uv[..., 0]).astype(jnp.int32)
    vi = jnp.round(uv[..., 1]).astype(jnp.int32)
    valid = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    uc = jnp.clip(ui, 0, W - 1)
    vc = jnp.clip(vi, 0, H - 1)
    vals = img[vc, uc]
    vmask = valid[..., None] if img.ndim == 3 else valid
    return jnp.where(vmask, vals, fill), valid
