"""Raycast rendering of the TSDF map.

Capability parity with the reference's `ray_cast_kernel`
(`/root/reference/utils/tsdf/voxel_tsdf.cu:278-374`): depth, shaded
RGBA with a semantic red-alpha overlay, and surface normals from a
virtual camera.

TPU-native redesign — **splatting, not marching**. The reference
sphere-marches every ray with an adaptive step and per-step hash
lookups; rays are independent so a GPU warp tolerates the divergence.
On a TPU both the per-step *gathers* (random access into the voxel
pool) and the long data-dependent loop are poison: a 640x480 render
costs 200 serial steps x 3 gathers over 307k rays and minutes of
XLA compile for the unrolled lookup chain.

Here the data flow is inverted into dense, batched ops — the same move
as the integrate kernel (map/voxel_map.py): instead of rays *searching*
for the surface, every voxel of every frustum-visible block *reports*
where it is:

  1. frustum-cull + compact active blocks (cumsum-scatter, shared with
     the integrate path);
  2. project all [V, 512] voxel centers into the camera — one dense
     matmul + elementwise pass, no gathers (payloads arrive by fast
     row gather of whole blocks);
  3. every near-surface voxel (|tsdf| < shell, weight >= min) splats a
     *TSDF-corrected* depth: the range-scaled SDF stored by the
     integrator localizes the zero crossing along the ray, so
     z_surf = z_voxel + tsdf * truncation / (range/z). Every splat in
     the 2x-truncation shell lands on the surface itself — sub-voxel
     accuracy without the reference's trilinear refinement loop, and
     a ~12-voxel-thick splat layer that keeps grazing surfaces
     hole-free;
  4. one scatter-min z-buffers 8.4M splats into the depth image;
     color/semantics resolve with packed (depth16 | attr8) int32
     scatter-mins (winner-take-nearest per channel);
  5. normals come from central differences of the *depth image*
     (screen-space), replacing the reference's 6 extra trilinear
     map lookups per hit with shifted dense slices.

Outputs match the reference renderer: RGBA image (shaded color +
semantic overlay), normal image, depth map, hit mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ra_slam_tpu.core.camera import PinholeCamera
from ra_slam_tpu.core.config import TsdfConfig
from ra_slam_tpu.core.se3 import SE3
from ra_slam_tpu.map.blocks import BLOCK_LEN, unpack_block_coords, voxel_offsets
from ra_slam_tpu.map.voxel_map import VoxelMap, visible_blocks



def _screen_space_normals(
    depth: jax.Array, hit: jax.Array, cam: PinholeCamera
) -> jax.Array:
    """Camera-frame normals from the depth image: central
    differences of back-projected points (replaces the reference's
    6-lookup central-difference TSDF gradient, voxel_tsdf.cu:334-345).
    Returns [H, W, 3] camera-frame unit normals (0 where invalid)."""
    H, W = depth.shape
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    X = (u - cam.cx) / cam.fx * depth
    Y = (v - cam.cy) / cam.fy * depth
    P = jnp.stack([X, Y, depth], axis=-1)  # [H, W, 3]

    def shift(a, du, dv):
        return jnp.roll(a, shift=(-dv, -du), axis=(0, 1))

    ok = hit
    okr, okl = shift(ok, 1, 0), shift(ok, -1, 0)
    okd, oku = shift(ok, 0, 1), shift(ok, 0, -1)
    dPdu = shift(P, 1, 0) - shift(P, -1, 0)
    dPdv = shift(P, 0, 1) - shift(P, 0, -1)
    n = jnp.cross(dPdv, dPdu)
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(nn, 1e-9)
    # orient toward the camera (reference flips by ray direction too)
    flip = jnp.sum(n * P, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    valid = (ok & okr & okl & okd & oku)[..., None]
    return jnp.where(valid, n, 0.0)


def raycast(
    m: VoxelMap,
    cam: PinholeCamera,
    cam_T_world: SE3,
    cfg: TsdfConfig,
    shell: float = 0.5,
    splats_per_block: int = 128,
) -> dict:
    """Render the map from a virtual camera by TSDF splatting.

    Returns dict with 'depth' [H,W] (z-depth, 0 = miss), 'rgba' [H,W,4]
    (uint8-range float, shaded + semantic overlay), 'normal' [H,W,3]
    (camera-frame), 'hit' [H,W] bool.
    """
    H, W = cam.height, cam.width
    n_pix = H * W
    world_T_cam = cam_T_world.inverse()

    vis_idx, vis_mask, _count = visible_blocks(m, cam, cam_T_world, cfg)

    # voxel centers of visible blocks, world frame [V, 512, 3]
    base = unpack_block_coords(m.block_key[vis_idx])  # [V, 3]
    offs = voxel_offsets()  # [512, 3]
    pts = (
        base[:, None, :].astype(jnp.float32) * BLOCK_LEN
        + offs[None].astype(jnp.float32)
        + 0.5
    ) * cfg.voxel_size

    q = cam_T_world.apply(pts)  # [V, 512, 3] camera frame
    uv, z = cam.project(q)
    r = jnp.linalg.norm(q, axis=-1)
    d2r = r / jnp.maximum(z, 1e-9)  # range per unit depth

    tsdf = m.tsdf[vis_idx]  # [V, 512] fast row gathers
    weight = m.weight[vis_idx]
    rgb = m.rgb[vis_idx]  # [V, 512, 3]
    prob = m.prob[vis_idx]

    # TSDF-corrected surface depth along this pixel's ray
    z_surf = z + tsdf * cfg.truncation / d2r

    ui = jnp.round(uv[..., 0]).astype(jnp.int32)
    vi = jnp.round(uv[..., 1]).astype(jnp.int32)
    valid = (
        vis_mask[:, None]
        & (weight >= cfg.raycast_min_weight)
        & (jnp.abs(tsdf) < shell)
        & (z > 0.0)
        & (z_surf > cfg.min_depth)
        & (z_surf <= cfg.max_depth)
        & (ui >= 0)
        & (ui < W)
        & (vi >= 0)
        & (vi < H)
    ).reshape(-1)
    pix_all = (vi * W + jnp.clip(ui, 0, W - 1)).reshape(-1)

    # compact valid splats before z-buffering: scatter cost scales with
    # the INPUT element count, and ~92% of voxels fail the shell/weight/
    # frustum gates (measured 638k valid of 8.4M at bench scale). A
    # GLOBAL compaction scatter over the 8.4M candidates was itself the
    # hottest stage (82 ms); instead each block compacts its own 512
    # voxels to K=`splats_per_block` slots with a one-hot matmul — a
    # [V,512]x[V,512,K] einsum the MXU does in ~1 ms — compacting only
    # the flat SPLAT INDEX (f32-exact: indices < 2^24). Every other
    # channel arrives by gathering through it at the [V*K] size, so the
    # z-buffer scatters shrink 4-8x. Per-block overflow beyond K is
    # counted, never silent.
    V = vis_idx.shape[0]
    K = splats_per_block
    valid_vb = valid.reshape(V, 512)
    rank = jnp.cumsum(valid_vb.astype(jnp.int32), axis=1) - 1  # [V,512]
    slot = jnp.where(valid_vb & (rank < K), rank, K)
    n_dropped = jnp.sum(
        jnp.maximum(rank[:, -1] + 1 - K, 0), dtype=jnp.int32
    )
    oh = jax.nn.one_hot(slot, K, dtype=jnp.float32)  # [V,512,K]
    sidx_f = (
        jnp.arange(V * 512, dtype=jnp.float32).reshape(V, 512)
    )
    src_f = jnp.einsum(
        "vs,vsk->vk", sidx_f + 1.0, oh,
        precision=jax.lax.Precision.HIGHEST,
    )  # [V,K]; 0 = empty slot
    src = src_f.reshape(-1).astype(jnp.int32) - 1
    pad_ok = src >= 0
    srcc = jnp.maximum(src, 0)

    pix = jnp.where(pad_ok, pix_all[srcc], n_pix)
    z_flat = jnp.where(pad_ok, z_surf.reshape(-1)[srcc], jnp.inf)

    depth_min = (
        jnp.full((n_pix,), jnp.inf, jnp.float32)
        .at[pix]
        .min(z_flat, mode="drop")
    )
    hit = jnp.isfinite(depth_min)
    depth = jnp.where(hit, depth_min, 0.0)

    # attribute resolve: the splats that WON the z-buffer (within a
    # 0.2 mm tie band) scatter their packed (r,g,b,prob) bytes with one
    # int32 scatter-max — winner-take-nearest without the two extra
    # packed scatter-min passes of the previous design
    is_winner = pad_ok & (z_flat <= depth_min[pix] * (1.0 + 1e-4))

    def attr8(a):
        return jnp.clip(
            jnp.where(pad_ok, a.reshape(-1)[srcc], 0.0), 0, 255
        ).astype(jnp.int32)

    # red keeps 7 bits so the packed key stays non-negative in int32
    # (a 255<<24 key flips the sign bit and loses to 0 in scatter-max)
    packed = (
        ((attr8(rgb[..., 0]) >> 1) << 24)
        | (attr8(rgb[..., 1]) << 16)
        | (attr8(rgb[..., 2]) << 8)
        | attr8(prob * 255.0)
    )
    won = (
        jnp.zeros((n_pix,), jnp.int32)
        .at[jnp.where(is_winner, pix, n_pix)]
        .max(packed, mode="drop")
    )
    won = jnp.where(hit, won, 0)
    red = (((won >> 24) & 0x7F) << 1).astype(jnp.float32)
    green = ((won >> 16) & 0xFF).astype(jnp.float32)
    blue = ((won >> 8) & 0xFF).astype(jnp.float32)
    pr = (won & 0xFF).astype(jnp.float32) / 255.0

    depth_img = depth.reshape(H, W)
    hit_img = hit.reshape(H, W)
    normal = _screen_space_normals(depth_img, hit_img, cam)

    # diffuse shading + semantic red-alpha overlay (voxel_tsdf.cu:346-360)
    u = jnp.arange(W, dtype=jnp.float32)[None, :].repeat(H, 0)
    v = jnp.arange(H, dtype=jnp.float32)[:, None].repeat(W, 1)
    dirs = jnp.stack(
        [(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, jnp.ones((H, W))],
        axis=-1,
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    diffuse = jnp.abs(jnp.sum(normal * dirs, axis=-1))
    # flat fallback where normals are unavailable (isolated splats)
    diffuse = jnp.where(hit_img & (diffuse == 0), 1.0, diffuse)

    color = jnp.stack(
        [red.reshape(H, W), green.reshape(H, W), blue.reshape(H, W)], axis=-1
    )
    shaded = color * diffuse[..., None]
    alpha = jnp.clip((pr.reshape(H, W) - 0.5) * 2.0, 0.0, 1.0)[..., None]
    red_col = jnp.array([255.0, 0.0, 0.0])
    overlaid = shaded * (1 - alpha) + red_col * alpha

    hitf = hit_img.astype(jnp.float32)[..., None]
    rgba = jnp.concatenate([overlaid * hitf, hitf * 255.0], axis=-1)

    return {
        "depth": depth_img,
        "rgba": rgba,
        "normal": normal * hitf,
        "hit": hit_img,
        # splats beyond the compaction capacity (0 in healthy renders);
        # nonzero means arbitrary pool-order holes — raise s_cap
        "dropped_splats": n_dropped,
    }
