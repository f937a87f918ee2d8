"""Pallas TPU kernel: fused TSDF integrate + carve decision.

The hot kernel of the dense-mapping path (the analog of the reference's
`tsdf_integrate_kernel`, `/root/reference/utils/tsdf/voxel_tsdf.cu:170-251`,
one CUDA thread per voxel). The XLA formulation resolves each voxel's
pixel sample with two one-hot einsums whose [V, 512, 24, 6] intermediate
round-trips ~5 GB of HBM per frame; this kernel keeps the whole resolve
+ fusion dataflow in VMEM:

  per grid step (G blocks at once):
    - the block's pre-gathered image tile arrives as [6, 256] (6 sensor
      channels x 16x16 mip-tile pixels, built by `map/voxel_map.py`);
    - each of the 512 voxels selects its tile pixel with a one-hot
      [512, 256] matmul on the MXU (exact: one 1.0 per row,
      Precision.HIGHEST so f32 payloads pass through unrounded);
    - the reference's fusion math runs on the VPU: range-scaled SDF,
      weighted tsdf/rgb running averages (weight `(1-d/max_d)*4`,
      clamped), log-odds Bayesian semantic update;
    - the space-carving min-reduction over |tsdf| (the reference's
      shared-memory reduction, `voxel_tsdf.cu:253-276`) falls out for
      free as a per-block min of the freshly computed values.

Inputs/outputs are dense [V, ...] arrays over the compacted visible
set — pool gather/scatter stays outside the kernel as whole-block row
ops (fast), so the kernel needs no scalar-prefetch indexing and no
aliasing hazards. Falls back to the einsum path off-TPU
(`map/voxel_map.py` keeps it as the reference implementation; equality
is tested in tests/test_tpu_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_PIX = 256  # 16 x 16 mip tile, flattened (dv * 16 + du)
G = 16  # visible blocks per grid step


def _fuse_kernel(
    patch_ref,  # [G, 6, 256] f32: depth | r | g | b | ht | lt tile
    idxt_ref,  # [G, 512] i32: flat tile-pixel index per voxel
    z_ref,  # [G, 512] f32: voxel depth in camera frame
    d2r_ref,  # [G, 512] f32: depth-to-range scale at the sampled pixel
    gate_ref,  # [G, 512] f32: 1.0 where the voxel may update
    told_ref,  # [G, 512] f32
    wold_ref,  # [G, 512] f32
    pold_ref,  # [G, 512] f32
    cold_ref,  # [G, 3, 512] f32 (channel-major rgb)
    tnew_ref,
    wnew_ref,
    pnew_ref,
    cnew_ref,
    min_ref,  # [G, 1] f32: min |tsdf| after update (carve decision)
    *,
    truncation: float,
    max_depth: float,
    max_weight: float,
):
    # One [G, 512] -> [512, G] block transpose up front puts the 512
    # voxels on SUBLANES, so slicing one block's indices below is a free
    # lane slice. (Slicing idx[g] out of the [G, 512] layout would give
    # a lane vector and force a relayout per block — 16 per grid step.)
    idx_t = idxt_ref[:].T  # [512, G]
    col = jax.lax.broadcasted_iota(jnp.int32, (512, TILE_PIX), 1)
    vals_g, d_g = [], []
    for g in range(G):
        ohf = (idx_t[:, g][:, None] == col).astype(jnp.float32)  # [512, 256]
        # Split resolve: GEOMETRY stays bit-exact, APPEARANCE goes bf16.
        # The depth channel gathers via one [512, 256] x [256, 1]
        # HIGHEST-precision matmul (exactly one 1.0 per one-hot row ->
        # a bit-exact f32 gather), so the sdf, the update gate (whose
        # truncation-boundary compare must match the einsum path
        # exactly), tsdf and weight are identical to full-f32. The five
        # color/semantic channels resolve in ONE bf16 pass (inputs are
        # 8-bit-scale colors and probabilities; bf16 keeps them to 0.2%
        # relative — tests/test_tpu_kernels.py bounds the fields).
        # HIGHEST on all 6 channels ran 3 bf16 passes over the full
        # [6, 256] x [512, 256] product and was ~2x slower end-to-end.
        oh = ohf.astype(jnp.bfloat16)
        p = patch_ref[g]
        d_g.append(
            jax.lax.dot_general(
                ohf,
                p[0:1],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )[:, 0]
        )  # [512]
        vals_g.append(
            jax.lax.dot_general(
                p[1:].astype(jnp.bfloat16),
                oh,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # [5, 512]
    vals = jnp.stack(vals_g)  # [G, 5, 512]: r g b ht lt

    d = jnp.stack(d_g)  # [G, 512]
    ht = vals[:, 3]
    lt = vals[:, 4]
    z = z_ref[:]
    d2r = d2r_ref[:]
    gate = gate_ref[:]
    t_old = told_ref[:]
    w_old = wold_ref[:]
    p_old = pold_ref[:]
    c_old = cold_ref[:]  # [G, 3, 512]

    sdf = d2r * (d - z)
    update = (
        (gate > 0.0)
        & (d > 1e-6)
        & (d <= max_depth)
        & (sdf > -truncation)
    )
    tsdf_obs = jnp.minimum(1.0, sdf / truncation)
    w_new = (1.0 - d / max_depth) * 4.0

    w_comb = w_old + w_new
    inv_w = 1.0 / jnp.maximum(w_comb, 1e-9)
    t_new = (t_old * w_old + tsdf_obs * w_new) * inv_w
    w_upd = jnp.minimum(w_comb, max_weight)

    p_c = jnp.clip(p_old, 1e-6, 1.0 - 1e-6)
    lo_old = jnp.log(p_c) - jnp.log1p(-p_c)
    lo_obs = jnp.log(jnp.clip(ht, 1e-6, 1.0)) - jnp.log(
        jnp.clip(lt, 1e-6, 1.0)
    )
    lo_new = (lo_old * w_old + lo_obs * w_new) * inv_w
    p_new = jax.nn.sigmoid(lo_new)

    t_out = jnp.where(update, t_new, t_old)
    tnew_ref[:] = t_out
    wnew_ref[:] = jnp.where(update, w_upd, w_old)
    pnew_ref[:] = jnp.where(update, p_new, p_old)

    c_new = (
        c_old * w_old[:, None, :] + vals[:, 0:3] * w_new[:, None, :]
    ) * inv_w[:, None, :]
    cnew_ref[:] = jnp.where(update[:, None, :], c_new, c_old)

    min_ref[:] = jnp.min(jnp.abs(t_out), axis=1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("truncation", "max_depth", "max_weight", "interpret"),
)
def tsdf_fuse_pallas(
    patch: jax.Array,  # [V, 6, 256] f32
    idx: jax.Array,  # [V, 512] i32
    z: jax.Array,  # [V, 512] f32
    d2r: jax.Array,  # [V, 512] f32
    gate: jax.Array,  # [V, 512] f32
    t_old: jax.Array,  # [V, 512] f32
    w_old: jax.Array,
    p_old: jax.Array,
    c_old: jax.Array,  # [V, 3, 512] f32
    truncation: float,
    max_depth: float,
    max_weight: float,
    interpret: bool = False,
):
    """Returns (t_new, w_new, p_new [V,512], c_new [V,3,512],
    min_abs_tsdf [V])."""
    V = idx.shape[0]
    assert V % G == 0, f"max_visible_blocks must be a multiple of {G}"
    grid = (V // G,)
    row = lambda i: (i, 0)
    row3 = lambda i: (i, 0, 0)
    kernel = functools.partial(
        _fuse_kernel,
        truncation=truncation,
        max_depth=max_depth,
        max_weight=max_weight,
    )
    t_new, w_new, p_new, c_new, minabs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, 6, TILE_PIX), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 512), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 512), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 512), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 512), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 512), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 512), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 512), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 3, 512), row3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, 512), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 512), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 512), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 3, 512), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((V, 512), jnp.float32),
            jax.ShapeDtypeStruct((V, 512), jnp.float32),
            jax.ShapeDtypeStruct((V, 512), jnp.float32),
            jax.ShapeDtypeStruct((V, 3, 512), jnp.float32),
            jax.ShapeDtypeStruct((V, 1), jnp.float32),
        ],
        interpret=interpret,
    )(patch, idx, z, d2r, gate, t_old, w_old, p_old, c_old)
    return t_new, w_new, p_new, c_new, minabs[:, 0]
