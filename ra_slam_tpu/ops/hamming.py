"""Pallas TPU kernel: dense Hamming-distance matrix over packed ORB
descriptors.

The matching path (`features/matching.py`) needs the full [Ka, Kb]
Hamming matrix every frame (tracking) and against the whole keyframe
database (loop retrieval). The matmul formulation unpacks each 256-bit
descriptor to 256 ±1 floats — 32x the memory traffic of the packed
words. This kernel computes XOR + popcount directly on the packed
uint32 lanes in VMEM, one [TA, TB] tile per grid step, accumulating
over the 8 descriptor words on the VPU (`population_count` lowers to
native TPU ops). Falls back to the jnp paths off-TPU.

Tiling: TA x TB = 256 x 256 int32 tiles (aligned to the 8x128 VPU
registers); inputs padded to tile multiples by the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_A = 256
TILE_B = 256


def _hamming_kernel(a_ref, bt_ref, out_ref):
    """a_ref [TA, 8] uint32, bt_ref [8, TB] uint32 (B transposed so the
    lane axis is the match axis) -> out_ref [TA, TB] int32."""
    a = a_ref[:]  # [TA, 8]
    bt = bt_ref[:]  # [8, TB]
    acc = jnp.zeros((TILE_A, TILE_B), jnp.int32)
    for w in range(a.shape[1]):  # static unroll over descriptor words
        x = jnp.bitwise_xor(a[:, w][:, None], bt[w, :][None, :])  # [TA, TB]
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc


def _pad_rows(x: jax.Array, mult: int, fill: int) -> jax.Array:
    n = x.shape[0]
    rem = (-n) % mult
    if rem == 0:
        return x
    pad = jnp.full((rem,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix_pallas(
    desc_a: jax.Array,  # [Ka, 8] uint32
    desc_b: jax.Array,  # [Kb, 8] uint32
    interpret: bool = False,
) -> jax.Array:
    """[Ka, Kb] int32 exact Hamming distances (Pallas TPU kernel)."""
    ka, kb = desc_a.shape[0], desc_b.shape[0]
    a = _pad_rows(desc_a, TILE_A, 0)
    bt = _pad_rows(desc_b, TILE_B, 0).T  # [8, Kb_pad]
    na, nb = a.shape[0] // TILE_A, bt.shape[1] // TILE_B

    out = pl.pallas_call(
        _hamming_kernel,
        grid=(na, nb),
        in_specs=[
            pl.BlockSpec((TILE_A, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_B), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_A, TILE_B), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((na * TILE_A, nb * TILE_B), jnp.int32),
        interpret=interpret,
    )(a, bt)
    return out[:ka, :kb]
