"""Pallas TPU kernel: fused bit-unpack + MXU Hamming distance.

The ±1-GEMM formulation (``codes.hamming_via_matmul``) is MXU-optimal but
under plain XLA the unpacked bf16 operands (8x the packed bytes) round-trip
through HBM. This kernel keeps everything in VMEM: each grid step DMAs a
packed uint32 tile, unpacks to ±1 bf16 *in registers/VMEM*, and feeds the
128-wide systolic array directly — HBM traffic stays at 16 B/code.

dist = (B - dot(q_pm1, d_pm1)) / 2, B = 32*W (=128 for the canonical shape,
matching the MXU tile edge exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unpack_pm1(words: jax.Array, bits: int) -> jax.Array:
    """uint32[R, W] -> bf16 ±1 [R, 32W] (bit k of word w at column 32w+k).

    Built as a lane-dim concat of per-word broadcasts — Mosaic cannot
    reshape across the lane dimension ([R,W,32] -> [R,32W] fails to lower).
    """
    r, w = words.shape
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (r, 32), 1)
    parts = []
    for i in range(w):
        col = words[:, i:i + 1]                                  # [R, 1]
        parts.append((col >> shifts) & jnp.uint32(1))
    b = jnp.concatenate(parts, axis=1)                           # [R, 32W]
    return (2 * b.astype(jnp.int32) - 1).astype(jnp.bfloat16)


def _kernel(q_ref, d_ref, out_ref, *, bits):
    q = _unpack_pm1(q_ref[:], bits)            # [QT, B]
    d = _unpack_pm1(d_ref[:], bits)            # [TT, B]
    dot = jax.lax.dot_general(
        q, d, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)    # [QT, TT]
    out_ref[:] = ((bits - dot) * 0.5).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("q_tile", "t_tile", "interpret"))
def pallas_pairwise_hamming(queries: jax.Array, db: jax.Array,
                            q_tile: int = 256, t_tile: int = 512,
                            interpret: bool = False) -> jax.Array:
    """``uint32[Q, W] x uint32[N, W] -> int32[Q, N]`` Hamming distances.

    Q and N must be multiples of the tile sizes (callers pad; see
    ops/hamming.scan_pallas).
    """
    q, w = queries.shape
    n = db.shape[0]
    bits = 32 * w
    if q % q_tile or n % t_tile:
        raise ValueError(f"shape ({q},{n}) not padded to ({q_tile},{t_tile})")
    grid = (q // q_tile, n // t_tile)
    return pl.pallas_call(
        functools.partial(_kernel, bits=bits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, w), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_tile, w), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, t_tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * bits,
            bytes_accessed=(q * w + n * w) * 4 + q * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(queries, db)
