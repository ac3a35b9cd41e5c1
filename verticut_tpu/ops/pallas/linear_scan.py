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


_SUB = 2048  # db rows per inner GEMM sub-tile


def _blockmin_kernel(q_ref, d_ref, out_ref, *, bits, block, n):
    """Fused unpack + MXU GEMM + per-block min epilogue.

    The [QT, SUB] distance tiles never leave VMEM: only the per-``block``
    minima are written back — HBM traffic is 16 B per db code + the tiny
    blk_min output, vs. the plain-XLA formulation writing and re-reading
    the full [Q, chunk] int32 slab per chunk (measured 232 ms for pass 1
    at Q=8192, N=1M on v5e; VERDICT r2 next-step #4).

    One grid step GEMMs one SUB-row db sub-tile (the dot tile is the only
    big VMEM buffer — an in-kernel loop gets fully unrolled by Mosaic and
    stacks every iteration's 2 MB dot tile, blowing the 16 MB scoped-VMEM
    limit). The 128-lane output tile (Mosaic-required width) is REVISITED
    by 128/bpt consecutive grid steps, each depositing its bpt block
    minima via a one-hot lane select (Mosaic has no dynamic lane-offset
    store). Per-block minima come from static lane slices (Mosaic cannot
    reshape across the lane dim)."""
    jb = pl.program_id(1)
    qt = q_ref.shape[0]
    bpt = _SUB // block                        # output lanes per sub-tile
    s = jb % (128 // bpt)                      # slot within the out tile
    lane = jax.lax.broadcasted_iota(jnp.int32, (qt, 128), 1)

    @pl.when(s == 0)
    def _():
        out_ref[:] = jnp.full((qt, 128), bits + 1, jnp.int32)

    q = _unpack_pm1(q_ref[:], bits)            # [QT, B]
    d = _unpack_pm1(d_ref[:], bits)            # [SUB, B]
    dot = jax.lax.dot_general(
        q, d, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)    # [QT, SUB]
    dist = (bits - dot) * 0.5
    # mask padding rows (their zero codes would alias real distances)
    pos = (jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1) + jb * _SUB)
    dist = jnp.where(pos < n, dist, jnp.float32(bits + 1))
    m = jnp.concatenate(
        [jnp.min(dist[:, b * block:(b + 1) * block], axis=1,
                 keepdims=True) for b in range(bpt)],
        axis=1).astype(jnp.int32)
    tiled = jnp.concatenate([m] * (128 // bpt), axis=1)  # lane l -> m[l%bpt]
    out_ref[:] = jnp.where(lane // bpt == s, tiled, out_ref[:])


@functools.partial(jax.jit,
                   static_argnames=("n", "block", "q_tile", "interpret"))
def pallas_blockmin(queries: jax.Array, db_padded: jax.Array, n: int,
                    block: int = 512, q_tile: int = 256,
                    interpret: bool = False) -> jax.Array:
    """``uint32[Q, W] x uint32[Npad, W] -> int32[Q, Npad/block]`` per-block
    Hamming-distance minima (pass 1 of the block-min pre-selection scan,
    ops/hamming.scan_blockmin). ``n`` = valid rows; padding rows report
    bits+1 (never selected). Q must be a multiple of q_tile and Npad of
    128·block (one output tile row per grid step)."""
    q, w = queries.shape
    npad = db_padded.shape[0]
    bits = 32 * w
    t_tile = 128 * block                       # db rows per OUTPUT tile
    if q % q_tile or npad % t_tile or _SUB % block:
        raise ValueError(f"({q},{npad},{block}) not padded to "
                         f"({q_tile},{t_tile})")
    spt = 128 // (_SUB // block)               # grid steps per out tile
    grid = (q // q_tile, npad // _SUB)
    return pl.pallas_call(
        functools.partial(_blockmin_kernel, bits=bits, block=block, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, w), lambda i, jb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB, w), lambda i, jb: (jb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, 128), lambda i, jb: (i, jb // spt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, npad // block), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * q * npad * bits,
            bytes_accessed=(q * w + npad * w) * 4 + q * (npad // block) * 4,
            transcendentals=0),
        interpret=interpret,
    )(queries, db_padded)


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
