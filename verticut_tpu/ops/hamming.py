"""Batched Hamming-distance scan engines.

Two formulations of the brute-force scan (``src/linear_search.cc:39-64``):

* ``scan_popcount`` — XOR + ``lax.population_count`` on the VPU over packed
  uint32 words (4 words per 128-bit code). HBM-light: 16 B per DB code.
* ``scan_matmul`` — unpack codes to ±1 vectors and hit the MXU with a
  ``[Q, B] x [B, N]`` GEMM (``dist = (B - dot)/2``). Compute-optimal for
  large query batches; 128-bit codes match the 128-wide systolic array.

Both chunk the DB along N inside ``lax.scan`` (static shapes; running
bounded top-k carried through the scan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from verticut_tpu import codes as codes_lib
from verticut_tpu.ops import topk


def _merge(pool, cd, ci, n, bits):
    if topk.can_pack(n - 1, bits):
        return topk.merge_topk_packed(pool[0], pool[1], cd, ci)
    return topk.merge_topk(pool[0], pool[1], cd, ci)


def _pad_db(db: jax.Array, chunk: int):
    n = db.shape[0]
    n_pad = (-n) % chunk
    if n_pad:
        db = jnp.pad(db, ((0, n_pad), (0, 0)))
    return db, n


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def scan_popcount(queries: jax.Array, db: jax.Array, k: int,
                  chunk: int = 65536):
    """Exact top-k via popcount scan. ``[Q, W], [N, W] -> ([Q,k], [Q,k])``."""
    db_p, n = _pad_db(db, chunk)
    n_chunks = db_p.shape[0] // chunk
    db_c = db_p.reshape(n_chunks, chunk, db.shape[-1])
    pool = topk.empty_pool(queries.shape[0], k)

    def body(pool, args):
        chunk_codes, base = args
        d = codes_lib.pairwise_hamming(queries, chunk_codes)
        cd, ci = topk.chunk_topk_affine(d, base, k, n - base)
        return _merge(pool, cd, ci, n, db.shape[-1] * 32), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (pd, pi), _ = jax.lax.scan(body, pool, (db_c, bases))
    return pd, pi


@functools.partial(jax.jit, static_argnames=("k", "chunk", "interpret"))
def scan_pallas(queries: jax.Array, db: jax.Array, k: int,
                chunk: int = 131072, interpret: bool = False):
    """Exact top-k via the fused Pallas unpack+MXU kernel
    (ops/pallas/linear_scan.py): packed codes never leave HBM unexpanded."""
    from verticut_tpu.ops.pallas import pallas_pairwise_hamming
    q_tile, t_tile = 256, 512
    q, w = queries.shape
    qp = (-q) % q_tile
    if qp:
        queries = jnp.pad(queries, ((0, qp), (0, 0)))
    chunk = max(t_tile, (chunk // t_tile) * t_tile)
    db_p, n = _pad_db(db, chunk)
    n_chunks = db_p.shape[0] // chunk
    db_c = db_p.reshape(n_chunks, chunk, w)
    pool = topk.empty_pool(queries.shape[0], k)

    def body(pool, args):
        chunk_codes, base = args
        d = pallas_pairwise_hamming(queries, chunk_codes, q_tile=q_tile,
                                    t_tile=t_tile, interpret=interpret)
        cd, ci = topk.chunk_topk_affine(d, base, k, n - base)
        return _merge(pool, cd, ci, n, 32 * w), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (pd, pi), _ = jax.lax.scan(body, pool, (db_c, bases))
    return pd[:q], pi[:q]


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def scan_matmul(queries: jax.Array, db: jax.Array, k: int,
                chunk: int = 32768):
    """Exact top-k via the MXU ±1 GEMM formulation.

    Unpacks each DB chunk to bf16 ±1 on the fly (HBM reads stay packed; the
    unpack fuses into the producer side of the GEMM under XLA).
    """
    bits = db.shape[-1] * 32
    qpm = codes_lib.unpack_bits_pm1(queries)          # [Q, B]
    db_p, n = _pad_db(db, chunk)
    n_chunks = db_p.shape[0] // chunk
    db_c = db_p.reshape(n_chunks, chunk, db.shape[-1])
    pool = topk.empty_pool(queries.shape[0], k)

    def body(pool, args):
        chunk_codes, base = args
        dpm = codes_lib.unpack_bits_pm1(chunk_codes)  # [T, B]
        dot = jax.lax.dot_general(
            qpm, dpm, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        d = ((bits - dot) * 0.5).astype(jnp.int32)
        cd, ci = topk.chunk_topk_affine(d, base, k, n - base)
        return _merge(pool, cd, ci, n, bits), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (pd, pi), _ = jax.lax.scan(body, pool, (db_c, bases))
    return pd, pi
