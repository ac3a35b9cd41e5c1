"""Brute-force exact K-NN scan — the ground-truth oracle.

Equivalent of ``src/linear_search.cc:39-64`` (fetch every code, XOR+popcount,
priority-queue top-k), re-cast as a chunked batched device scan. Ties at the
kth distance resolve by ascending id (deterministic; the reference's heap is
insertion-order-dependent there, so recall comparisons are done on distance
multisets — see tests/test_parity.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from verticut_tpu.ops import hamming


def linear_search(queries, db, k: int, method: str = "auto",
                  chunk: int = 65536):
    """Exact top-k: returns ``(dists int32[Q, k], ids int32[Q, k])``
    ascending by (dist, id).

    method: "auto" picks the MXU ±1-GEMM formulation for large batches on
    TPU (the VPU popcount scan materializes a [Q, chunk, W] intermediate —
    ~50x slower at Q in the thousands) and popcount otherwise; both exact
    (distances ≤ bits are integers exactly representable in bf16 dots).
    """
    queries = jnp.asarray(queries, jnp.uint32)
    db = jnp.asarray(db, jnp.uint32)
    chunk = min(chunk, max(db.shape[0], 8))
    if method == "auto":
        import jax
        on_tpu = jax.devices()[0].platform == "tpu"
        method = ("blockmin"
                  if on_tpu and queries.shape[0] >= 256 else "popcount")
    from verticut_tpu.utils.retry import with_compile_retry
    if method == "blockmin":
        # narrower blocks at large k (the rescore gathers k blocks/query),
        # and slice the query batch so the [Q, k, block, W] rescore buffer
        # stays bounded — at (q=8192, k=500, block=512) it is 33 GB and
        # OOMs the chip (observed in the r3 oracle drive)
        block = 512 if k <= 32 else 128
        per_q = max(1, k * block * db.shape[1] * 4)
        max_q = max(256, (1 << 31) // per_q)
        nq = queries.shape[0]
        if nq > max_q:
            parts = [with_compile_retry(
                lambda lo=lo: hamming.scan_blockmin(
                    queries[lo:lo + max_q], db, k,
                    chunk=max(chunk, 512 * 8), block=block))
                for lo in range(0, nq, max_q)]
            return (jnp.concatenate([p[0] for p in parts]),
                    jnp.concatenate([p[1] for p in parts]))
        return with_compile_retry(
            lambda: hamming.scan_blockmin(queries, db, k,
                                          chunk=max(chunk, 512 * 8),
                                          block=block))
    if method == "popcount":
        return with_compile_retry(
            lambda: hamming.scan_popcount(queries, db, k, chunk=chunk))
    elif method == "matmul":
        return hamming.scan_matmul(queries, db, k, chunk=chunk)
    elif method == "pallas":
        import jax
        interp = jax.devices()[0].platform != "tpu"
        return hamming.scan_pallas(queries, db, k, chunk=max(chunk, 512),
                                   interpret=interp)
    raise ValueError(f"unknown method {method!r}")
