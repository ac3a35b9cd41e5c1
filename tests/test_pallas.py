"""Pallas kernels (interpret mode on CPU; real lowering exercised on TPU
by bench/tools — .claude/skills/verify recipe)."""

import numpy as np
import jax.numpy as jnp

from verticut_tpu import codes
from verticut_tpu.ops.pallas import pallas_pairwise_hamming
from verticut_tpu.search import linear_search
from tests import reference_model as ref


def test_pallas_pairwise_matches_reference():
    rng = np.random.default_rng(0)
    raw_q = rng.integers(0, 256, size=(256, 16), dtype=np.uint8)
    raw_d = rng.integers(0, 256, size=(512, 16), dtype=np.uint8)
    q = jnp.asarray(codes.pack_bytes(raw_q))
    d = jnp.asarray(codes.pack_bytes(raw_d))
    got = np.asarray(pallas_pairwise_hamming(q, d, interpret=True))
    expect = np.asarray(codes.pairwise_hamming(q, d))
    assert np.array_equal(got, expect)


def _blockmin_ref(raw_q, raw_db, n, npad, block):
    """numpy oracle: per-block Hamming minima, pad blocks -> bits+1."""
    bits = raw_db.shape[1] * 8
    d = np.unpackbits(raw_q[:, None, :] ^ raw_db[None, :n, :],
                      axis=-1).sum(-1).astype(np.int32)     # [Q, n]
    nb = npad // block
    out = np.full((raw_q.shape[0], nb), bits + 1, np.int32)
    for b in range((n + block - 1) // block):
        out[:, b] = d[:, b * block:min((b + 1) * block, n)].min(-1)
    return out


def test_pallas_blockmin_matches_reference():
    """Interpret-mode check of the fused blockmin kernel incl. the
    straddling-tail recompute, fully-padded blocks, and query padding
    (q=10 -> internal q_tile=256)."""
    from verticut_tpu.ops.pallas import pallas_blockmin
    rng = np.random.default_rng(7)
    block, npad, n = 16, 4096, 3796            # rem=4, 18 pad blocks
    raw_db = rng.integers(0, 256, size=(npad, 16), dtype=np.uint8)
    raw_db[n:] = 0
    raw_q = rng.integers(0, 256, size=(10, 16), dtype=np.uint8)
    q = jnp.asarray(codes.pack_bytes(raw_q))
    db = jnp.asarray(codes.pack_bytes(raw_db))
    got = np.asarray(pallas_blockmin(q, db, n, block=block, interpret=True))
    assert np.array_equal(got, _blockmin_ref(raw_q, raw_db, n, npad, block))


def test_pallas_blockmin_revisited_out_tile():
    """block=32 -> 64 output rows per sub-tile: two grid steps revisit one
    128-row output tile via the one-hot sublane select."""
    from verticut_tpu.ops.pallas import pallas_blockmin
    rng = np.random.default_rng(8)
    block, npad, n = 32, 4096, 3990            # rem=22
    raw_db = rng.integers(0, 256, size=(npad, 16), dtype=np.uint8)
    raw_db[n:] = 0
    raw_q = rng.integers(0, 256, size=(5, 16), dtype=np.uint8)
    q = jnp.asarray(codes.pack_bytes(raw_q))
    db = jnp.asarray(codes.pack_bytes(raw_db))
    got = np.asarray(pallas_blockmin(q, db, n, block=block, interpret=True))
    assert np.array_equal(got, _blockmin_ref(raw_q, raw_db, n, npad, block))


def test_pallas_scan_matches_oracle():
    rng = np.random.default_rng(1)
    raw_db = rng.integers(0, 256, size=(700, 16), dtype=np.uint8)
    raw_q = rng.integers(0, 256, size=(10, 16), dtype=np.uint8)
    db = codes.pack_bytes(raw_db)
    q = codes.pack_bytes(raw_q)
    d1, i1 = linear_search(q, db, 7, method="pallas")
    ed, ei = ref.brute_force(raw_q, raw_db, 7)
    assert np.array_equal(np.asarray(d1), ed)
    assert np.array_equal(np.asarray(i1), ei)
