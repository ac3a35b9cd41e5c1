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


def test_pick_chunk_t_invariants():
    """The chunk picker must return a kernel-grid-aligned divisor of npad
    and honor the selection-slab budget whenever the grid unit allows."""
    from verticut_tpu.codes import SCAN_CHUNK, SCAN_PAD_UNIT
    from verticut_tpu.ops import hamming
    rng = np.random.default_rng(5)
    for _ in range(200):
        block = int(rng.choice([64, 128, 256, 512]))
        m = int(rng.integers(1, 40))
        npad = m * SCAN_PAD_UNIT
        if npad > SCAN_CHUNK:                      # transpose pad rule
            npad = -(-npad // SCAN_CHUNK) * SCAN_CHUNK
        q = int(rng.choice([1, 32, 1024, 8192]))
        ch = hamming._pick_chunk_t(npad, block, q)
        assert ch % (128 * block) == 0
        assert npad % ch == 0
        assert ch <= hamming.CHUNK_T
        # budget respected unless already violated at the minimum chunk
        if q * ((128 * 128) // block) <= hamming.TARGET_KEYS_T:
            half_ok = (ch == 128 * block
                       or q * (ch // block) <= hamming.TARGET_KEYS_T)
            assert half_ok


def test_transpose_scan_layout_roundtrip():
    from verticut_tpu.codes import SCAN_PAD_UNIT, transpose_scan_layout
    rng = np.random.default_rng(3)
    db = rng.integers(0, 2**32, size=(1000, 4), dtype=np.uint32)
    dt = np.asarray(transpose_scan_layout(jnp.asarray(db)))
    assert dt.shape == (8, SCAN_PAD_UNIT)
    assert np.array_equal(dt[:4, :1000], db.T)
    assert not dt[4:].any() and not dt[:, 1000:].any()


def test_pallas_blockmin_t_matches_reference():
    """Interpret-mode check of the transposed-db kernel: pad blocks and
    the straddling block report the min over zero pad rows (the CALLER
    masks/fixes them — scan_blockmin_t's contract), so compare against
    the raw-pad oracle. Covers both MXU operand paths (bf16 and int8 —
    exact for ±1 operands at these widths)."""
    from verticut_tpu.codes import transpose_scan_layout
    from verticut_tpu.ops.pallas import pallas_blockmin_t
    rng = np.random.default_rng(9)
    block, n = 512, 63321                        # npad=65536, rem=341
    raw_db = rng.integers(0, 256, size=(n, 16), dtype=np.uint8)
    raw_q = rng.integers(0, 256, size=(10, 16), dtype=np.uint8)
    q = jnp.asarray(codes.pack_bytes(raw_q))
    db = jnp.asarray(codes.pack_bytes(raw_db))
    db_t = transpose_scan_layout(db)
    npad = db_t.shape[1]
    raw_pad = np.zeros((npad, 16), np.uint8)
    raw_pad[:n] = raw_db
    expect = _blockmin_ref(raw_q, raw_pad, npad, npad, block)
    for acc in ("bf16", "int8"):
        got = np.asarray(pallas_blockmin_t(q, db_t, block=block, acc=acc,
                                           interpret=True))
        assert np.array_equal(got, expect), acc


def test_scan_blockmin_t_matches_oracle(monkeypatch):
    """End-to-end transposed blockmin scan vs brute force, forcing the
    multi-chunk folded selection (CHUNK_T shrunk to 4 chunks) and a
    straddling tail block."""
    from verticut_tpu import codes as codes_mod
    from verticut_tpu.codes import transpose_scan_layout
    from verticut_tpu.ops import hamming
    monkeypatch.setattr(hamming, "CHUNK_T", 16384)
    rng = np.random.default_rng(11)
    n, k = 64873, 9                              # npad=65536 -> 4 chunks
    raw_db = rng.integers(0, 256, size=(n, 16), dtype=np.uint8)
    raw_q = rng.integers(0, 256, size=(6, 16), dtype=np.uint8)
    # adversarial: a near-duplicate of query 0 just past the last chunk
    # boundary and inside the straddling tail block
    raw_db[49152 + 7] = raw_q[0]
    raw_db[n - 3] = raw_q[0] ^ np.uint8(1)
    q = jnp.asarray(codes.pack_bytes(raw_q))
    db = jnp.asarray(codes.pack_bytes(raw_db))
    db_t = transpose_scan_layout(db)
    ed, ei = ref.brute_force(raw_q, raw_db, k)
    for acc in ("bf16", "int8"):
        d1, i1 = hamming.scan_blockmin_t(q, db, db_t, k, block=128,
                                         acc=acc, interpret=True)
        assert np.array_equal(np.asarray(d1), ed), acc
        assert np.array_equal(np.asarray(i1), ei), acc


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


def test_pallas_blockmin_t2_matches_reference():
    """Interpret-mode check of the resident-queries transposed kernel
    (pallas_blockmin_t2): same caller contract as pallas_blockmin_t,
    both MXU operand paths, including a query count that needs sub_q
    padding."""
    from verticut_tpu.codes import transpose_scan_layout
    from verticut_tpu.ops.pallas import pallas_blockmin_t2
    rng = np.random.default_rng(11)
    block, n = 512, 63321                        # npad=65536, rem=341
    raw_db = rng.integers(0, 256, size=(n, 16), dtype=np.uint8)
    raw_q = rng.integers(0, 256, size=(70, 16), dtype=np.uint8)
    q = jnp.asarray(codes.pack_bytes(raw_q))
    db = jnp.asarray(codes.pack_bytes(raw_db))
    db_t = transpose_scan_layout(db)
    npad = db_t.shape[1]
    raw_pad = np.zeros((npad, 16), np.uint8)
    raw_pad[:n] = raw_db
    expect = _blockmin_ref(raw_q, raw_pad, npad, npad, block)
    for acc in ("bf16", "int8"):
        for sub_q in (32, 64):                   # 70 pads to 96 / 128
            got = np.asarray(pallas_blockmin_t2(
                q, db_t, block=block, sub_q=sub_q, acc=acc,
                interpret=True))
            assert np.array_equal(got, expect), (acc, sub_q)
