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
