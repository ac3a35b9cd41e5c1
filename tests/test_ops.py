"""Enumeration masks and the dedup top-k pool merge."""

import math

import numpy as np
import jax.numpy as jnp

from verticut_tpu.ops import enumeration, topk


def test_flip_masks_counts_and_popcount():
    for s_bits in (8, 16, 32):
        for r in range(0, min(s_bits, 5) + 1):
            masks = enumeration.flip_masks(s_bits, r)
            assert len(masks) == math.comb(s_bits, r)
            assert len(np.unique(masks)) == len(masks)
            pop = np.array([bin(int(m)).count("1") for m in masks])
            assert (pop == r).all()
            assert (masks < (1 << s_bits) if s_bits < 32 else
                    np.ones_like(masks, bool)).all()


def test_ball_coverage():
    # All 2^8 values are within distance 8 of any center.
    total = sum(len(enumeration.flip_masks(8, r)) for r in range(9))
    assert total == 256


def test_merge_topk_dedup_matches_numpy():
    rng = np.random.default_rng(0)
    q, p, c = 5, 8, 23
    pd, pi = topk.empty_pool(q, p)
    seen = [dict() for _ in range(q)]
    for _ in range(4):  # several merge rounds
        cid = rng.integers(-1, 30, size=(q, c)).astype(np.int32)
        # distance is a pure function of id (as in real Hamming candidates)
        cdist = np.where(cid >= 0, (cid * 7 + 3) % 50, 0).astype(np.int32)
        pd, pi = topk.merge_topk_dedup(pd, pi,
                                       jnp.asarray(cdist), jnp.asarray(cid))
        for i in range(q):
            for j in range(c):
                if cid[i, j] >= 0:
                    seen[i][int(cid[i, j])] = int(cdist[i, j])
    pd, pi = np.asarray(pd), np.asarray(pi)
    for i in range(q):
        expect = sorted((d, idx) for idx, d in seen[i].items())[:p]
        got = [(int(pd[i, j]), int(pi[i, j])) for j in range(min(p, len(expect)))]
        assert got == expect
        # remaining slots invalid
        for j in range(len(expect), p):
            assert pi[i, j] == -1


def test_merge_topk_no_dup_path():
    pd, pi = topk.empty_pool(1, 4)
    cd = jnp.asarray([[5, 1, 3, 2, 4]], jnp.int32)
    ci = jnp.asarray([[10, 11, 12, 13, 14]], jnp.int32)
    pd, pi = topk.merge_topk(pd, pi, cd, ci)
    assert np.asarray(pd).tolist() == [[1, 2, 3, 4]]
    assert np.asarray(pi).tolist() == [[11, 13, 12, 14]]


def test_chunk_topk_ties_prefer_low_position():
    d = jnp.asarray([[3, 1, 1, 2]], jnp.int32)
    ids = jnp.asarray([[100, 101, 102, 103]], jnp.int32)
    cd, ci = topk.chunk_topk(d, ids, 2)
    assert np.asarray(cd).tolist() == [[1, 1]]
    assert np.asarray(ci).tolist() == [[101, 102]]


def test_kth_stats():
    pd = jnp.asarray([[1, 2, 0x7FFFFFFF]], jnp.int32)
    pi = jnp.asarray([[7, 8, -1]], jnp.int32)
    full, kth = topk.kth_stats(pd, pi, 2)
    assert bool(full[0]) and int(kth[0]) == 2
    full3, _ = topk.kth_stats(pd, pi, 3)
    assert not bool(full3[0])
