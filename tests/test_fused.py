"""Fused single-dispatch driver == adaptive loop driver, bit for bit."""

import numpy as np
import pytest

from verticut_tpu import codes
from verticut_tpu.config import MIHConfig, SearchConfig
from verticut_tpu.index import build_index
from verticut_tpu.search import mih_search


@pytest.mark.parametrize("n,n_tables,k,approx", [
    (500, 4, 10, False),
    (400, 16, 5, False),
    (600, 4, 5, True),
])
def test_fused_matches_loop(n, n_tables, k, approx):
    rng = np.random.default_rng(n + k)
    packed = codes.pack_bytes(
        rng.integers(0, 256, size=(n, 16), dtype=np.uint8))
    idx = build_index(packed, MIHConfig(bits=128, n_tables=n_tables))
    kw = dict(knn=k, approximate=approx, approximate_factor=4,
              candidate_cap=1024)
    q = packed[:32]
    r_fused = mih_search(idx, q, SearchConfig(fused=True, **kw))
    r_loop = mih_search(idx, q, SearchConfig(fused=False, **kw))
    assert np.array_equal(r_fused.dists, r_loop.dists)
    assert np.array_equal(r_fused.ids, r_loop.ids)
    assert np.array_equal(r_fused.radius, r_loop.radius)
    assert np.array_equal(r_fused.n_probes, r_loop.n_probes)


def test_fused_stage_overflow_falls_back():
    """If every query stays active past a stage budget, the fused driver
    must detect it and fall back to the loop driver (still exact)."""
    rng = np.random.default_rng(0)
    packed = codes.pack_bytes(
        rng.integers(0, 256, size=(800, 16), dtype=np.uint8))
    idx = build_index(packed, MIHConfig(bits=128, n_tables=16))
    # random data, k=20: nothing finishes early -> active set exceeds
    # nq>>3 after stage 0 -> compact_ovf -> loop fallback
    from verticut_tpu.search import linear_search
    q = packed[:128]
    res = mih_search(idx, q, SearchConfig(fused=True, knn=20,
                                          candidate_cap=2048))
    ld, _ = linear_search(q, packed, 20)
    assert np.array_equal(np.sort(res.dists, -1), np.sort(np.asarray(ld), -1))
