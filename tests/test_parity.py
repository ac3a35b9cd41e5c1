"""Bit-level parity vs the clean-room numpy model of the C++ algorithm.

The model (tests/reference_model.py) replicates search_worker.cc semantics:
arrival-ordered dedup, strict-improvement bounded heap, per-radius stop
checks. Distance multisets of the returned k must match exactly — ties at
the boundary may swap ids (heap arrival order vs our (dist, id) order), but
the multiset is tie-invariant for both algorithms.

These tests disable the enumeration-vs-scan crossover (fallback_ratio=1e9)
to drive the true radius-enumeration path; small s_bits keep C(s, r)
tractable for the python model. The s_bits=32 production shape is covered
against the brute-force oracle in test_mih.py (the model cannot enumerate
C(32, r>8) in python).
"""

import numpy as np
import pytest

from verticut_tpu import codes
from verticut_tpu.config import MIHConfig, SearchConfig
from verticut_tpu.index import build_index
from verticut_tpu.search import mih_search
from tests.reference_model import RefMIH


def _setup(n, bits, seed):
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, size=(n, bits // 8), dtype=np.uint8)
    return raw, codes.pack_bytes(raw)


@pytest.mark.parametrize("bits,n_tables,n,k", [
    (32, 4, 200, 5),     # s_bits=8
    (64, 8, 300, 7),     # s_bits=8
    (64, 4, 120, 4),     # s_bits=16
])
def test_exact_parity_with_reference_model(bits, n_tables, n, k):
    raw, packed = _setup(n, bits, seed=bits + n)
    model = RefMIH(raw, n_tables)
    cfg = MIHConfig(bits=bits, n_tables=n_tables)
    idx = build_index(packed, cfg)
    scfg = SearchConfig(fused=False, knn=k, max_enum_radius=cfg.s_bits, candidate_cap=2048,
                        fallback_ratio=1e9)
    nq = 10
    res = mih_search(idx, packed[:nq], scfg)
    for qi in range(nq):
        md, mi = model.search(raw[qi], k)
        assert np.array_equal(np.sort(res.dists[qi]), np.sort(md)), qi


@pytest.mark.parametrize("bits,n_tables,n,k,factor", [
    (32, 4, 400, 3, 5),
    (64, 8, 400, 4, 4),
])
def test_approx_parity_with_reference_model(bits, n_tables, n, k, factor):
    raw, packed = _setup(n, bits, seed=99)
    model = RefMIH(raw, n_tables)
    cfg = MIHConfig(bits=bits, n_tables=n_tables)
    idx = build_index(packed, cfg)
    scfg = SearchConfig(fused=False, knn=k, approximate=True, approximate_factor=factor,
                        max_enum_radius=cfg.s_bits, candidate_cap=4096,
                        fallback_ratio=1e9)
    nq = 8
    res = mih_search(idx, packed[:nq], scfg)
    for qi in range(nq):
        md, mi = model.search(raw[qi], k, approximate=True, factor=factor)
        assert np.array_equal(np.sort(res.dists[qi][:len(md)]),
                              np.sort(md)), qi


def test_stop_rule_never_violated():
    """Engine must not stop before the MIH completeness rule permits."""
    raw, packed = _setup(250, 64, seed=5)
    cfg = MIHConfig(bits=64, n_tables=4)
    idx = build_index(packed, cfg)
    scfg = SearchConfig(fused=False, knn=4, max_enum_radius=cfg.s_bits, candidate_cap=2048,
                        fallback_ratio=1e9)
    res = mih_search(idx, packed[:10], scfg)
    for qi in range(10):
        kth = int(res.dists[qi, -1])
        r = int(res.radius[qi])
        assert kth <= (r + 1) * 4
