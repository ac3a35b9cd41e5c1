"""Approx-mode early-stop semantics at PRODUCTION shape (128-bit codes,
4 tables, s_bits=32, range directory) — VERDICT r3 weak #7.

The s_bits<=16 parity tests compare against the C++ bucket-enumeration
order (tests/reference_model.py). At production shape the engine probes
prefix RANGES (index/directory.RangeDirectory), so its per-radius
candidate set is the documented superset: all rows whose per-table
PREFIX distance (top ``pbits`` of the substring) is <= r for some table
(reference stop rule: search_worker.cc:136-137 — pool of k*factor fills
at radius granularity). That makes approx results a deterministic
function of the prefix-distance sets, independently computable in numpy:

* stop radius r* = first r with |S_r| >= pool_size (S_r as above),
* result distances = first k of the sorted pool_size-smallest distance
  multiset over S_{r*} (strict-improvement eviction keeps tie choice
  order-dependent, but the distance MULTISET is order-free).

Checked for both the adaptive (fused=False) and fused drivers.
"""

import numpy as np
import jax.numpy as jnp

from verticut_tpu import codes
from verticut_tpu.config import MIHConfig, SearchConfig
from verticut_tpu.index import build_index
from verticut_tpu.search import mih_search


def _spec(raw_q, raw_db, pbits, s_bits, n_tables, k, pool_size, max_r):
    """Numpy executable spec of range-probe approx semantics (above)."""
    s_bytes = s_bits // 8
    shift = s_bits - pbits

    def subs(raw):
        # binaryToInt little-endian parity: codes.py substring order
        out = np.zeros((raw.shape[0], n_tables), np.uint64)
        for t in range(n_tables):
            chunk = raw[:, t * s_bytes:(t + 1) * s_bytes]
            val = np.zeros(raw.shape[0], np.uint64)
            for b in range(s_bytes):
                val |= chunk[:, b].astype(np.uint64) << np.uint64(8 * b)
            out[:, t] = val
        return out

    db_pref = (subs(raw_db) >> np.uint64(shift)).astype(np.uint32)
    q_pref = (subs(raw_q) >> np.uint64(shift)).astype(np.uint32)
    d_full = np.unpackbits(raw_q[:, None, :] ^ raw_db[None, :, :],
                           axis=-1).sum(-1).astype(np.int32)   # [Q, N]

    dists, radii = [], []
    for qi in range(raw_q.shape[0]):
        pd = np.zeros(raw_db.shape[0], np.int32) + 64
        for t in range(n_tables):
            x = db_pref[:, t] ^ q_pref[qi, t]
            pdt = np.zeros_like(pd)
            for b in range(pbits):
                pdt += ((x >> b) & 1).astype(np.int32)
            pd = np.minimum(pd, pdt)
        r = 0
        while r < max_r and np.count_nonzero(pd <= r) < pool_size:
            r += 1
        cand = np.sort(d_full[qi, pd <= r])[:pool_size]
        dists.append(cand[:k])
        radii.append(r)
    return np.asarray(dists), np.asarray(radii)


def test_approx_early_stop_production_shape():
    rng = np.random.default_rng(42)
    n, nq, k = 60_000, 48, 10
    cfg = MIHConfig(bits=128, n_tables=4)
    raw_db = rng.integers(0, 256, (n, 16), dtype=np.uint8)
    raw_q = raw_db[rng.integers(0, n, nq)].copy()
    for i in range(nq):                      # 2 bit flips per query
        for b in rng.integers(0, 128, 2):
            raw_q[i, b // 8] ^= np.uint8(1 << (b % 8))
    packed = codes.pack_bytes(raw_db)
    index = build_index(jnp.asarray(packed), cfg, directory="range")
    pbits = index.tables[0].directory.pbits
    q = jnp.asarray(codes.pack_bytes(raw_q))

    scfg = dict(knn=k, approximate=True, candidate_cap=8192)
    pool = k * SearchConfig(**scfg).approximate_factor
    want_d, want_r = _spec(raw_q, raw_db, pbits, cfg.s_bits, cfg.n_tables,
                           k, pool, SearchConfig(**scfg).max_enum_radius)
    assert (want_r <= 3).all(), "test corpus too sparse for the spec"

    for fused in (False, True):
        res = mih_search(index, q, SearchConfig(fused=fused, **scfg))
        assert np.array_equal(np.asarray(res.radius), want_r), fused
        assert np.array_equal(np.sort(np.asarray(res.dists), -1),
                              want_d), fused
