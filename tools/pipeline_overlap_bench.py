"""Measure whether D2H result transfers overlap device compute through the
relay, and what pipeline depth / async-copy discipline recovers.

The fused-program ablation (profile_fused_ablate.py) showed the device
program is 28.7 ms (k=10) / 73.2 ms (k=100) per 8192-query batch, yet the
depth-2 dispatch/finalize protocol records 47 / 162 ms — the gap is the
result transfer + host dispatch not being hidden. Variants:

* depth2: bench.py's protocol (dispatch B(i+1), finalize B(i)).
* depth2+async: same, but fire ``copy_to_host_async()`` on the packed
  result at dispatch time so the D2H starts the moment the program ends.
* depth4[+async]: four handles in flight.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/pipeline_overlap_bench.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from verticut_tpu import codes
    from verticut_tpu.config import MIHConfig, SearchConfig
    from verticut_tpu.index.build_native import build_index_native
    from verticut_tpu.search import (mih_search, mih_search_dispatch,
                                     mih_search_finalize)

    n, q_batch = 1_000_000, 8192
    cfg = MIHConfig(bits=128, n_tables=4)
    rng = np.random.default_rng(0)
    print("overlap: building", file=sys.stderr, flush=True)
    packed = codes.clustered_codes(0, n, cfg.bits, n_clusters=n // 200,
                                   flip_p=0.02)
    index = build_index_native(packed, cfg)
    jax.block_until_ready(index.tables[-1].entry_ids)
    sel = rng.integers(0, n, q_batch)
    qraw = codes.unpack_to_bytes(packed[sel])
    flips = rng.integers(0, cfg.bits, (q_batch, 3))
    for i in range(q_batch):
        for b in flips[i]:
            qraw[i, b // 8] ^= 1 << (b % 8)
    queries = jnp.asarray(codes.pack_bytes(qraw))

    results = {}

    def run(k, depth, use_async, n_b=10):
        scfg = SearchConfig(knn=k, candidate_cap=8192, max_enum_radius=5)
        mih_search(index, queries, scfg)  # warm
        best = None
        for _ in range(3):
            t0 = time.time()
            window = []
            for _ in range(depth):
                h = mih_search_dispatch(index, queries, scfg)
                assert h is not None
                if use_async:
                    h.packed.copy_to_host_async()
                window.append(h)
            for _ in range(n_b - depth):
                assert mih_search_finalize(window.pop(0)) is not None
                h = mih_search_dispatch(index, queries, scfg)
                if use_async:
                    h.packed.copy_to_host_async()
                window.append(h)
            while window:
                assert mih_search_finalize(window.pop(0)) is not None
            best = min(best or 9e9, (time.time() - t0) / n_b)
        name = f"k{k} depth{depth}{'+async' if use_async else ''}"
        results[name] = round(best * 1e3, 1)
        print(f"  {name:24s} {best * 1e3:8.1f} ms/batch "
              f"({q_batch / best:,.0f} QPS)", file=sys.stderr, flush=True)

    # raw D2H rate probe: device_get of a ready 3.5 MB array
    x = jnp.arange(8192 * 107, dtype=jnp.uint32).reshape(8192, 107)
    jax.block_until_ready(x)
    ts = []
    for _ in range(5):
        t0 = time.time()
        jax.device_get(x)
        ts.append(time.time() - t0)
    results["d2h_3.5MB_ms"] = round(min(ts) * 1e3, 1)
    print(f"  d2h 3.5MB: {min(ts) * 1e3:.1f} ms "
          f"({3.5 / min(ts):.0f} MB/s)", file=sys.stderr, flush=True)

    for k in (10, 100):
        run(k, 2, False)
        run(k, 2, True)
        run(k, 4, False)
        run(k, 4, True)

    print(json.dumps({"metric": "pipeline_overlap", "ms": results}))


if __name__ == "__main__":
    main()
