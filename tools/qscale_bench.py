"""Batch-size (Q) and pipeline-depth sweep for the fused driver.

VERDICT r4 #2: the pipelined wall per 8192-query batch exceeded the device
program time by ~13-35 ms — per-batch relay round trips + result-transfer
link contention. Two levers measured here on the real chip:

* Q per dispatch: one program over 2-4x the queries amortizes the fixed
  per-dispatch relay cost (and the program's fixed stage overheads).
* pipeline depth: more handles in flight hide longer host stalls.

Prints one JSON line with ms-per-8192-queries for each (k, Q, depth) cell
plus the bare program time per Q (back-to-back dispatch protocol, relay
round trips cancelled).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/qscale_bench.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--qs", type=int, nargs="+",
                    default=[8192, 16384, 32768])
    ap.add_argument("--ks", type=int, nargs="+", default=[10, 100])
    ap.add_argument("--depths", type=int, nargs="+", default=[4, 6])
    ap.add_argument("--batches", type=int, default=12,
                    help="pipelined batches per measurement")
    args = ap.parse_args()

    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from verticut_tpu import codes
    from verticut_tpu.config import MIHConfig, SearchConfig
    from verticut_tpu.index.build_native import build_index_native
    from verticut_tpu.search import (mih_search, mih_search_dispatch,
                                     mih_search_finalize)

    cfg = MIHConfig(bits=128, n_tables=4)
    rng = np.random.default_rng(0)
    log(f"qscale: building n={args.n}")
    packed = codes.clustered_codes(0, args.n, cfg.bits,
                                   n_clusters=args.n // 200, flip_p=0.02)
    index = build_index_native(packed, cfg)
    jax.block_until_ready(index.tables[-1].entry_ids)

    qmax = max(args.qs)
    sel = rng.integers(0, args.n, qmax)
    qraw = codes.unpack_to_bytes(packed[sel])
    flips = rng.integers(0, cfg.bits, (qmax, 3))
    for i in range(qmax):
        for b in flips[i]:
            qraw[i, b // 8] ^= 1 << (b % 8)
    all_q = jnp.asarray(codes.pack_bytes(qraw))

    results = {}
    for k in args.ks:
        scfg = SearchConfig(knn=k, candidate_cap=8192, max_enum_radius=5)
        for q in args.qs:
            queries = all_q[:q]
            try:
                t0 = time.time()
                mih_search(index, queries, scfg)  # warm + compile
                log(f"qscale: k={k} q={q} warm {time.time()-t0:.1f}s")
                # bare program: R back-to-back dispatches, one end sync
                R = 6
                h = mih_search_dispatch(index, queries, scfg)
                mih_search_finalize(h)
                t0 = time.time()
                hs = [mih_search_dispatch(index, queries, scfg)
                      for _ in range(R)]
                t1 = time.time()
                for h in hs:
                    mih_search_finalize(h)
                t2 = time.time()
                prog = (t2 - t1) / R  # device-bound tail per program
                results[f"k{k} q{q} prog_per8192_ms"] = round(
                    prog * 1000 * 8192 / q, 2)
                for depth in args.depths:
                    n_b = max(args.batches, depth + 2)
                    best = None
                    for _ in range(2):
                        t0 = time.time()
                        window = [mih_search_dispatch(index, queries, scfg)
                                  for _ in range(depth)]
                        for _ in range(n_b - depth):
                            assert mih_search_finalize(window.pop(0))
                            window.append(
                                mih_search_dispatch(index, queries, scfg))
                        while window:
                            assert mih_search_finalize(window.pop(0))
                        dt = (time.time() - t0) / n_b
                        best = dt if best is None else min(best, dt)
                    ms = best * 1000 * 8192 / q
                    results[f"k{k} q{q} d{depth} ms_per8192"] = round(ms, 2)
                    log(f"qscale: k={k} q={q} depth={depth} "
                        f"{ms:.1f} ms/8192q = {8192/ms*1000:.0f} QPS")
            except Exception as e:  # noqa: BLE001 — record and continue
                log(f"qscale: k={k} q={q} FAILED {e}")
                results[f"k{k} q{q} error"] = str(e).splitlines()[0][:160]
    print(json.dumps({"metric": "qscale", "n": args.n, "ms": results}))


if __name__ == "__main__":
    main()
