#!/usr/bin/env python
"""Execute the compact (1B-scale) index layout on the REAL chip at 100M.

The 1B story has two halves: tools/aot_1b_proof.py shows the 8-device
programs compile and fit HBM; this bench shows the exact same layout and
device program (``build_sharded_compact`` + ``sharded_compact_search`` —
ids-only blocked rows + shared code array, per-device build) EXECUTING on
real TPU hardware at 100M, oracle-verified (VERDICT r4 #6). Mesh is
(table=1, shard=1, query=1): one device owning all four tables' shards,
exactly how each of 8 chips would hold its slice at 1B.

Protocol mirrors bench.py where the API allows: device-born clustered
corpus, 8192 perturbed-row queries, warm, then repeated timed batches
(each ``sharded_compact_search`` call hard-syncs through the relay — the
compact engine has no dispatch/finalize split, so the row reported is
single-batch latency, not a pipelined wall) + a 32-query oracle cell vs
the independent sharded linear scan.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/compact_chip_bench.py [N] [out.json]
"""

import json
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from verticut_tpu import codes
    from verticut_tpu.config import MIHConfig, SearchConfig
    from verticut_tpu.parallel import make_mesh
    from verticut_tpu.search.sharded import sharded_linear_search
    from verticut_tpu.search.sharded_compact import (build_sharded_compact,
                                                     sharded_compact_search)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_100M_COMPACT_r05.json"
    q_batch, k = 8192, 10
    cfg = MIHConfig(bits=128, n_tables=4)
    mesh = make_mesh(1, 1, 1)
    out = {"metric": "compact_chip_bench", "n": n, "q_batch": q_batch,
           "k": k, "mesh": {"table": 1, "shard": 1, "query": 1},
           "device": str(jax.devices()[0].device_kind)}
    log(f"compact: device {jax.devices()}")

    t0 = time.time()
    packed = codes.clustered_codes_device(0, n, cfg.bits,
                                          n_clusters=n // 200, flip_p=0.02)
    float(jnp.sum(packed[-1]))  # hard sync (relay)
    out["gen_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    index = build_sharded_compact(packed, cfg, mesh, slack=1.5)
    float(jnp.sum(index.idrows[-1]))
    out["build_s"] = round(time.time() - t0, 1)
    out["memory_stats"] = index.memory_stats()
    log(f"compact: gen {out['gen_s']}s build {out['build_s']}s "
        f"stats={out['memory_stats']}")

    # queries: perturb random db rows by 3 bit flips, on device
    rng = np.random.default_rng(0)
    sel = jnp.asarray(rng.integers(0, n, q_batch))
    pos = jnp.asarray(rng.integers(0, cfg.bits, (q_batch, 3)))
    rows = packed[sel]
    word = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cfg.n_words), 2)
    terms = jnp.where(pos[:, :, None] // 32 == word,
                      jnp.uint32(1) << (pos[:, :, None] % 32).astype(jnp.uint32),
                      jnp.uint32(0))
    queries = np.asarray(jax.device_get(rows ^ terms[:, 0] ^ terms[:, 1]
                                        ^ terms[:, 2]))

    scfg = SearchConfig(knn=k, candidate_cap=8192, max_enum_radius=5)
    t0 = time.time()
    res = sharded_compact_search(index, queries, scfg)
    out["warmup_s"] = round(time.time() - t0, 1)
    out["mean_radius"] = float(np.mean(res.radius))
    log(f"compact: warmup {out['warmup_s']}s mean_radius={out['mean_radius']}")
    assert (res.dists[:, 0] <= 3).all(), "planted neighbor missed"

    times = []
    for _ in range(4):
        t0 = time.time()
        res = sharded_compact_search(index, queries, scfg)
        times.append(time.time() - t0)
        log(f"compact: batch {times[-1]:.3f}s")
    out["batch_latency_s"] = round(min(times), 4)
    out["qps_single_batch"] = round(q_batch / min(times), 1)

    # oracle cell: independent sharded linear scan over the shared codes
    t0 = time.time()
    ld, _li = sharded_linear_search(mesh, index.codes, queries[:32], k,
                                    n_total=n)
    ld = np.sort(np.asarray(ld), -1)
    out["oracle_s"] = round(time.time() - t0, 1)
    out["oracle_queries"] = 32
    out["oracle_multiset_equal"] = bool(
        np.array_equal(ld, np.sort(res.dists[:32], -1)))
    out["ok"] = out["oracle_multiset_equal"]
    log(f"compact: oracle equal={out['oracle_multiset_equal']}")

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
