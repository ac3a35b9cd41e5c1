#!/usr/bin/env python
"""KV store load/latency harness — the ``Pilaf/loadtest.cc`` +
``ploadtest/ploadtest.cc`` analog: mixed get/put workloads against any
backend, with latency percentiles and a middle-window throughput figure
(the reference measures the middle fifth of ops to exclude warmup,
``dht-test.cc:343-344``)."""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backend", default="dht",
                   choices=["dht", "memory", "pilaf", "memcached", "redis"])
    p.add_argument("--n_shards", type=int, default=1)
    p.add_argument("-n", "--ops", type=int, default=100_000)
    p.add_argument("--get_ratio", type=float, default=0.9)
    p.add_argument("--key_space", type=int, default=10_000)
    p.add_argument("--val_len", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import numpy as np
    from verticut_tpu.kv import make_store

    rng = np.random.default_rng(args.seed)
    store = make_store(args.backend, n_shards=args.n_shards)
    val = bytes(rng.integers(0, 256, args.val_len, dtype=np.uint8))

    # preload
    for i in range(args.key_space):
        store.put(f"key-{i}".encode(), val)

    keys = [f"key-{int(k)}".encode()
            for k in rng.integers(0, args.key_space, args.ops)]
    is_get = rng.random(args.ops) < args.get_ratio
    lat = np.empty(args.ops)
    t_all0 = time.perf_counter()
    for i, key in enumerate(keys):
        t0 = time.perf_counter()
        if is_get[i]:
            store.get(key)
        else:
            store.put(key, val)
        lat[i] = time.perf_counter() - t0
    wall = time.perf_counter() - t_all0

    # middle-fifth window throughput
    lo, hi = 2 * args.ops // 5, 3 * args.ops // 5
    mid_s = lat[lo:hi].sum()
    print(f"backend={args.backend} shards={args.n_shards} ops={args.ops} "
          f"get_ratio={args.get_ratio}")
    print(f"throughput: {args.ops/wall:,.0f} ops/s "
          f"(middle fifth: {(hi-lo)/mid_s:,.0f} ops/s)")
    for q in (50, 90, 99, 99.9):
        print(f"p{q}: {np.percentile(lat, q)*1e6:.2f} us")
    if hasattr(store, "stats"):
        print("stats:", store.stats())
    store.close()


if __name__ == "__main__":
    main()
