#!/usr/bin/env python
"""Brute-force ground-truth scan — the ``linear-search`` binary analog
(``src/linear_search.cc:39-64``, restored from its protobuf-benchmark
detour)."""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--binary_file", required=True)
    p.add_argument("--binary_bits", type=int, default=128)
    p.add_argument("-i", "--image_total", type=int, default=120_000_000)
    p.add_argument("-q", "--query_id", type=int, required=True)
    p.add_argument("-k", "--knn", type=int, default=10)
    p.add_argument("--method", choices=["popcount", "matmul"],
                   default="popcount")
    args = p.parse_args()

    from verticut_tpu import native
    from verticut_tpu.search import linear_search

    packed = native.read_code_file(args.binary_file, args.binary_bits // 8,
                                   args.image_total)
    q = packed[args.query_id:args.query_id + 1]
    t0 = time.time()
    d, i = linear_search(q, packed, args.knn, method=args.method)
    dt = time.time() - t0
    for idx, dist in zip(i[0], d[0]):
        if idx >= 0:
            print(f"{idx} : {dist}")
    print(f"scan of {packed.shape[0]} codes in {dt:.3f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
