#!/usr/bin/env python
"""Paired approximate-vs-exact accuracy sweep — the ``accuracy-test`` binary
+ ``test_approximate_accuracy.py`` analog (``src/accuracy_test.cc:72-135``:
distance-sum ratio, inaccurate count, wall times; sweep k in {3,100,500,1000}
per ``src/test_approximate_accuracy.py:12``)."""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("-c", "--count", type=int, default=20,
                   help="queries per k (reference: 20 iters)")
    p.add_argument("--ks", default="3,100,500,1000")
    args = p.parse_args()

    import numpy as np
    from verticut_tpu.config import SearchConfig
    from verticut_tpu.index.mih import load_index
    from verticut_tpu.search import mih_search

    index = load_index(args.index)
    rng = np.random.default_rng(0)
    qids = rng.integers(0, index.n, args.count)
    queries = np.asarray(index.codes)[qids]

    for k in (int(x) for x in args.ks.split(",")):
        t0 = time.time()
        exact = mih_search(index, queries, SearchConfig(knn=k))
        t_exact = time.time() - t0
        t0 = time.time()
        approx = mih_search(index, queries,
                            SearchConfig(knn=k, approximate=True))
        t_approx = time.time() - t0

        # accuracy_test.cc metrics
        valid = exact.ids >= 0
        dist_ratio = float(
            (approx.dists * valid).sum() / max((exact.dists * valid).sum(), 1))
        max_exact = np.where(valid.any(-1), (exact.dists * valid).max(-1), 0)
        inaccurate = int(
            ((approx.dists > max_exact[:, None]) & (approx.ids >= 0)).sum())
        accuracy = 1.0 - inaccurate / max(int(valid.sum()), 1)
        print(json.dumps({
            "k": k, "queries": args.count,
            "distance_ratio": round(dist_ratio, 4),
            "inaccurate_count": inaccurate,
            "accuracy": round(accuracy, 4),
            "exact_s": round(t_exact, 3), "approx_s": round(t_approx, 3),
            "mean_radius_exact": float(exact.radius.mean()),
            "mean_radius_approx": float(approx.radius.mean()),
        }))


if __name__ == "__main__":
    main()
