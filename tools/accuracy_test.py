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
    p.add_argument("--index")
    p.add_argument("--synth", type=int, default=0,
                   help="build an in-process clustered corpus of this size")
    p.add_argument("--uniform", action="store_true",
                   help="synth corpus uniform-random instead of clustered")
    p.add_argument("-c", "--count", type=int, default=256,
                   help="queries per k (reference protocol: 20 iters; more "
                        "here so warm batched timings mean something)")
    p.add_argument("--ks", default="3,100,500,1000")
    p.add_argument("--warm", action="store_true", default=True)
    p.add_argument("--no-fused", action="store_true",
                   help="use the per-radius loop driver (the fused program "
                        "at k*20 pools >= 10k compiles pathologically "
                        "through this rig's remote compiler)")
    args = p.parse_args()

    import numpy as np
    from verticut_tpu import codes
    from verticut_tpu.config import MIHConfig, SearchConfig
    from verticut_tpu.index.mih import load_index
    from verticut_tpu.search import mih_search

    if args.synth:
        from verticut_tpu.index.build_native import build_index_native
        cfg = MIHConfig(bits=128, n_tables=4)
        if args.uniform:
            packed = codes.random_codes(0, args.synth, cfg.bits)
        else:
            packed = codes.clustered_codes(0, args.synth, cfg.bits,
                                           n_clusters=args.synth // 200,
                                           flip_p=0.02)
        index = build_index_native(packed, cfg)
    elif args.index:
        index = load_index(args.index)
    else:
        p.error("--index or --synth required")
    rng = np.random.default_rng(0)
    qids = rng.integers(0, index.n, args.count)
    queries = np.asarray(index.codes)[qids]

    for k in (int(x) for x in args.ks.split(",")):
        fused = not args.no_fused
        se = SearchConfig(knn=k, fused=fused)
        sa = SearchConfig(knn=k, approximate=True, fused=fused)
        if args.warm:
            mih_search(index, queries, se)
            mih_search(index, queries, sa)
        t0 = time.time()
        exact = mih_search(index, queries, se)
        t_exact = time.time() - t0
        t0 = time.time()
        approx = mih_search(index, queries, sa)
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
