#!/usr/bin/env python
"""RPC load generator — the ``image-search-test`` binary analog
(``src/image_search_test.cc:112-170``): sequential and concurrent
(thread-per-query) throughput against a running image server."""

import argparse
import sys
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("-p", "--port", type=int, default=9191)
    p.add_argument("-n", "--num", type=int, default=100)
    p.add_argument("-k", "--knn", type=int, default=10)
    p.add_argument("-t", "--threads", type=int, default=0,
                   help="0 = sequential; else concurrent thread count")
    p.add_argument("--query_id_file", default=None,
                   help="file of query ids, one per line")
    args = p.parse_args()

    from verticut_tpu.service import ImageSearchClient

    cli = ImageSearchClient(host=args.host, port=args.port)
    assert cli.ping() == "pong"
    if args.query_id_file:
        with open(args.query_id_file) as f:
            qids = [int(line) for line in f if line.strip()][:args.num]
    else:
        qids = list(range(args.num))

    def one(qid):
        r = cli.search_image_by_id(qid, args.knn)
        assert r, f"empty result for {qid}"

    t0 = time.time()
    if args.threads <= 1:
        for qid in qids:
            one(qid)
    else:
        errs = []
        def worker(chunk):
            try:
                for qid in chunk:
                    one(qid)
            except Exception as e:  # noqa: BLE001
                errs.append(e)
        per = (len(qids) + args.threads - 1) // args.threads
        ts = [threading.Thread(target=worker,
                               args=(qids[i * per:(i + 1) * per],))
              for i in range(args.threads)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        if errs:
            raise errs[0]
    dt = time.time() - t0
    print(f"{len(qids)} queries in {dt:.3f}s -> {len(qids)/dt:.1f} qps "
          f"({'seq' if args.threads <= 1 else f'{args.threads} threads'})")


if __name__ == "__main__":
    main()
