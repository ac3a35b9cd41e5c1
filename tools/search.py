#!/usr/bin/env python
"""Run K-NN queries against a saved index — the
``run_distributed_search.py`` + ``distributed-image-search`` analog.

Output format matches the reference's stdout contract parsed by the RPC
front-end (``image_search_server.cc:86-102``): one ``"%u : %u"`` line per
result, plus the per-query average stat line
(``distributed_image_search.cc:87-93``).

Example:
    python tools/search.py --index index.npz -q 12345 -k 100
    python tools/search.py --index index.npz -f queries.bin -k 10 -a
    python tools/search.py --index index.npz -q 0 --mesh 4x2x1  # sharded
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    # flags follow src/run_distributed_search.py:29-59
    p.add_argument("--index", required=True)
    p.add_argument("-q", "--query_id", type=int, default=None)
    p.add_argument("-f", "--query_file", default=None)
    p.add_argument("-k", "--knn", type=int, default=100)
    p.add_argument("-a", "--approximate", action="store_true")
    p.add_argument("-c", "--count", type=int, default=200,
                   help="max queries from file (reference caps at 200)")
    p.add_argument("--mesh", default=None,
                   help="TxSxQ mesh for the sharded engine, e.g. 4x1x1")
    p.add_argument("--cpu-devices", type=int, default=0,
                   help="force N virtual CPU devices in-process (this rig "
                        "pins JAX_PLATFORMS via sitecustomize, so env vars "
                        "do not stick — same seam as dryrun_multichip)")
    args = p.parse_args()

    if args.cpu_devices:
        import os
        flag = f"--xla_force_host_platform_device_count={args.cpu_devices}"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " " + flag).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from verticut_tpu import codes as codes_lib
    from verticut_tpu import native
    from verticut_tpu.config import SearchConfig
    from verticut_tpu.index.mih import load_index
    from verticut_tpu.search import mih_search
    from verticut_tpu.utils.timer import Timer, show_all_timings

    with Timer("load_index"):
        index = load_index(args.index)

    if args.query_file:
        queries = native.read_code_file(args.query_file, index.cfg.n_bytes,
                                        args.count)
    elif args.query_id is not None:
        if index.codes is None:
            p.error("index stores no codes; use -f")
        queries = np.asarray(index.codes[args.query_id:args.query_id + 1])
    else:
        p.error("need -q or -f")

    scfg = SearchConfig(knn=args.knn, approximate=args.approximate)
    with Timer("while_loop"):  # name parity: distributed_image_search.cc:60
        if args.mesh:
            t, s, qx = (int(x) for x in args.mesh.split("x"))
            from verticut_tpu.parallel import make_mesh
            from verticut_tpu.search.sharded import (build_sharded_index,
                                                     sharded_mih_search)
            mesh = make_mesh(t, s, qx)
            sidx = build_sharded_index(np.asarray(index.codes), index.cfg,
                                       mesh)
            res = sharded_mih_search(sidx, queries, scfg)
        else:
            res = mih_search(index, queries, scfg)

    nq = queries.shape[0]
    for qi in range(nq):
        for i, d in zip(res.ids[qi], res.dists[qi]):
            if i >= 0:
                print(f"{i} : {d}")
    # stat line parity: distributed_image_search.cc:87-93
    print(f"average radius: {res.radius.mean():.2f}, "
          f"average probes: {res.n_probes.mean() / nq:.2f}, "
          f"average nonempty reads: {res.n_nonempty.mean():.2f}, "
          f"average candidates: {res.n_cands.mean():.2f}",
          file=sys.stderr)
    show_all_timings()


if __name__ == "__main__":
    main()
