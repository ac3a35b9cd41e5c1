#!/usr/bin/env python
"""Post-build index validation — the ``integrity-check`` binary analog
(``src/integrity_check.cc:37-70``), vectorized for 100M+ scale.

The membership walk is whole-table device programs (see
``verticut_tpu/index/integrity.py``): ground-truth (substring, id) sort vs
the stored entry/ directory arrays — minutes at 100M instead of the
interpreted per-code loop the r1-r3 version used (hopeless past ~1M).

Modes:
    --index PATH        check a saved index (.npz from tools/build_index.py)
    --synthetic N       device-generate the bench corpus (clustered codes),
                        build, and check at scale — the recorded-artifact
                        path for the 100M integrity row
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", help="saved index (.npz)")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="device-build a clustered N-code index and check it")
    p.add_argument("--bits", type=int, default=128)
    p.add_argument("--ntables", type=int, default=4)
    args = p.parse_args()
    if not args.index and not args.synthetic:
        p.error("need --index or --synthetic")

    import jax.numpy as jnp
    from verticut_tpu import codes as codes_lib
    from verticut_tpu.config import MIHConfig
    from verticut_tpu.index.integrity import check_index
    from verticut_tpu.index.mih import build_index, load_index

    t0 = time.time()
    if args.synthetic:
        n = args.synthetic
        cfg = MIHConfig(bits=args.bits, n_tables=args.ntables)
        codes_dev = codes_lib.clustered_codes_device(
            0, n, cfg.bits, n_clusters=max(2, n // 200), flip_p=0.02)
        inline = n * 21 * cfg.n_tables <= 10 * (1 << 30)
        index = build_index(codes_dev, cfg, store_codes=inline,
                            directory="range",
                            keep_entry_ids=n < 20_000_000)
        float(jnp.sum(index.tables[-1].directory.se[-1]))  # sync
        build_s = time.time() - t0
        print(f"built {n} codes in {build_s:.1f}s", file=sys.stderr)
    else:
        index = load_index(args.index)
        build_s = None
        if index.codes is None:
            p.error("index stores no code array")

    t0 = time.time()
    report = check_index(index)
    report["check_s"] = round(time.time() - t0, 2)
    if build_s is not None:
        report["build_s"] = round(build_s, 2)
    report["metric"] = "integrity_check"
    print(json.dumps(report))
    if not report["ok"]:
        print("INTEGRITY FAIL", file=sys.stderr)
        sys.exit(1)
    print(f"integrity OK ({report['check_s']}s)", file=sys.stderr)


if __name__ == "__main__":
    main()
