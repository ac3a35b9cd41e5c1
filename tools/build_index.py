#!/usr/bin/env python
"""Build an MIH index from a raw binary code file — the ``build-tables``
binary analog (``src/build_hash_tables.cc`` + ``src/args_config.cc`` flags).

Example:
    python tools/build_index.py --binary_file lsh.code --binary_bits 128 \
        --ntables 4 -i 1000000 --out index.npz [--native] [--bitmap]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    # flag names follow src/args_config.cc:8-17
    p.add_argument("--binary_file", required=True)
    p.add_argument("--binary_bits", type=int, default=128)
    p.add_argument("--ntables", type=int, default=4)
    p.add_argument("-i", "--image_total", type=int, default=120_000_000,
                   help="max codes to read (reference caps at 120M)")
    p.add_argument("--out", required=True, help="output .npz index path")
    p.add_argument("--native", action="store_true",
                   help="use the C++ radix builder instead of device sort")
    p.add_argument("--bitmap", action="store_true",
                   help="also build occupancy bitmaps")
    p.add_argument("--compact", action="store_true",
                   help="store entry ids only (no inline codes)")
    p.add_argument("--mesh", default=None, metavar="TxSxQ",
                   help="build the compact SHARDED index over a "
                        "(table, shard, query) device mesh and save it "
                        "per shard to the --out DIRECTORY (the 1B-scale "
                        "layout, search/sharded_compact.py)")
    args = p.parse_args()

    import numpy as np  # noqa: F401  (kept for interactive debugging)
    from verticut_tpu import native
    from verticut_tpu.config import MIHConfig
    from verticut_tpu.index import build_index
    from verticut_tpu.index.mih import save_index
    from verticut_tpu.index.build_native import build_index_native

    cfg = MIHConfig(bits=args.binary_bits, n_tables=args.ntables)
    t0 = time.time()
    packed = native.read_code_file(args.binary_file, cfg.n_bytes,
                                   args.image_total)
    print(f"read {packed.shape[0]} codes in {time.time()-t0:.2f}s")

    if args.mesh:
        from verticut_tpu.parallel import make_mesh
        from verticut_tpu.search.sharded_compact import (
            build_sharded_compact, save_sharded_compact)
        m_t, m_s, m_q = (int(x) for x in args.mesh.lower().split("x"))
        mesh = make_mesh(m_t, m_s, m_q)
        t0 = time.time()
        index = build_sharded_compact(packed, cfg, mesh)
        st = index.memory_stats()
        print(f"built compact sharded index over {index.n} codes on "
              f"{st['n_devices']} devices in {time.time()-t0:.2f}s "
              f"({st['bytes_per_code']:.1f} B/code)")
        t0 = time.time()
        save_sharded_compact(args.out, index)
        print(f"saved per-shard to {args.out}/ in {time.time()-t0:.2f}s")
        return

    t0 = time.time()
    if args.native:
        index = build_index_native(packed, cfg, with_bitmap=args.bitmap,
                                   store_codes=not args.compact)
    else:
        index = build_index(packed, cfg, with_bitmap=args.bitmap,
                            store_codes=not args.compact)
    print(f"built {cfg.n_tables} tables over {index.n} codes "
          f"in {time.time()-t0:.2f}s")

    t0 = time.time()
    save_index(args.out, index)
    print(f"saved to {args.out} in {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
