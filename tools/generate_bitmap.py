#!/usr/bin/env python
"""Build bucket-occupancy bitmap files offline — the ``generate-bitmap``
binary analog (``src/generate_bitmap.cc:84-125``: one raw bitmap file per
table from the code file). The bitmap-daemon/shm machinery of the reference
is unnecessary here (HBM residency replaces it); files are still useful as
host artifacts."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--binary_file", required=True)
    p.add_argument("--binary_bits", type=int, default=128)
    p.add_argument("--ntables", type=int, default=4)
    p.add_argument("-i", "--image_total", type=int, default=120_000_000)
    p.add_argument("--out_prefix", default="bitmap")
    args = p.parse_args()

    import numpy as np
    from verticut_tpu import native
    from verticut_tpu.config import MIHConfig

    cfg = MIHConfig(bits=args.binary_bits, n_tables=args.ntables)
    packed = native.read_code_file(args.binary_file, cfg.n_bytes,
                                   args.image_total)
    for t in range(cfg.n_tables):
        keys, _ = native.build_csr(packed, t, cfg.s_bits)
        words = native.build_bitmap(keys, cfg.s_bits)
        path = f"{args.out_prefix}.{t}"
        words.tofile(path)
        print(f"table {t}: {int(np.unique(keys).size)} occupied buckets "
              f"-> {path} ({words.nbytes} bytes)")


if __name__ == "__main__":
    main()
