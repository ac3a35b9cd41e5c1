#!/usr/bin/env python
"""Post-build index validation — the ``integrity-check`` binary analog
(``src/integrity_check.cc:37-70``): re-look up every code's bucket in every
table and assert the (id, code) pair is present."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("--chunk", type=int, default=1 << 16)
    args = p.parse_args()

    import numpy as np
    import jax.numpy as jnp
    from verticut_tpu import codes as codes_lib
    from verticut_tpu.index.mih import load_index

    index = load_index(args.index)
    if index.codes is None:
        p.error("index stores no code array")
    n = index.n
    bad = 0
    for t, tab in enumerate(index.tables):
        eids = np.asarray(tab.entry_ids)
        for lo in range(0, n, args.chunk):
            hi = min(lo + args.chunk, n)
            chunk = index.codes[lo:hi]
            subs = codes_lib.substring(chunk, t, index.cfg.s_bits)
            starts, counts = tab.directory.lookup(subs)
            starts, counts = np.asarray(starts), np.asarray(counts)
            for i in range(hi - lo):
                b = eids[starts[i]:starts[i] + counts[i]]
                if (lo + i) not in b:
                    bad += 1
                    print(f"MISSING id {lo+i} in table {t}", file=sys.stderr)
        print(f"table {t}: checked {n} codes")
    if bad:
        print(f"INTEGRITY FAIL: {bad} missing entries", file=sys.stderr)
        sys.exit(1)
    print("integrity OK")


if __name__ == "__main__":
    main()
