#!/usr/bin/env python
"""Encode float feature vectors into binary codes — closes the loop the
reference leaves offline (it consumes a pre-computed ``lsh.code``).

    python tools/encode_features.py --features feats.npy --bits 128 \
        --method itq --out lsh.code [--train_sample 20000]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--features", required=True, help=".npy float [N, D]")
    p.add_argument("--bits", type=int, default=128)
    p.add_argument("--method", choices=["lsh", "itq"], default="itq")
    p.add_argument("--train_sample", type=int, default=20000)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True, help="raw code file (16B rows)")
    args = p.parse_args()

    import numpy as np
    import jax.numpy as jnp
    from verticut_tpu.models import ITQEncoder, RandomProjectionLSH
    from verticut_tpu.models.lsh import encode_corpus, write_code_file

    x = np.load(args.features, mmap_mode="r")
    print(f"features: {x.shape} {x.dtype}")
    t0 = time.time()
    if args.method == "lsh":
        enc = RandomProjectionLSH.create(x.shape[1], args.bits, args.seed)
    else:
        sample = np.asarray(x[:args.train_sample], np.float32)
        enc = ITQEncoder.fit(jnp.asarray(sample), args.bits, args.iters,
                             args.seed)
    print(f"encoder ready in {time.time()-t0:.2f}s")
    t0 = time.time()
    packed = encode_corpus(enc, np.asarray(x, np.float32))
    write_code_file(args.out, packed)
    print(f"encoded {packed.shape[0]} codes -> {args.out} "
          f"in {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
