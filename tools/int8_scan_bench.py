"""On-chip micro-bench: bf16 vs int8 MXU operands in the transposed
blockmin scan kernel (ops/pallas/linear_scan.pallas_blockmin_t).

v5e runs s8 x s8 -> s32 at 2x the bf16 MAC rate (394.7 vs 197.4 TOPS);
both are exact for ±1 operands at 128-bit codes. This tool measures
whether the kernel is MXU-bound enough for that to matter at the 100M
uniform cell's production shapes (Q=8192, block=128).

Run on the real TPU: PYTHONPATH=/root/repo:/root/.axon_site python
tools/int8_scan_bench.py [N]
"""
import sys
import time

import numpy as np


def main():
    import jax
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from verticut_tpu import codes
    from verticut_tpu.ops import hamming

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    q_batch = 8192
    k = 10
    print(f"device: {jax.devices()[0].device_kind}  n={n} q={q_batch}")

    dev = jax.device_put(0.0).device
    packed = codes.clustered_codes_device(0, n, 128, n_clusters=n // 200,
                                          flip_p=0.02)
    db_t = codes.transpose_scan_layout(packed)
    rng = np.random.default_rng(1)
    sel = jnp.asarray(rng.integers(0, n, q_batch))
    queries = packed[sel]
    float(jnp.sum(db_t[0, :8]).astype(jnp.float32))  # hard sync

    for block in (128, 512):
        for acc in ("bf16", "int8"):
            # warm compile
            d, i = hamming.scan_blockmin_t(queries, packed, db_t, k,
                                           block=block, acc=acc)
            float(jnp.sum(d).astype(jnp.float32))
            reps = 3
            t0 = time.time()
            for r in range(reps):
                d, i = hamming.scan_blockmin_t(
                    queries ^ jnp.uint32(r % 2), packed, db_t, k,
                    block=block, acc=acc)
                float(jnp.sum(d).astype(jnp.float32))
            dt = (time.time() - t0) / reps
            print(f"block={block:4d} acc={acc}: {dt * 1e3:8.1f} ms/batch "
                  f"({q_batch / dt:8.0f} QPS)")

    # exactness cross-check on the last shapes: int8 vs bf16 results
    d8, i8 = hamming.scan_blockmin_t(queries, packed, db_t, k,
                                     block=128, acc="int8")
    db_, ib_ = hamming.scan_blockmin_t(queries, packed, db_t, k,
                                       block=128, acc="bf16")
    same_d = bool(jnp.array_equal(d8, db_))
    same_i = bool(jnp.array_equal(i8, ib_))
    print(f"int8 vs bf16: distances_equal={same_d} ids_equal={same_i}")


if __name__ == "__main__":
    main()
