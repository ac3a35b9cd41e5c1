"""Microbenchmark: XLA gather cost per SLICE (multi-row contiguous blocks)
on the real chip — sizes the pruned-scan rescore design.

DESIGN.md §1 records ~16 ns per gathered ROW for row gathers; this measures
whether a slice gather (slice_sizes=(R, w)) pays per slice or per row, for
the layouts the rescore stage could use:
  * (128, 4) slices off a row-major [N, 4] corpus
  * (512, 4) slices (the current _rescore_blocks shape)
  * (8, 128) slices off the transposed [8, Npad] corpus
  * plain row gather [Q*C] rows (baseline, expect ~16 ns/row)

Timing: R-rep fori_loop with varied indices, minus 1-rep, hard sync.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    n = 16 * 1024 * 1024            # 16M codes, 256 MB row-major
    w = 4
    rng = np.random.default_rng(0)
    db = jnp.asarray(rng.integers(0, 1 << 32, (n, w)), dtype=jnp.uint32)
    db_t = jnp.asarray(
        rng.integers(0, 1 << 32, (8, n)), dtype=jnp.uint32)
    results = {}
    R = 6

    def timed(name, body, init, *xs):
        def runner(reps):
            f = jax.jit(lambda c, *a: jax.lax.fori_loop(
                0, reps, lambda i, cc: body(i, cc, *a), c))
            out = f(init, *xs)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                          .astype(jnp.float32)))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = f(init, *xs)
                float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                              .astype(jnp.float32)))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1, tr = runner(1), runner(R)
        return (tr - t1) / (R - 1) * 1e3

    for q, c in ((8192, 256), (8192, 64), (1024, 512)):
        n_sl = q * c
        idx = jnp.asarray(rng.integers(0, n // 1024, (q, c)), jnp.int32)

        # (block, w) slices off row-major, block in {128, 512}
        for blk in (128, 512):
            if n_sl * blk * w * 4 > (6 << 30):
                continue  # materialized gather output would OOM the chip

            def body(i, acc, idx_, db_, blk=blk):
                dn = jax.lax.GatherDimensionNumbers(
                    offset_dims=(2, 3), collapsed_slice_dims=(),
                    start_index_map=(0,))
                g = jax.lax.gather(
                    db_, ((idx_ ^ i) * blk)[..., None], dn,
                    slice_sizes=(blk, w),
                    mode=jax.lax.GatherScatterMode.CLIP)
                return acc ^ g[:, :, 0, 0][:, :1]

            ms = timed(f"rowmaj blk{blk}", body,
                       jnp.zeros((q, 1), jnp.uint32), idx, db)
            key = f"[{q}x{c}] rowmajor ({blk},4) slices"
            results[key] = {"ms": round(ms, 2),
                            "ns_per_slice": round(ms * 1e6 / n_sl, 1)}
            print(f"  {key:40s} {ms:8.2f} ms  "
                  f"{ms*1e6/n_sl:7.1f} ns/slice", file=sys.stderr,
                  flush=True)

        # (8, 128) slices off transposed
        if n_sl * 8 * 128 * 4 > (6 << 30):
            continue

        def body_t(i, acc, idx_, db_t_):
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(2, 3), collapsed_slice_dims=(),
                start_index_map=(1,))
            g = jax.lax.gather(
                db_t_, ((idx_ ^ i) * 128)[..., None], dn,
                slice_sizes=(8, 128),
                mode=jax.lax.GatherScatterMode.CLIP)
            return acc ^ g[:, :, 0, 0][:, :1]

        ms = timed("transposed", body_t, jnp.zeros((q, 1), jnp.uint32),
                   idx, db_t)
        key = f"[{q}x{c}] transposed (8,128) slices"
        results[key] = {"ms": round(ms, 2),
                        "ns_per_slice": round(ms * 1e6 / n_sl, 1)}
        print(f"  {key:40s} {ms:8.2f} ms  {ms*1e6/n_sl:7.1f} ns/slice",
              file=sys.stderr, flush=True)

        # plain row gather baseline
        def body_r(i, acc, idx_, db_):
            g = db_[(idx_ ^ i).reshape(-1)]
            return acc ^ g[: acc.shape[0], :1]

        ms = timed("rows", body_r, jnp.zeros((q, 1), jnp.uint32), idx, db)
        key = f"[{q}x{c}] row gather"
        results[key] = {"ms": round(ms, 2),
                        "ns_per_row": round(ms * 1e6 / n_sl, 1)}
        print(f"  {key:40s} {ms:8.2f} ms  {ms*1e6/n_sl:7.1f} ns/row",
              file=sys.stderr, flush=True)

    print(json.dumps({"metric": "gather_bench", "n": n, "res": results}))


if __name__ == "__main__":
    main()
