"""r5 micro-bench: rescore-gather formulations and k=100 selection shapes.

Measures, on the real chip, the candidate formulations behind the r5 perf
work (VERDICT r4 #2/#3/#4) so design choices are data, not vibes:

  1. rescore gathers for the block-min scan at Q=8192, k in {10, 100}:
     a. (block, w)-slice gather off [N, w]          (current _rescore_blocks)
     b. (8, block)-slice gather off db_t [8, Npad]  (no extra memory)
     c. row gather off a blocked [nb, w*block] copy (PROFILE_SCAN r4 lever)
  2. per-table top-p selection at the fused pipeline's k=100 shapes:
     a. one native top_k                 (current table_topk_packed path)
     b. chunk-min with regrouped chunks  (variadic over chb + narrow select)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_r5.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def main():
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from verticut_tpu import codes
    from verticut_tpu.ops import topk

    n = 1_000_000
    q = 8192
    w = 4
    rng = np.random.default_rng(0)
    db = jnp.asarray(codes.random_codes(3, n, 128))
    db_t = codes.transpose_scan_layout(db)
    npad = db_t.shape[1]
    queries = jnp.asarray(codes.random_codes(7, q, 128))
    float(jnp.sum(db_t[0, :8]).astype(jnp.float32))
    out = {}

    def timeit(fn, reps=5):
        r = fn()
        jax.block_until_ready(r)
        float(jnp.sum(jax.tree.leaves(r)[0][:1].astype(jnp.float32)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn()
            float(jnp.sum(jax.tree.leaves(r)[0][:1].astype(jnp.float32)))
            ts.append((time.perf_counter() - t0) / reps)
        return min(ts) * 1e3

    # ---- 1. rescore gather formulations -------------------------------
    @functools.partial(jax.jit, static_argnames=("block",))
    def rescore_slice(bidx, block):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3), collapsed_slice_dims=(),
            start_index_map=(0,))
        g = jax.lax.gather(db, (bidx * block)[..., None], dn,
                           slice_sizes=(block, w),
                           mode=jax.lax.GatherScatterMode.CLIP)
        d = jnp.sum(jax.lax.population_count(
            g ^ queries[:, None, None, :]).astype(jnp.int32), axis=-1)
        return jnp.min(d.reshape(q, -1), axis=-1)

    @functools.partial(jax.jit, static_argnames=("block",))
    def rescore_dbt(bidx, block):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3), collapsed_slice_dims=(),
            start_index_map=(1,))
        g = jax.lax.gather(db_t, (bidx * block)[..., None], dn,
                           slice_sizes=(8, block),
                           mode=jax.lax.GatherScatterMode.CLIP)
        # [Q, kb, 8, block]; words 0..w-1 hold the codes
        d = jnp.zeros((q, bidx.shape[1], block), jnp.int32)
        for j in range(w):
            d = d + jax.lax.population_count(
                g[:, :, j, :] ^ queries[:, None, j:j + 1]).astype(jnp.int32)
        return jnp.min(d.reshape(q, -1), axis=-1)

    # blocked copy [nb, w*block] built word-major per 128-row: lane
    # j*128 + r = word j of code (i*128 + r)
    nb128 = npad // 128
    rows128 = (db_t[:w, :nb128 * 128]
               .reshape(w, nb128, 128).transpose(1, 0, 2)
               .reshape(nb128, w * 128))
    float(jnp.sum(rows128[0, :4].astype(jnp.float32)))

    @functools.partial(jax.jit, static_argnames=("block",))
    def rescore_rows(bidx, block):
        m = block // 128
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3), collapsed_slice_dims=(),
            start_index_map=(0,))
        g = jax.lax.gather(rows128, (bidx * m)[..., None], dn,
                           slice_sizes=(m, w * 128),
                           mode=jax.lax.GatherScatterMode.CLIP)
        # [Q, kb, m, w*128]
        d = jnp.zeros((q, bidx.shape[1], m, 128), jnp.int32)
        for j in range(w):
            d = d + jax.lax.population_count(
                g[..., j * 128:(j + 1) * 128]
                ^ queries[:, None, None, j:j + 1]).astype(jnp.int32)
        return jnp.min(d.reshape(q, -1), axis=-1)

    for k, block in ((10, 512), (100, 128), (100, 512)):
        nbk = n // block
        bidx = jnp.asarray(np.sort(
            rng.integers(0, nbk, (q, k)), axis=-1).astype(np.int32))
        for name, fn in (("slice", rescore_slice), ("dbt", rescore_dbt),
                         ("rows", rescore_rows)):
            try:
                t = timeit(lambda: fn(bidx, block))
                out[f"rescore_k{k}_b{block}_{name}_ms"] = round(t, 1)
                print(f"rescore k={k} block={block} {name:6s} {t:8.1f} ms",
                      file=sys.stderr, flush=True)
            except Exception as e:  # noqa: BLE001
                out[f"rescore_k{k}_b{block}_{name}_err"] = str(e)[:120]
                print(f"rescore k={k} block={block} {name}: FAIL {e}",
                      file=sys.stderr, flush=True)

    # ---- 2. k=100 per-table selection shapes ---------------------------
    @functools.partial(jax.jit, static_argnames=("p",))
    def sel_native(kc, p):
        return topk.select_desc(kc, p)

    @functools.partial(jax.jit, static_argnames=("p", "d"))
    def sel_chunkmin(kc, p, d):
        c = kc.shape[-1]
        chb = c // d
        kc3 = kc.reshape(q, chb, d)
        cmax = jnp.max(kc3, axis=-1)
        _, ci = jax.lax.top_k(cmax, p)
        g = jnp.take_along_axis(kc3, ci[..., None], axis=1).reshape(q, p * d)
        return topk.select_desc(g, p)

    for c, p, ds in ((1100, 100, (2, 4, 5)), (5800, 100, (8, 10, 25)),
                     (1100, 10, (10, 25)), (2200, 10, (10, 22, 25)),
                     (8192, 100, (8, 16, 32))):
        kc = jnp.asarray(rng.integers(0, 1 << 32, (q, c), dtype=np.uint64)
                         .astype(np.uint32))
        t = timeit(lambda: sel_native(kc, p))
        out[f"sel_c{c}_p{p}_native_ms"] = round(t, 1)
        print(f"sel [{q},{c}]->{p} native  {t:8.1f} ms",
              file=sys.stderr, flush=True)
        for d in ds:
            if c % d:
                continue
            t = timeit(lambda: sel_chunkmin(kc, p, d))
            out[f"sel_c{c}_p{p}_cm{d}_ms"] = round(t, 1)
            print(f"sel [{q},{c}]->{p} cm d={d:3d} {t:8.1f} ms",
                  file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
