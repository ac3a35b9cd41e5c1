"""On-chip component profile of the block-min scan (the 100M uniform cell).

Splits scan_blockmin_t into its three costs at production shape (Q=8192):

  pass1   fused Pallas blockmin fold (unpack+GEMM+epilogue + select_desc
          carry) -> block ids, no rescore
  rescore (512,w)-slice gathers + popcount + strip selection alone
  full    scan_blockmin_t end-to-end

over block in {128, 256, 512} x acc in {bf16, int8}, to locate the lever
for the uniform cell (ROADMAP #2): the rescore gather bill is ~10 ns per
gathered ROW (k*block rows/query), pass 1 is MAC-floor-bound (bf16 peak =
2*Q*N*B / 197e12).

Run on the real TPU: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/profile_scan.py [N] [K]
"""
import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from verticut_tpu import codes
    from verticut_tpu.ops import hamming, topk
    from verticut_tpu.ops.pallas import pallas_blockmin_t, pallas_blockmin_t2

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    q_batch = 8192
    bits = 128
    w = bits // 32
    print(f"device: {jax.devices()[0].device_kind}  n={n} q={q_batch} k={k}",
          flush=True)

    packed = codes.clustered_codes_device(0, n, bits, n_clusters=n // 200,
                                          flip_p=0.02)
    db_t = codes.transpose_scan_layout(packed)
    npad = db_t.shape[1]
    rng = np.random.default_rng(1)
    queries = jnp.asarray(
        codes.random_codes(7, q_batch, bits))  # uniform queries: scan-bound
    float(jnp.sum(db_t[0, :8]).astype(jnp.float32))  # hard sync
    mac_floor_ms = 2 * q_batch * npad * bits / 197.4e12 * 1e3

    @functools.partial(jax.jit, static_argnames=("block", "acc"))
    def pass1(qs, dbt, block, acc):
        # pass 1 of scan_blockmin_t verbatim (fold + packed block select)
        nb = npad // block
        idx_bits = max(1, (nb - 1).bit_length())
        nfull = n // block
        kb = min(k, nfull)
        ch = hamming._pick_chunk_t(npad, block, q_batch)
        cb = ch // block

        def body(c, carry):
            sl = jax.lax.dynamic_slice(dbt, (0, c * ch), (8, ch))
            bm = pallas_blockmin_t2(qs, sl, block=block, acc=acc)
            gidx = (jax.lax.broadcasted_iota(jnp.uint32, (1, cb), 1)
                    + (c * cb).astype(jnp.uint32))
            keys = ~((jnp.clip(bm, 0, bits + 1).astype(jnp.uint32)
                      << idx_bits) | gidx)
            keys = jnp.where(gidx >= jnp.uint32(nfull), jnp.uint32(0), keys)
            return topk.select_desc(
                jnp.concatenate([carry, keys], axis=-1), kb)

        top = jax.lax.fori_loop(0, npad // ch, body,
                                jnp.zeros((q_batch, kb), jnp.uint32))
        return ((~top) & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)

    @functools.partial(jax.jit, static_argnames=("block", "acc"))
    def kernel_only(qs, dbt, block, acc="bf16"):
        # one chunk-sized kernel call repeated over the corpus, NO select
        ch = hamming._pick_chunk_t(npad, block, q_batch)

        def body(c, acc_sum):
            sl = jax.lax.dynamic_slice(dbt, (0, c * ch), (8, ch))
            bm = pallas_blockmin_t2(qs, sl, block=block, acc=acc)
            return acc_sum + jnp.sum(bm[:1, :8].astype(jnp.float32))

        return jax.lax.fori_loop(0, npad // ch, body, jnp.float32(0))

    @functools.partial(jax.jit, static_argnames=("block", "kb"))
    def rescore_only(qs, db, bidx, block, kb):
        db_p, _ = hamming._pad_db(db, block)
        return hamming._rescore_blocks(qs, db_p, n, bidx, k, block)

    def timeit(fn, reps=3):
        r = fn()
        jax.tree.map(lambda x: float(jnp.sum(x[:1].astype(jnp.float32)))
                     if hasattr(x, "shape") and x.ndim else float(x), r)
        t0 = time.time()
        for _ in range(reps):
            r = fn()
            leaves = jax.tree.leaves(r)
            float(jnp.sum(leaves[0][:1].astype(jnp.float32))
                  if leaves[0].ndim else leaves[0].astype(jnp.float32))
        return (time.time() - t0) / reps * 1e3

    out = {"n": n, "q": q_batch, "k": k,
           "bf16_mac_floor_ms": round(mac_floor_ms, 1)}

    # Wide-row gather rate: can a blocked [nb, w*block] rescore layout beat
    # the (block, w)-slice gather's ~1.2 us/slice issue cost? Gathers
    # Q*k random rows at each row width.
    @functools.partial(jax.jit, static_argnames=("rows", "width"))
    def wide_gather(src, ridx, rows, width):
        g = src[ridx]                                   # [Q, kb, width]
        return jnp.sum(g[:, :, ::64].astype(jnp.float32))

    for block in (128, 512):
        width = w * block
        nbw = npad // block
        src = jnp.zeros((nbw, width), jnp.uint32)
        ridx = jnp.asarray(rng.integers(0, nbw, (q_batch, k)).astype(np.int32))
        t_g = timeit(lambda: wide_gather(src, ridx, nbw, width))
        out[f"widerow{width * 4}B_gather_ms"] = round(t_g, 1)
        print(f"wide-row gather [{nbw}, {width}] x {q_batch * k} rows "
              f"({width * 4} B/row): {t_g:7.1f} ms", flush=True)
        del src
    for block in (512, 256, 128):
        nfull = n // block
        kb = min(k, nfull)
        bidx = jnp.asarray(
            np.sort(rng.integers(0, nfull, (q_batch, kb)), axis=-1)
            .astype(np.int32))
        for acc in ("bf16", "int8"):
            key = f"block{block}_{acc}"
            try:
                t_k = timeit(lambda: kernel_only(queries, db_t, block, acc))
                t_p1 = timeit(lambda: pass1(queries, db_t, block, acc))
                out[f"{key}_kernel_ms"] = round(t_k, 1)
                out[f"{key}_pass1_ms"] = round(t_p1, 1)
                print(f"block={block:4d} acc={acc}: kernel {t_k:7.1f} ms  "
                      f"pass1 {t_p1:7.1f} ms "
                      f"(floor {mac_floor_ms:.0f})", flush=True)
            except Exception as e:  # noqa: BLE001 — recorded per cell
                out[f"{key}_error"] = str(e).splitlines()[0][:160]
                print(f"block={block:4d} acc={acc}: FAILED {e}", flush=True)
        t_r = timeit(lambda: rescore_only(queries, packed, bidx, block, kb))
        out[f"block{block}_rescore_ms"] = round(t_r, 1)
        t_f = timeit(lambda: hamming.scan_blockmin_t(
            queries, packed, db_t, k, block=block))
        out[f"block{block}_full_ms"] = round(t_f, 1)
        print(f"block={block:4d} rescore {t_r:7.1f} ms  "
              f"full(bf16) {t_f:7.1f} ms", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
