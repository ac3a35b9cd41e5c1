"""Relay-proof per-component profile: each component runs R times INSIDE
one jitted fori_loop (sequentialized by a data dependency), so the ~30 ms
per-dispatch relay floor is paid once; component cost = (t_R - t_1)/(R-1).

Covers the fused pipeline's hot components at the 1M bench shapes.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_stages2.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--q", type=int, default=8192)
    ap.add_argument("--r", type=int, default=8)
    args = ap.parse_args()

    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from verticut_tpu import codes
    from verticut_tpu.config import MIHConfig, SearchConfig
    from verticut_tpu.index.build_native import build_index_native
    from verticut_tpu.index.mih import entry_block_size
    from verticut_tpu.ops import chunks as chunks_lib
    from verticut_tpu.ops import topk
    from verticut_tpu.search import single as single_lib

    cfg = MIHConfig(bits=128, n_tables=4)
    rng = np.random.default_rng(0)
    print(f"profile2: building n={args.n}", file=sys.stderr, flush=True)
    packed = codes.clustered_codes(0, args.n, cfg.bits,
                                   n_clusters=args.n // 200, flip_p=0.02)
    index = build_index_native(packed, cfg)
    jax.block_until_ready(index.tables[-1].entry_ids)

    sel = rng.integers(0, args.n, args.q)
    qraw = codes.unpack_to_bytes(packed[sel])
    flips = rng.integers(0, cfg.bits, (args.q, 3))
    for i in range(args.q):
        for b in flips[i]:
            qraw[i, b // 8] ^= 1 << (b % 8)
    queries = jnp.asarray(codes.pack_bytes(qraw))
    q_subs = index.table_subs(queries)

    d0 = index.tables[0].directory
    pbits = d0.pbits
    shift = cfg.s_bits - pbits
    blk = entry_block_size(cfg.n_words)
    results = {}
    R = args.r

    def timed_loop(name, body, init, *xs):
        """body(i, carry, *xs) -> carry; time R-rep vs 1-rep fori_loop.
        ``xs`` are jit ARGUMENTS (closed-over arrays embed as HLO constants
        and 413 the remote compiler — CLAUDE.md)."""
        def runner(reps):
            f = jax.jit(lambda c, *a: jax.lax.fori_loop(
                0, reps, lambda i, cc: body(i, cc, *a), c))
            out = f(init, *xs)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf.astype(jnp.float32)))
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                out = f(init, *xs)
                leaf = jax.tree_util.tree_leaves(out)[0]
                float(jnp.sum(leaf.astype(jnp.float32)))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1, tr = runner(1), runner(R)
        ms = (tr - t1) / (R - 1) * 1e3
        results[name] = round(ms, 2)
        print(f"  {name:46s} {ms:8.2f} ms", file=sys.stderr, flush=True)

    for stage, (group, nq) in {1: ((0, 1), args.q),
                               2: ((2,), max(64, args.q >> 3))}.items():
        masks = single_lib._device_masks(pbits, group)
        h = masks.shape[0]
        scfg = SearchConfig(knn=10)
        cap = single_lib._cap_for_radius(
            scfg, cfg, args.n, group, scfg.pool_size, pbits, True, blk)
        chb = max(4, cap // blk)
        qs = q_subs[:nq]
        qq = queries[:nq]
        tag = f"s{stage}[{nq}x{h}]"
        print(f"stage {stage}: {tag} cap={cap} chb={chb}",
              file=sys.stderr, flush=True)

        # 1. range lookup x4 (perturb prefixes per iteration)
        def lk_body(i, carry, qs_, masks_):
            acc = carry
            for t in range(cfg.n_tables):
                pref = ((qs_[:, t] >> jnp.uint32(shift))[:, None]
                        ^ masks_[None, :]) ^ (i % 2).astype(jnp.uint32)
                s, c = index.tables[t].directory.range_lookup(pref)
                acc = acc ^ s[:, :1] ^ c[:, :1]
            return acc

        timed_loop(f"{tag} range_lookup x4", lk_body,
                   jnp.zeros((nq, 1), jnp.int32), qs, masks)

        # fixed lookup results for downstream components
        lk = []
        for t in range(cfg.n_tables):
            pref = (qs[:, t] >> jnp.uint32(shift))[:, None] ^ masks[None, :]
            lk.append(index.tables[t].directory.range_lookup(pref))

        # 2. chunk descriptors x4
        def dd_body(i, carry, *lk_flat):
            acc = carry
            for t in range(cfg.n_tables):
                s, c = lk_flat[2 * t], lk_flat[2 * t + 1]
                b, lo, hi, _n, _o = chunks_lib.chunk_descriptors(
                    s + i, c, blk=blk, chb=chb,
                    n_blocks=index.tables[t].entry_rows.shape[0])
                acc = acc ^ b[:, :1] ^ lo[:, :1] ^ hi[:, :1]
            return acc

        timed_loop(f"{tag} chunk_descriptors x4", dd_body,
                   jnp.zeros((nq, 1), jnp.int32),
                   *[a for pair in lk for a in pair])

        dd = [chunks_lib.chunk_descriptors(
            s, c, blk=blk, chb=chb,
            n_blocks=index.tables[t].entry_rows.shape[0])[:3]
            for t, (s, c) in enumerate(lk)]

        # 3. fetch + score x4
        def fs_body(i, carry, qq_, *dd_flat):
            acc = carry
            for t in range(cfg.n_tables):
                b, lo, hi = dd_flat[3 * t:3 * t + 3]
                d, ci = chunks_lib.fetch_score_blocks(
                    index.tables[t].entry_rows, b ^ (i % 2), lo, hi, qq_,
                    blk=blk)
                acc = acc ^ d[:, :1] ^ ci[:, :1]
            return acc

        timed_loop(f"{tag} fetch_score x4", fs_body,
                   jnp.zeros((nq, 1), jnp.int32), qq,
                   *[a for trip in dd for a in trip])

        fs = [chunks_lib.fetch_score_blocks(
            index.tables[t].entry_rows, b, lo, hi, qq, blk=blk)
            for t, (b, lo, hi) in enumerate(dd)]

        # 4. strips + merge
        for k in (10, 100):
            pd0, pi0 = topk.empty_pool(nq, k)

            def mg_body(i, carry, *fs_flat, k=k):
                pd, pi = carry
                strips = jnp.concatenate(
                    [topk.table_topk_packed(fs_flat[2 * t] ^ (i % 2),
                                            fs_flat[2 * t + 1], k)
                     for t in range(cfg.n_tables)], axis=-1)
                return topk.merge_strips_packed(pd, pi, strips,
                                                n_copies=cfg.n_tables + 1)

            timed_loop(f"{tag} strips+merge k={k}", mg_body, (pd0, pi0),
                       *[a for pair in fs for a in pair])

        # 4a. chunk-min strips + merge (the production path since r4)
        for k in (10, 100):
            pd0, pi0 = topk.empty_pool(nq, k)

            def cm_body(i, carry, *fs_flat, k=k):
                pd, pi = carry
                strips = jnp.concatenate(
                    [topk.table_topk_chunkmin_packed(
                        fs_flat[2 * t] ^ (i % 2), fs_flat[2 * t + 1], k, blk)
                     for t in range(cfg.n_tables)], axis=-1)
                return topk.merge_strips_packed(pd, pi, strips,
                                                n_copies=cfg.n_tables + 1)

            timed_loop(f"{tag} chunkmin strips+merge k={k}", cm_body,
                       (pd0, pi0), *[a for pair in fs for a in pair])

        # 4b. unified merge of ALL tables' candidates at once
        for k in (10, 100):
            pd0, pi0 = topk.empty_pool(nq, k)
            cd = jnp.concatenate([d for d, _ in fs], axis=-1)
            ci = jnp.concatenate([c for _, c in fs], axis=-1)

            def um_body(i, carry, cd_, ci_, k=k):
                pd, pi = carry
                return topk.merge_topk_dedup_packed(
                    pd, pi, cd_ ^ (i % 2), ci_, n_dup=k * cfg.n_tables)

            timed_loop(f"{tag} unified merge k={k}", um_body, (pd0, pi0),
                       cd, ci)

    print(json.dumps({"metric": "profile_stages2", "n": args.n, "q": args.q,
                      "pbits": pbits, "blk": blk, "ms": results}))


if __name__ == "__main__":
    main()
