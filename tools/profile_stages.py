"""Per-component profile of the fused MIH pipeline at bench shapes.

Times each stage of the hot path in isolation on the real chip —
directory range lookups, chunk descriptor construction, entry-block
fetch+score, per-table strip selection, dedup merge — at the EXACT shapes
the 1M k=10/k=100 bench cells run (stage 1: [8192, 18 masks], stage 2:
[1024-2048, 136 masks]), plus schedule ablations of the whole fused
program. Timing protocol per CLAUDE.md: device-resident args, warm-up
call, hard sync via a host transfer (block_until_ready does not reliably
block through the relay), min over reps.

Usage: python tools/profile_stages.py [--n 1000000] [--q 8192] [--reps 5]
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
    ap.add_argument("--reps", type=int, default=5)
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
    from verticut_tpu.ops import enumeration, topk
    from verticut_tpu.search import single as single_lib

    cfg = MIHConfig(bits=128, n_tables=4)
    rng = np.random.default_rng(0)
    print(f"profile: building n={args.n}", file=sys.stderr, flush=True)
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

    def timed(name, fn, *fargs):
        f = jax.jit(fn)
        out = f(*fargs)  # compile + warm
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))  # hard sync
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = f(*fargs)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1e3
        results[name] = round(ms, 2)
        print(f"  {name:44s} {ms:8.2f} ms", file=sys.stderr, flush=True)
        return out

    for stage, (group, nq) in {
        1: ((0, 1), args.q),
        2: ((2,), max(64, args.q >> 3)),
    }.items():
        masks = single_lib._device_masks(pbits, group)
        h = masks.shape[0]
        scfg = SearchConfig(knn=10)
        cap = single_lib._cap_for_radius(
            scfg, cfg, args.n, group, scfg.pool_size, pbits, True, blk)
        chb = max(4, cap // blk)
        qs = q_subs[:nq]
        qq = queries[:nq]
        tag = f"s{stage}[{nq},{h}masks,cap{cap},chb{chb}]"
        print(f"stage {stage}: {tag}", file=sys.stderr, flush=True)

        # 1. directory range lookup (4 tables)
        def lookup_all(q_subs_, masks_):
            outs = []
            for t in range(cfg.n_tables):
                pref = ((q_subs_[:, t] >> jnp.uint32(shift))[:, None]
                        ^ masks_[None, :])
                outs.append(index.tables[t].directory.range_lookup(pref))
            return outs

        lk = timed(f"{tag} range_lookup x4", lookup_all, qs, masks)

        # 2. chunk descriptors (4 tables)
        def descs_all(lk_):
            return [chunks_lib.chunk_descriptors(
                s, c, blk=blk, chb=chb,
                n_blocks=index.tables[t].entry_rows.shape[0])[:3]
                for t, (s, c) in enumerate(lk_)]

        dd = timed(f"{tag} chunk_descriptors x4", descs_all, lk)

        # 3. fetch + score (4 tables)
        def fetch_all(dd_, qq_):
            return [chunks_lib.fetch_score_blocks(
                index.tables[t].entry_rows, b, lo, hi, qq_, blk=blk)
                for t, (b, lo, hi) in enumerate(dd_)]

        fs = timed(f"{tag} fetch_score x4", fetch_all, dd, qq)

        # 4. per-table strips + dedup merge, k=10 and k=100 pools
        for k in (10, 100):
            pd, pi = topk.empty_pool(nq, k)

            def merge_all(fs_, pd_, pi_):
                strips = jnp.concatenate(
                    [topk.table_topk_packed(d, i, k) for d, i in fs_],
                    axis=-1)
                return topk.merge_strips_packed(pd_, pi_, strips,
                                                n_copies=cfg.n_tables + 1)

            timed(f"{tag} strips+merge k={k}", merge_all, fs, pd, pi)

    # full fused program ablations (single dispatch, packed result)
    from verticut_tpu.search import mih_search_dispatch, mih_search_finalize

    def fused_ms(scfg):
        h = mih_search_dispatch(index, queries, scfg)
        assert h is not None
        mih_search_finalize(h)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            hh = mih_search_dispatch(index, queries, scfg)
            mih_search_finalize(hh)
            ts.append(time.perf_counter() - t0)
        return round(min(ts) * 1e3, 2)

    for k in (10, 100):
        base = SearchConfig(knn=k, candidate_cap=8192, max_enum_radius=5)
        r1 = SearchConfig(knn=k, candidate_cap=8192, max_enum_radius=1)
        for name, sc in ((f"full k={k}", base), (f"r<=1-only k={k}", r1)):
            ms = fused_ms(sc)
            results[name] = ms
            print(f"  {name:44s} {ms:8.2f} ms", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "profile_stages", "n": args.n, "q": args.q,
                      "pbits": pbits, "blk": blk, "ms": results}))


if __name__ == "__main__":
    main()
