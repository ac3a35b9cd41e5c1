"""Ablation profile of the FULL fused program: time fused_pipeline_packed
with pieces disabled to attribute the pipelined batch cost that the
per-component profile (profile_stages2.py) cannot see — compaction sorts,
retry tiers, scan tiers, state scatter, result packing.

Timing: R dispatches enqueued back-to-back, one hard sync (host transfer)
at the end; cost = (t_R - t_1) / (R - 1) so the relay round trips cancel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_fused_ablate.py
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
    ap.add_argument("--k", type=int, default=0, help="single k (0 = 10,100)")
    args = ap.parse_args()

    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from verticut_tpu import codes
    from verticut_tpu.config import MIHConfig, SearchConfig
    from verticut_tpu.index.build_native import build_index_native
    from verticut_tpu.search import single as single_lib
    from verticut_tpu.search.single import (_cap_for_radius, _device_masks,
                                            _index_fetch_blk,
                                            _index_mask_bits,
                                            _radius_schedule, _stage_shift,
                                            fused_pipeline_packed)

    cfg = MIHConfig(bits=128, n_tables=4)
    rng = np.random.default_rng(0)
    print(f"ablate: building n={args.n}", file=sys.stderr, flush=True)
    if args.n >= 20_000_000:
        # scale path, same as bench.py: generate AND build on device (the
        # relay uploads at ~5 MB/s — nothing big may leave the host)
        from verticut_tpu.index import build_index
        packed_dev = codes.clustered_codes_device(
            0, args.n, cfg.bits, n_clusters=args.n // 200, flip_p=0.02)
        inline = args.n * 21 * cfg.n_tables <= 10 * (1 << 30)
        index = build_index(packed_dev, cfg, store_codes=inline,
                            directory="range",
                            keep_entry_ids=args.n < 20_000_000)
        float(jnp.sum(index.tables[-1].directory.se[-1]))
        sel = jnp.asarray(rng.integers(0, args.n, args.q))
        pos = jnp.asarray(rng.integers(0, cfg.bits, (args.q, 3)))
        rows = packed_dev[sel]
        word = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cfg.n_words), 2)
        terms = jnp.where(
            pos[:, :, None] // 32 == word,
            jnp.uint32(1) << (pos[:, :, None] % 32).astype(jnp.uint32),
            jnp.uint32(0))
        queries = rows ^ terms[:, 0] ^ terms[:, 1] ^ terms[:, 2]
    else:
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
    nq = args.q

    mask_bits = _index_mask_bits(index)
    results = {}
    uniform_q = jnp.asarray(codes.random_codes(99, args.q, cfg.bits))

    def run_variant(name, k, *, scan=True, retry=True, n_stages=None,
                    qs=None, dominance=True, ovf_scan=False):
        qs = queries if qs is None else qs
        scfg = SearchConfig(knn=k, candidate_cap=8192, max_enum_radius=5)
        pool_size = scfg.pool_size
        schedule = tuple(
            (r, g) for r, g in _radius_schedule(scfg, cfg, index.n,
                                                mask_bits, True)
            if sum(single_lib.enumeration.n_masks(mask_bits, x)
                   for x in g) <= scfg.fused_max_masks)
        if n_stages is not None:
            schedule = schedule[:n_stages]
        caps = tuple(_cap_for_radius(scfg, cfg, index.n, g, pool_size,
                                     mask_bits, True,
                                     _index_fetch_blk(index))
                     for _, g in schedule)
        batch_caps = tuple(
            nq if i == 0 else max(64, nq >> (_stage_shift(k, args.n) + 2 * (i - 1)))
            for i in range(len(schedule)))
        masks_tuple = tuple(_device_masks(mask_bits, g)
                            for _, g in schedule)
        retry_caps = tuple(min(c * 2, max(scfg.candidate_cap, c))
                           for c in caps)
        scan_budget = min(nq, max(64, nq // 64)) if scan else 0
        o2s = ovf_scan and scan_budget > 0 \
            and index.n <= single_lib.OVERFLOW_SCAN_MAX_N
        kw = dict(schedule=schedule, caps=caps, batch_caps=batch_caps,
                  n_tables=cfg.n_tables, knn=k, pool_size=pool_size,
                  approximate=False, use_bitmap=False, s_bits=cfg.s_bits,
                  retry_caps=(retry_caps
                              if retry and not o2s and retry_caps != caps
                              else None),
                  retry_budget=(min(nq, max(64, nq // 4))
                                if retry and not o2s else 0),
                  scan_budget=scan_budget,
                  scan_dominance=(nq // 2 if scan_budget and dominance
                                  else 0),
                  overflow_to_scan=o2s)

        def call():
            return fused_pipeline_packed(
                index.tables, index.codes, index.codes_t, index.codes_rows,
                qs, masks_tuple, **kw)

        out = call()
        float(jnp.sum(out[:, -2].astype(jnp.float32)))  # warm + sync

        def runner(reps):
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                outs = [call() for _ in range(reps)]
                float(jnp.sum(outs[-1][:, -2].astype(jnp.float32)))
                for o in outs[:-1]:
                    o.delete()
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1, tr = runner(1), runner(args.r)
        ms = (tr - t1) / (args.r - 1) * 1e3
        results[name] = round(ms, 2)
        print(f"  {name:40s} {ms:8.2f} ms  (t1 {t1 * 1e3:.1f})",
              file=sys.stderr, flush=True)

    ks = [args.k] if args.k else [10, 100]
    for k in ks:
        print(f"k={k}", file=sys.stderr, flush=True)
        run_variant(f"k{k} full", k)
        run_variant(f"k{k} merged-ladder", k, ovf_scan=True)
        run_variant(f"k{k} noscan", k, scan=False)
        run_variant(f"k{k} bare", k, scan=False, retry=False)
        run_variant(f"k{k} bare stage1", k, scan=False, retry=False,
                    n_stages=1)
        run_variant(f"k{k} uniform full", k, qs=uniform_q)
        run_variant(f"k{k} uniform nodom", k, qs=uniform_q,
                    dominance=False)

    print(json.dumps({"metric": "profile_fused_ablate", "n": args.n,
                      "q": args.q, "ms": results}))


if __name__ == "__main__":
    main()
