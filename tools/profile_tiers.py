"""Tier-ablation profile of the fused program: times the FULL single-
dispatch pipeline with the device retry tier and the scan tiers toggled,
at k=10 and k=100. Deltas attribute the batch time to stages vs tiers
(the per-dispatch relay floor cancels in the deltas).
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
    from verticut_tpu import codes
    from verticut_tpu.config import MIHConfig, SearchConfig
    from verticut_tpu.index.build_native import build_index_native
    from verticut_tpu.index.mih import entry_block_size
    from verticut_tpu.search import single as single_lib
    from verticut_tpu.search.single import (fused_pipeline_packed,
                                            _cap_for_radius, _device_masks,
                                            _index_mask_bits,
                                            _radius_schedule, _stage_shift)
    from verticut_tpu.index import directory as dir_lib

    n, q = 1_000_000, 8192
    cfg = MIHConfig(bits=128, n_tables=4)
    rng = np.random.default_rng(0)
    print(f"tiers: building n={n}", file=sys.stderr, flush=True)
    packed = codes.clustered_codes(0, n, cfg.bits, n_clusters=n // 200,
                                   flip_p=0.02)
    index = build_index_native(packed, cfg)
    jax.block_until_ready(index.tables[-1].entry_ids)

    sel = rng.integers(0, n, q)
    qraw = codes.unpack_to_bytes(packed[sel])
    flips = rng.integers(0, cfg.bits, (q, 3))
    for i in range(q):
        for b in flips[i]:
            qraw[i, b // 8] ^= 1 << (b % 8)
    queries = jnp.asarray(codes.pack_bytes(qraw))

    results = {}
    blk = entry_block_size(cfg.n_words)
    mask_bits = _index_mask_bits(index)
    tables = tuple(index.tables)

    def run_cell(k, retry, scan):
        scfg = SearchConfig(knn=k, candidate_cap=8192, max_enum_radius=5)
        pool_size = scfg.pool_size
        schedule = tuple(
            (r, g) for r, g in _radius_schedule(scfg, cfg, n, mask_bits, True)
            if sum(single_lib.enumeration.n_masks(mask_bits, x)
                   for x in g) <= scfg.fused_max_masks)
        caps = tuple(_cap_for_radius(scfg, cfg, n, g, pool_size, mask_bits,
                                     True, blk) for _, g in schedule)
        batch_caps = tuple(
            q if i == 0 else max(64, q >> (_stage_shift(k, n) + 2 * (i - 1)))
            for i in range(len(schedule)))
        masks_tuple = tuple(_device_masks(mask_bits, g) for _, g in schedule)
        retry_caps = tuple(min(c * 2, max(scfg.candidate_cap, c))
                           for c in caps) if retry else None
        scan_budget = min(q, max(64, q // 64)) if scan else 0

        def go():
            return fused_pipeline_packed(
                tables, index.codes, index.codes_t, index.codes_rows,
                queries, masks_tuple,
                schedule=schedule, caps=caps, batch_caps=batch_caps,
                n_tables=cfg.n_tables, knn=k, pool_size=pool_size,
                approximate=False, use_bitmap=False, s_bits=cfg.s_bits,
                retry_caps=retry_caps,
                retry_budget=min(q, max(64, q // 4)),
                scan_budget=scan_budget)

        out = go()
        out.block_until_ready()
        float(jnp.sum(out[:, -1].astype(jnp.float32)))  # hard sync
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = go()
            float(jnp.sum(out[:, -1].astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1e3
        name = f"k={k} retry={int(retry)} scan={int(scan)}"
        results[name] = round(ms, 2)
        # how many queries used the tiers?
        host = np.asarray(out)
        cols = host[:, -7:].astype(np.int64)
        print(f"  {name:28s} {ms:8.2f} ms   done={int(cols[:, 0].sum())} "
              f"overflow={int(cols[:, 2].sum())}", file=sys.stderr,
              flush=True)

    for k in (10, 100):
        for retry, scan in ((True, True), (False, True), (True, False),
                            (False, False)):
            run_cell(k, retry, scan)

    print(json.dumps({"metric": "profile_tiers", "n": n, "q": q,
                      "ms": results}))


if __name__ == "__main__":
    main()
