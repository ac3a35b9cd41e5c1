"""1B / 8-chip readiness proof via chipless AOT compilation.

The rig has ONE physical v5e chip, so the 1B-scale multi-chip program can
never execute here — but the PJRT topology compiler can still build the
exact XLA executables for a v5e 2x4 slice from ShapeDtypeStructs and
report their static memory footprints. This tool:

1. builds the (table=4, shard=2, query=1) mesh over an 8-device
   ``v5e:2x4`` topology description (no hardware attached),
2. AOT-lowers + compiles the distributed compact BUILD program
   (search/sharded_compact._build_compact_jit) at N = 1e9 codes,
3. AOT-lowers + compiles the full fused compact SEARCH program
   (compact_fused_packed) with the production schedule for N = 1e9,
   batch 8192, k in {10, 100},
4. records compile success + per-program memory analysis (arguments,
   outputs, temps, code) against the 16 GB/chip HBM budget as
   ``MULTICHIP_1B_r04.json``.

This is the memory/compile proof VERDICT r3 asked for — the reference
never exceeded 120M codes (src/build_hash_tables.cc:66,
image_search_constants.h:14); this program holds 1B.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/aot_1b_proof.py \
        [out.json] [build,k10,k100]

Each program compiles in minutes (build: 175 s; the fused search
programs longer), so the program list lets separate invocations split
the work; results merge into the output file.
"""
import json
import os
import sys
import time

import numpy as np


HBM_PER_CHIP = 16 * (1 << 30)          # v5e
N = 1_000_000_000
NQ = 8192


def mem_report(compiled, n_dev):
    """memory_analysis() fields, per device (shard_map programs are SPMD:
    the analysis is already per-device)."""
    ma = compiled.memory_analysis()
    f = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            f[k] = int(v)
    args = f.get("argument_size_in_bytes", 0)
    alias = f.get("alias_size_in_bytes", 0)
    f["peak_bytes_per_device"] = (args - alias
                                  + f.get("output_size_in_bytes", 0)
                                  + f.get("temp_size_in_bytes", 0))
    f["hbm_budget_bytes"] = HBM_PER_CHIP
    f["fits_hbm"] = f["peak_bytes_per_device"] <= HBM_PER_CHIP
    return f


def main():
    import jax
    from verticut_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec as P

    from verticut_tpu import codes as codes_lib
    from verticut_tpu.config import MIHConfig, SearchConfig
    from verticut_tpu.index import directory as dir_lib
    from verticut_tpu.index.mih import ID_ROW_BLOCK
    from verticut_tpu.ops import enumeration
    from verticut_tpu.parallel import make_mesh
    from verticut_tpu.search import sharded_compact as sc
    from verticut_tpu.search.single import (_cap_for_radius, _device_masks,
                                            _radius_schedule, _stage_shift)

    path = sys.argv[1] if len(sys.argv) > 1 else "MULTICHIP_1B_r04.json"
    want = (sys.argv[2].split(",") if len(sys.argv) > 2
            else ["build", "k10", "k100"])
    out = {"metric": "aot_1b_proof", "n": N, "topology": "v5e:2x4",
           "mesh": {"table": 4, "shard": 2, "query": 1}, "programs": {}}
    if os.path.exists(path):          # merge across invocations
        with open(path) as f:
            prev = json.load(f)
        out["programs"].update(prev.get("programs", {}))

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x4")
    devs = list(topo.devices)
    assert len(devs) == 8, devs
    mesh = make_mesh(4, 2, 1, devices=devs)
    cfg = MIHConfig(bits=128, n_tables=4)

    # ---- shapes exactly as build_sharded_compact computes them ----
    n_shards = mesh.shape["shard"]
    n_dev = mesh.shape["table"] * n_shards
    unit = n_dev * 128
    n_tot = -(-N // unit) * unit
    pbits = dir_lib.pick_range_pbits(N, cfg.s_bits, ID_ROW_BLOCK)
    pbits = max(pbits, (n_shards - 1).bit_length())
    slack = 1.2                      # uniform/clustered skew headroom
    cap_rows = int(-(-int(n_tot // n_shards * slack) // ID_ROW_BLOCK)
                   * ID_ROW_BLOCK)
    tl = cfg.n_tables // mesh.shape["table"]
    out["pbits"] = pbits
    out["cap_rows"] = cap_rows
    out["slack"] = slack

    csh = NamedSharding(mesh, P(("table", "shard"), None))
    codes_sds = jax.ShapeDtypeStruct((n_tot, cfg.n_words), jnp.uint32,
                                     sharding=csh)

    # ---- model memory accounting (DESIGN.md §3, compact column) ----
    idrow_b = cfg.n_tables * cap_rows * n_shards // n_shards * 4  # /table
    per_dev_model = (tl * cap_rows * 4                 # idrows slice
                     + tl * ((1 << pbits) // n_shards) * 2 * 4  # se slice
                     + (n_tot // n_dev) * cfg.n_words * 4)      # codes
    out["model_bytes_per_device"] = per_dev_model
    out["model_bytes_per_code"] = (per_dev_model * n_dev) / N
    del idrow_b

    # ---- 1. BUILD program ----
    if "build" in want:
        t0 = time.time()
        lowered = sc._build_compact_jit.lower(
            mesh, codes_sds, n=N, n_tot=n_tot, n_words=cfg.n_words,
            n_tables=cfg.n_tables, tl=tl, n_shards=n_shards,
            s_bits=cfg.s_bits, pbits=pbits, cap_rows=cap_rows)
        compiled = lowered.compile()
        row = mem_report(compiled, n_dev)
        row["compile_s"] = round(time.time() - t0, 1)
        out["programs"]["build_compact_1B"] = row
        print("build_compact_1B:", json.dumps(row), flush=True)

    # shapes of the built index (for the search program's inputs)
    sds = jax.eval_shape(
        lambda c: sc._build_compact_jit(
            mesh, c, n=N, n_tot=n_tot, n_words=cfg.n_words,
            n_tables=cfg.n_tables, tl=tl, n_shards=n_shards,
            s_bits=cfg.s_bits, pbits=pbits, cap_rows=cap_rows),
        codes_sds)
    idrows_s, se_s, _kept_s = sds
    tspec = "table" if mesh.shape["table"] > 1 else None
    idrows_sds = jax.ShapeDtypeStruct(
        idrows_s.shape, idrows_s.dtype,
        sharding=NamedSharding(mesh, P(tspec, "shard", None)))
    se_sds = jax.ShapeDtypeStruct(
        se_s.shape, se_s.dtype,
        sharding=NamedSharding(mesh, P(tspec, "shard", None)))
    q_sds = jax.ShapeDtypeStruct(
        (NQ, cfg.n_words), jnp.uint32,
        sharding=NamedSharding(mesh, P("query", None)))
    out["index_shapes"] = {
        "idrows": list(idrows_s.shape), "se": list(se_s.shape),
        "codes": [n_tot, cfg.n_words]}

    # ---- 2. SEARCH programs (production prologue from
    #         sharded_compact_search, search/sharded_compact.py) ----
    for k in (10, 100):
        if f"k{k}" not in want:
            continue
        scfg = SearchConfig(knn=k, candidate_cap=8192, max_enum_radius=5)
        pool_size = scfg.pool_size
        schedule = tuple(
            (r, g)
            for r, g in _radius_schedule(scfg, cfg, N, pbits, True)
            if sum(enumeration.n_masks(pbits, x) for x in g)
            <= scfg.fused_max_masks)
        if not schedule:
            out["programs"][f"search_1B_k{k}"] = {"schedule": "empty"}
            continue
        caps = tuple(_cap_for_radius(scfg, cfg, N, g, pool_size, pbits,
                                     True, ID_ROW_BLOCK)
                     for _, g in schedule)
        nq_loc = NQ // mesh.shape["query"]
        batch_caps = tuple(
            nq_loc if i == 0
            else max(64, nq_loc >> (_stage_shift(k) + 2 * (i - 1)))
            for i in range(len(schedule)))
        masks_tuple = tuple(_device_masks(pbits, g) for _, g in schedule)
        retry_caps = tuple(min(c * 2, max(scfg.candidate_cap, c))
                           for c in caps)

        def search_fn(idrows, se, codes_arr, queries, _s=schedule,
                      _c=caps, _b=batch_caps, _m=masks_tuple,
                      _r=retry_caps, _k=k, _p=pool_size):
            return sc.compact_fused_packed(
                mesh, idrows, se, codes_arr, queries, _m, schedule=_s,
                caps=_c, batch_caps=_b, n_tables=cfg.n_tables, knn=_k,
                pool_size=_p, approximate=False, s_bits=cfg.s_bits,
                pbits=pbits, n_total=N,
                retry_caps=_r if _r != _c else None,
                retry_budget=min(nq_loc, max(64, nq_loc // 4)),
                scan_budget=min(nq_loc, max(64, nq_loc // 64)))

        t0 = time.time()
        lowered = jax.jit(search_fn).lower(idrows_sds, se_sds, codes_sds,
                                           q_sds)
        compiled = lowered.compile()
        row = mem_report(compiled, n_dev)
        row["compile_s"] = round(time.time() - t0, 1)
        row["schedule"] = [[r, list(g)] for r, g in schedule]
        row["caps"] = list(caps)
        out["programs"][f"search_1B_k{k}"] = row
        print(f"search_1B_k{k}:", json.dumps(row), flush=True)

    out["ok"] = all(p.get("fits_hbm", False)
                    for p in out["programs"].values()
                    if "peak_bytes_per_device" in p)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, "ok:", out["ok"])


if __name__ == "__main__":
    main()
