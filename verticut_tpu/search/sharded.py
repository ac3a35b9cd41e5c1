"""Multi-chip MIH search over a (table, shard, query) mesh.

The distributed path of the reference — one MPI rank per substring table
probing its own hash table, per-radius ``MPI_Gatherv`` of candidates to the
master, dedup + bounded heap there, stop flag broadcast back
(``src/search_worker.cc:159-218``, ``src/mpi_coordinator.cc:34-69``) —
rebuilt as SPMD ``shard_map``:

* table ``t``'s CSR arrays live on mesh slice ``table=t``, range-partitioned
  over ``shard`` (contiguous slices of the substring-sorted rows, so each
  device's directory is just its slice of the sorted column; a bucket that
  straddles a boundary is returned piecewise and merged downstream).
* Queries are sharded over ``query`` and replicated over table/shard.
* Per radius: every device probes locally → fixed-capacity candidate
  buffers → ``all_gather`` over (table, shard) → *replicated* dedup top-k
  merge. No master rank: every device holds the same pool, the stop
  predicate is computed redundantly, and the ``bcast`` disappears.

The host driver mirrors search/single.py: python loop over radius, jitted
shard_map step, overflow retry, brute-force fallback (itself sharded).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from verticut_tpu import codes as codes_lib
from verticut_tpu.config import MIHConfig, SearchConfig
from verticut_tpu.ops import enumeration, topk
from verticut_tpu.parallel import collectives
from verticut_tpu.search.single import (SearchResult, SearchState,
                                        expand_buckets, init_state)


@dataclasses.dataclass
class ShardedMIHIndex:
    """Global-view arrays laid out over the mesh.

    ``entry_ids [m, N]``, ``entry_codes [m, N, W]``, ``keys [m, N]`` are
    sharded P("table", "shard"); ``codes [N, W]`` (for the brute-force
    fallback) is sharded P(("table", "shard")) on rows.
    """

    cfg: MIHConfig
    mesh: Mesh
    n: int
    entry_ids: jax.Array
    entry_codes: jax.Array
    codes: jax.Array
    # per-(table, shard) cuckoo hash directory over the *local* key slice
    # (index/directory.HashDirectory layout: 16B rows [key, start, count, 0],
    # starts/counts in shard-local coordinates — a bucket straddling a shard
    # boundary appears piecewise in both shards and merges downstream)
    hash_rows: jax.Array        # uint32[m, n_shards, S, 4]

    @property
    def n_shards(self) -> int:
        return self.mesh.shape["shard"]


def build_sharded_index(codes_arr, cfg: MIHConfig, mesh: Mesh
                        ) -> ShardedMIHIndex:
    """Build on host/any-device, then lay out over the mesh.

    The sort-per-table build is identical to the single-device path
    (index/mih.py); distribution is pure layout: contiguous row ranges of
    each sorted table go to the ``shard`` axis (the Pilaf
    ``hash mod server_count`` key-space split becomes a *range* split,
    which keeps buckets contiguous and directories local).
    """
    if mesh.shape["table"] not in (1, cfg.n_tables):
        raise ValueError(
            f"mesh table axis {mesh.shape['table']} != n_tables "
            f"{cfg.n_tables} (or 1)")
    codes_arr = jnp.asarray(codes_arr, jnp.uint32)
    n = codes_arr.shape[0]
    n_dev_rows = mesh.shape["shard"] * mesh.shape["table"]
    # Pad so every device slice is equal-size. Padded entries carry
    # key=0xFFFFFFFF and id=-1: if a real probe happens to equal 0xFFFFFFFF
    # the padded hits surface with id=-1, which the dedup merge already
    # treats as invalid — so padding is semantically inert.
    n_pad = (-n) % n_dev_rows  # n_shards divides n_dev_rows
    n_tot = n + n_pad
    ids = jnp.concatenate([jnp.arange(n, dtype=jnp.int32),
                           jnp.full((n_pad,), -1, jnp.int32)])
    keys_t, ids_t, codes_t = [], [], []
    for t in range(cfg.n_tables):
        subs = codes_lib.substring(codes_arr, t, cfg.s_bits)
        subs = jnp.concatenate(
            [subs, jnp.full((n_pad,), 0xFFFFFFFF, jnp.uint32)])
        sk, si_pos = jax.lax.sort(
            (subs, jnp.arange(n_tot, dtype=jnp.int32)), num_keys=2)
        si = ids[si_pos]
        keys_t.append(sk)
        ids_t.append(si)
        codes_t.append(jnp.where((si >= 0)[:, None],
                                 codes_arr[jnp.clip(si, 0, n - 1)], 0))
    entry_ids = jnp.stack(ids_t)                # [m, Ntot]
    entry_codes = jnp.stack(codes_t)            # [m, Ntot, W]
    codes_padded = jnp.concatenate(
        [codes_arr, jnp.zeros((n_pad, cfg.n_words), jnp.uint32)])

    # per-(table, shard) cuckoo directories over the local sorted slices
    # (host C++ build; same slot count everywhere so the stack is regular)
    from verticut_tpu import native
    n_shards = mesh.shape["shard"]
    n_loc = n_tot // n_shards
    keys_host = [np.asarray(kt) for kt in keys_t]
    n_slots = 8
    for kh in keys_host:
        for s in range(n_shards):
            sl = kh[s * n_loc:(s + 1) * n_loc]
            uniq = 1 if len(sl) == 0 else int((sl[1:] != sl[:-1]).sum()) + 1
            n_slots = max(n_slots, 1 << max(
                3, int(np.ceil(np.log2(max(uniq, 1) / 0.4)))))
    while True:  # a failed cuckoo build doubles its table; keep stack regular
        rows = np.zeros((cfg.n_tables, n_shards, n_slots, 4), np.uint32)
        grew = False
        for t in range(cfg.n_tables):
            for s in range(n_shards):
                tbl = native.build_hashdir(
                    keys_host[t][s * n_loc:(s + 1) * n_loc], n_slots)
                if tbl.shape[0] != n_slots:
                    n_slots = tbl.shape[0]
                    grew = True
                    break
                rows[t, s] = tbl
            if grew:
                break
        if not grew:
            break

    # replicate table dim if the mesh folds tables onto one slice
    tspec = "table" if mesh.shape["table"] == cfg.n_tables else None
    s_te = NamedSharding(mesh, P(tspec, "shard"))
    s_tc = NamedSharding(mesh, P(tspec, "shard", None))
    s_db = NamedSharding(mesh, P(("table", "shard"), None))
    return ShardedMIHIndex(
        cfg=cfg, mesh=mesh, n=n,
        entry_ids=jax.device_put(entry_ids, s_te),
        entry_codes=jax.device_put(entry_codes, s_tc),
        codes=jax.device_put(codes_padded, s_db),
        hash_rows=jax.device_put(
            jnp.asarray(rows),
            NamedSharding(mesh, P(tspec, "shard", None, None))))


# --------------------------------------------------------------------------
# Per-device radius step
# --------------------------------------------------------------------------

def _device_radius_step(entry_ids, entry_codes, hash_rows, queries, q_subs,
                        masks, state: SearchState, *, radius, n_tables,
                        n_mesh_tables, knn, cap, approximate, s_bits,
                        n_total):
    """Runs on one device inside shard_map. Local blocks:

    entry_ids [Tl, Nl], entry_codes [Tl, Nl, W], hash_rows [Tl, 1, S, 4]
    (shard-local cuckoo directory), queries [Ql, W], q_subs [Ql, m],
    state leaves [Ql, ...]. ``Tl`` = tables per device (m when the table
    axis is folded to 1).
    """
    from verticut_tpu.index.directory import HashDirectory
    gather_axes = ("table", "shard")
    t0 = jax.lax.axis_index("table")
    tl = entry_ids.shape[0]
    nl = entry_ids.shape[1]
    active = ~state.done

    all_d, all_i = [], []
    n_probe = jnp.zeros_like(state.n_probes)
    n_nonempty = jnp.zeros_like(state.n_nonempty)
    total_c = jnp.zeros_like(state.n_cands)
    overflow_l = jnp.zeros_like(state.done)
    for tt in range(tl):
        # global table id of local block tt (traced when tables are spread
        # over the mesh axis, static when folded onto one device)
        tglob = t0 * tl + tt if n_mesh_tables > 1 else tt
        my_sub = jnp.take(q_subs, tglob, axis=1)
        probes = my_sub[:, None] ^ masks[None, :]           # [Ql, C]
        # local cuckoo directory probe: 2 independent row gathers
        starts, counts = HashDirectory(hash_rows[tt, 0]).lookup(probes)
        counts = jnp.where(active[:, None], counts, 0)
        n_probe = n_probe + jnp.where(active, probes.shape[1], 0)
        n_nonempty = n_nonempty + jnp.sum((counts > 0).astype(jnp.int32), -1)

        entry, valid, total = expand_buckets(starts, counts, cap)
        entry_c = jnp.clip(entry, 0, nl - 1)
        cid = entry_ids[tt][entry_c]                         # [Ql, cap]
        ccodes = entry_codes[tt][entry_c]                    # [Ql, cap, W]
        dist = codes_lib.hamming_distance(ccodes, queries[:, None, :])
        all_d.append(jnp.where(valid, dist, topk.INF_DIST))
        all_i.append(jnp.where(valid, cid, topk.INVALID_ID))
        total_c = total_c + jnp.minimum(total, cap)
        overflow_l = overflow_l | (total > cap)

    cd = jnp.concatenate(all_d, axis=-1)
    ci = jnp.concatenate(all_i, axis=-1)
    # the MPI_Gatherv analog: fixed-capacity all-gather over ICI
    gd, gi = collectives.gather_candidates(cd, ci, gather_axes)
    if topk.can_pack(n_total - 1, queries.shape[-1] * 32):
        pd, pi = topk.merge_topk_dedup_packed(
            state.pool_dist, state.pool_id, gd, gi,
            n_dup=state.pool_dist.shape[-1] * n_tables)
    else:
        pd, pi = topk.merge_topk_dedup(state.pool_dist, state.pool_id, gd, gi)

    if approximate:
        newly_done = pi[:, -1] >= 0
    else:
        full, kth = topk.kth_stats(pd, pi, knn)
        newly_done = full & (kth <= (radius + 1) * n_tables)
    newly_done = newly_done | (radius >= s_bits)
    done = state.done | newly_done
    rad = jnp.where(state.done, state.radius, radius)

    overflow = state.overflow | collectives.reduce_any(overflow_l, gather_axes)
    n_probes = state.n_probes + collectives.reduce_sum(n_probe, gather_axes)
    n_nonempty_t = state.n_nonempty + collectives.reduce_sum(
        n_nonempty, gather_axes)
    n_cands = state.n_cands + collectives.reduce_sum(total_c, gather_axes)
    return SearchState(pool_dist=pd, pool_id=pi, done=done, radius=rad,
                       overflow=overflow, n_probes=n_probes,
                       n_nonempty=n_nonempty_t, n_cands=n_cands)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "radius", "n_tables", "knn", "cap",
                     "approximate", "s_bits", "n_total"))
def sharded_radius_step(mesh: Mesh, entry_ids, entry_codes, hash_rows,
                        queries, q_subs, masks, state: SearchState, *,
                        radius: int, n_tables: int, knn: int, cap: int,
                        approximate: bool, s_bits: int, n_total: int
                        ) -> SearchState:
    n_mesh_tables = mesh.shape["table"]
    fn = functools.partial(
        _device_radius_step, radius=radius, n_tables=n_tables,
        n_mesh_tables=n_mesh_tables, knn=knn, cap=cap,
        approximate=approximate, s_bits=s_bits, n_total=n_total)
    tspec = "table" if n_mesh_tables > 1 else None
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(tspec, "shard"), P(tspec, "shard", None),
                  P(tspec, "shard", None, None),
                  P("query", None), P("query", None), P(), P("query")),
        out_specs=SearchState(
            pool_dist=P("query"), pool_id=P("query"), done=P("query"),
            radius=P("query"), overflow=P("query"), n_probes=P("query"),
            n_nonempty=P("query"), n_cands=P("query")),
        check_vma=False,
    )(entry_ids, entry_codes, hash_rows, queries, q_subs, masks, state)


# --------------------------------------------------------------------------
# Sharded brute-force scan (fallback + oracle at scale)
# --------------------------------------------------------------------------

def _device_linear(codes_loc, queries, k, n_loc, n_total):
    from verticut_tpu.ops import hamming
    dev = jax.lax.axis_index(("table", "shard"))
    base = (dev * n_loc).astype(jnp.int32)
    d, i = hamming.scan_popcount(queries, codes_loc, k,
                                 chunk=min(65536, max(8, n_loc)))
    ig = i + base
    ok = (i >= 0) & (ig < n_total)  # mask device padding rows
    i = jnp.where(ok, ig, -1)
    d = jnp.where(ok, d, topk.INF_DIST)
    gd, gi = collectives.gather_candidates(d, i, ("table", "shard"))
    pd, pi = topk.empty_pool(queries.shape[0], k)
    return topk.merge_topk(pd, pi, gd, gi)


@functools.partial(jax.jit, static_argnames=("mesh", "k", "n_total"))
def sharded_linear_search(mesh: Mesh, codes_arr, queries, k: int,
                          n_total: Optional[int] = None):
    """Exact top-k over row-sharded codes; pools merged over ICI."""
    n_loc = codes_arr.shape[0] // (mesh.shape["table"] * mesh.shape["shard"])
    fn = functools.partial(_device_linear, k=k, n_loc=n_loc,
                           n_total=n_total or codes_arr.shape[0])
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(("table", "shard"), None), P("query", None)),
        out_specs=(P("query"), P("query")),
        check_vma=False,
    )(codes_arr, queries)


# --------------------------------------------------------------------------
# Host driver
# --------------------------------------------------------------------------

def sharded_mih_search(index: ShardedMIHIndex, queries,
                       scfg: SearchConfig = SearchConfig(),
                       _cap: Optional[int] = None) -> SearchResult:
    """Distributed batched K-NN. Same contract as search.single.mih_search."""
    cfg = index.cfg
    mesh = index.mesh
    queries = jnp.asarray(queries, jnp.uint32)
    nq = queries.shape[0]
    if nq % mesh.shape["query"] != 0:
        raise ValueError(f"query batch {nq} not divisible by query axis "
                         f"{mesh.shape['query']}")
    k, pool_size = scfg.knn, scfg.pool_size
    qsh = NamedSharding(mesh, P("query", None))
    queries = jax.device_put(queries, qsh)
    q_subs = jax.device_put(
        codes_lib.all_substrings(queries, cfg.n_tables), qsh)
    state = jax.device_put(init_state(nq, pool_size),
                           NamedSharding(mesh, P("query")))
    max_r = min(scfg.max_enum_radius, cfg.s_bits)

    for r in range(max_r + 1):
        if (r > 0 and enumeration.n_masks(cfg.s_bits, r) * cfg.n_tables
                > scfg.fallback_ratio * max(index.n, 1)):
            break
        from verticut_tpu.search.single import _cap_for_radius
        cap = _cap or _cap_for_radius(scfg, cfg, index.n, r, pool_size)
        masks = jnp.asarray(enumeration.flip_masks(cfg.s_bits, r))
        state = sharded_radius_step(
            mesh, index.entry_ids, index.entry_codes, index.hash_rows,
            queries, q_subs, masks, state, radius=r,
            n_tables=cfg.n_tables, knn=k, cap=cap,
            approximate=scfg.approximate, s_bits=cfg.s_bits,
            n_total=index.n)
        if bool(jnp.all(state.done)):
            break

    dists = np.array(state.pool_dist[:, :k])
    ids = np.array(state.pool_id[:, :k])
    radius = np.array(state.radius)
    overflow = np.asarray(state.overflow)
    not_done = ~np.asarray(state.done)

    redo = overflow & ~not_done
    base_cap = _cap or scfg.candidate_cap
    if redo.any() and base_cap < index.n:
        # pad the retry subset to the query-axis multiple
        idxs = np.nonzero(redo)[0]
        nq_ax = mesh.shape["query"]
        n_pad = (-len(idxs)) % nq_ax
        take = np.concatenate([idxs, np.repeat(idxs[:1], n_pad)])
        sub = sharded_mih_search(index, np.asarray(queries)[take], scfg,
                                 _cap=min(base_cap * 4, max(index.n, 8)))
        dists[idxs] = sub.dists[:len(idxs)]
        ids[idxs] = sub.ids[:len(idxs)]
        radius[idxs] = sub.radius[:len(idxs)]

    if not_done.any():
        idxs = np.nonzero(not_done)[0]
        # keep the query-axis batch shape: scan all, take stragglers
        ld, li = sharded_linear_search(mesh, index.codes, queries, k,
                                       n_total=index.n)
        dists[idxs] = np.asarray(ld)[idxs]
        ids[idxs] = np.asarray(li)[idxs]

    return SearchResult(dists=dists, ids=ids, radius=radius,
                        n_probes=np.asarray(state.n_probes),
                        n_nonempty=np.asarray(state.n_nonempty),
                        n_cands=np.asarray(state.n_cands))
