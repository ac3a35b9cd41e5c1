"""Batched bounded top-k with id-dedup — the TPU analog of the reference's
master-side ``std::map`` dedup + bounded ``std::priority_queue``
(``src/search_worker.cc:179-198``).

State is a fixed-shape *pool* per query: ``(dist int32[Q, P], id int32[Q, P])``
kept sorted ascending by ``(dist, id)``; empty slots hold ``id = -1`` and
``dist = INF``. Merging new candidates is two ``lax.sort`` passes:

1. sort by id → mark adjacent duplicates invalid (a candidate id always
   carries the same distance — Hamming distance is a pure function of
   (query, id) — so "first seen wins" in the reference and "any copy wins"
   here produce identical pools);
2. sort by (dist, id) → keep the first P.

Both sorts are multi-key ``lax.sort`` calls, batched over Q on the last axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF_DIST = jnp.int32(0x7FFFFFFF)
INVALID_ID = jnp.int32(-1)
_UMAX = jnp.uint32(0xFFFFFFFF)


def empty_pool(n_queries: int, pool_size: int):
    """Fresh pool: all slots invalid."""
    return (jnp.full((n_queries, pool_size), INF_DIST, jnp.int32),
            jnp.full((n_queries, pool_size), INVALID_ID, jnp.int32))


def merge_topk_dedup(pool_dist: jax.Array, pool_id: jax.Array,
                     cand_dist: jax.Array, cand_id: jax.Array):
    """Merge candidates into the pool, dropping duplicate ids.

    ``pool_*: [Q, P]``, ``cand_*: [Q, C]`` (invalid candidates: id = -1).
    Returns the new ``(pool_dist, pool_id)``, sorted ascending by (dist, id).
    """
    p = pool_dist.shape[-1]
    idk = jnp.concatenate([pool_id, cand_id], axis=-1).astype(jnp.uint32)
    d = jnp.concatenate([pool_dist, cand_dist], axis=-1)
    d = jnp.where(idk == _UMAX, INF_DIST, d)

    # Pass 1: group by id, invalidate all but the first copy.
    idk, d = jax.lax.sort((idk, d), num_keys=2)
    dup = jnp.concatenate(
        [jnp.zeros_like(idk[..., :1], jnp.bool_),
         (idk[..., 1:] == idk[..., :-1]) & (idk[..., 1:] != _UMAX)], axis=-1)
    idk = jnp.where(dup, _UMAX, idk)
    d = jnp.where(dup, INF_DIST, d)

    # Pass 2: order by (dist, id), truncate to pool size.
    d, idk = jax.lax.sort((d, idk), num_keys=2)
    d, idk = d[..., :p], idk[..., :p]
    return d, jnp.where(idk == _UMAX, INVALID_ID, idk.astype(jnp.int32))


PACKED_ID_BITS = 24  # ids < 2^24 and dist < 2^8 pack into one uint32


def can_pack(max_id: int, max_dist: int) -> bool:
    # strict: the all-ones packed key is reserved as the invalid sentinel
    return max_id < (1 << PACKED_ID_BITS) and max_dist < (
        1 << (32 - PACKED_ID_BITS)) - 1


def merge_topk_dedup_packed(pool_dist: jax.Array, pool_id: jax.Array,
                            cand_dist: jax.Array, cand_id: jax.Array,
                            n_dup: int, block: int = 2048):
    """Fast-path merge for ids < 2^24 and dist ≤ 255.

    Packs (dist, id) into one uint32 key ``dist<<24 | id``, so duplicates of
    an id are *bitwise identical* keys (Hamming distance is a pure function
    of the id). One ``lax.top_k`` over the bit-inverted keys selects the
    smallest ``P + n_dup`` pairs; duplicates land adjacent in its sorted
    output and are compacted with a cumsum-scatter. ``n_dup`` must bound the
    duplicate copies that can ride along with the P winners — each id has at
    most one copy per table per radius plus one in the pool, so callers pass
    ``P * n_tables``. ~4x faster than the two-pass multi-key sort.

    Wide candidate sets are pre-reduced blockwise (``lax.top_k`` on TPU is a
    full sort of the axis, so hierarchical beats flat past ~2 blocks — and
    narrower blocks sort cheaper: 512 measured ~2x faster than 2048 at
    [8192, 32k]): each ``block``-wide slice keeps its top ``P + n_dup``
    keys — a superset of its members in the global top ``P + n_dup`` (dups
    of a winner included, since per-block top-m keeps any key ≥ the global
    m-th) — exactness preserved.
    """
    p = pool_dist.shape[-1]
    inv0 = jnp.uint32(0)  # inverted INF: top_k picks largest inverted keys
    shift = jnp.uint32(PACKED_ID_BITS)
    kp = jnp.where(pool_id >= 0,
                   ~((pool_dist.astype(jnp.uint32) << shift)
                     | pool_id.astype(jnp.uint32)), inv0)
    kc = jnp.where(cand_id >= 0,
                   ~((cand_dist.astype(jnp.uint32) << shift)
                     | cand_id.astype(jnp.uint32)), inv0)
    m_blk = min(p + n_dup, block)
    c = kc.shape[-1]
    if c > 2 * block and m_blk < block:
        q = kc.shape[0]
        nb = -(-c // block)
        if nb * block != c:
            kc = jnp.pad(kc, ((0, 0), (0, nb * block - c)),
                         constant_values=0)
        kc = jax.lax.top_k(kc.reshape(q, nb, block), m_blk)[0] \
            .reshape(q, nb * m_blk)
    keys = jnp.concatenate([kp, kc], axis=-1)
    width = keys.shape[-1]
    m = min(p + n_dup, width)
    top = jax.lax.top_k(keys, m)[0]       # descending inverted = asc packed
    dup = jnp.concatenate(
        [jnp.zeros_like(top[..., :1], jnp.bool_),
         (top[..., 1:] == top[..., :-1]) & (top[..., 1:] != inv0)], axis=-1)
    # compact survivors: invalidate dups, then one more top_k — a scatter
    # compaction compiles/runs pathologically at the wide pools of
    # approximate mode (k*20), while top_k over the already-selected m is
    # cheap at any width
    top = jnp.where(dup, inv0, top)
    kk = min(p, m)
    out = jax.lax.top_k(top, kk)[0]
    if kk < p:
        out = jnp.pad(out, ((0, 0), (0, p - kk)), constant_values=0)
    packed = ~out
    invalid = out == inv0
    pid = jnp.where(invalid, INVALID_ID,
                    (packed & jnp.uint32((1 << PACKED_ID_BITS) - 1))
                    .astype(jnp.int32))
    pd = jnp.where(invalid, INF_DIST,
                   (packed >> shift).astype(jnp.int32))
    return pd, pid


def merge_topk(pool_dist: jax.Array, pool_id: jax.Array,
               cand_dist: jax.Array, cand_id: jax.Array):
    """Merge without dedup (linear-scan path: ids are unique by construction)."""
    p = pool_dist.shape[-1]
    idk = jnp.concatenate([pool_id, cand_id], axis=-1).astype(jnp.uint32)
    d = jnp.concatenate([pool_dist, cand_dist], axis=-1)
    d = jnp.where(idk == _UMAX, INF_DIST, d)
    d, idk = jax.lax.sort((d, idk), num_keys=2)
    d, idk = d[..., :p], idk[..., :p]
    return d, jnp.where(idk == _UMAX, INVALID_ID, idk.astype(jnp.int32))


def chunk_topk(dists: jax.Array, ids: jax.Array, k: int,
               block: int = 2048):
    """Per-chunk bounded top-k, hierarchical.

    ``dists: int32[Q, T]``, ``ids: int32[Q or 1, T]`` → ``([Q, k], [Q, k])``.

    ``lax.top_k`` lowers to a full sort on TPU, so a single top-k over a
    wide chunk (T ~ 64k) dominates the whole scan. Instead: blockwise top-k
    (each block's winners are a superset of its global-top-k members —
    exactness preserved), then a final top-k over the concatenated winners.
    Ties at the threshold resolve to the lowest position (ascending id for
    id-ordered chunks) at both levels — the same (dist, id) lexicographic
    selection the sort-based merge uses.
    """
    t = dists.shape[-1]
    ids_b = jnp.broadcast_to(ids, dists.shape)
    if t > 2 * block and t % block == 0 and k <= block:
        q = dists.shape[0]
        nb = t // block
        db = dists.reshape(q, nb, block)
        ib = ids_b.reshape(q, nb, block)
        neg, idx = jax.lax.top_k(-db, k)               # [Q, nb, k]
        sel = jnp.take_along_axis(ib, idx, axis=-1)
        dists = (-neg).reshape(q, nb * k)
        ids_b = sel.reshape(q, nb * k)
        t = nb * k
    kk = min(k, t)
    neg, idx = jax.lax.top_k(-dists, kk)
    sel = jnp.take_along_axis(ids_b, idx, axis=-1)
    d = -neg
    if kk < k:
        pad = k - kk
        d = jnp.pad(d, ((0, 0), (0, pad)), constant_values=int(INF_DIST))
        sel = jnp.pad(sel, ((0, 0), (0, pad)), constant_values=-1)
    d = jnp.where(sel < 0, INF_DIST, d)
    return d, sel


def merge_topk_packed(pool_dist: jax.Array, pool_id: jax.Array,
                      cand_dist: jax.Array, cand_id: jax.Array):
    """No-dedup merge via one uint32-packed ``lax.top_k``.

    Requires ``can_pack`` bounds (ids < 2^24, dist <= 254). A multi-key
    ``lax.sort`` on TPU costs ~30 ms even for a [1024, 200] operand (the
    variadic-sort lowering); ``top_k`` on the same shape is microseconds.
    """
    p = pool_dist.shape[-1]
    shift = jnp.uint32(PACKED_ID_BITS)
    kp = jnp.where(pool_id >= 0,
                   ~((pool_dist.astype(jnp.uint32) << shift)
                     | pool_id.astype(jnp.uint32)), jnp.uint32(0))
    kc = jnp.where(cand_id >= 0,
                   ~((cand_dist.astype(jnp.uint32) << shift)
                     | cand_id.astype(jnp.uint32)), jnp.uint32(0))
    keys = jnp.concatenate([kp, kc], axis=-1)
    top = jax.lax.top_k(keys, p)[0]
    packed = ~top
    invalid = top == jnp.uint32(0)
    pid = jnp.where(invalid, INVALID_ID,
                    (packed & jnp.uint32((1 << PACKED_ID_BITS) - 1))
                    .astype(jnp.int32))
    pd = jnp.where(invalid, INF_DIST, (packed >> shift).astype(jnp.int32))
    return pd, pid


def chunk_topk_affine(dists: jax.Array, base, k: int, n_valid,
                      block: int = 2048):
    """Hierarchical chunk top-k for position-affine ids (id = base + pos).

    Avoids all bulk id gathers: blockwise ``top_k`` indices *are* the
    in-block positions, so candidate ids come from arithmetic on the
    returned indices (a take_along_axis with computed indices costs
    ~30 ns/element in random-gather latency — it was 100 ms per 64k-chunk,
    the entire scan bottleneck). Blockwise-then-merge also beats both a
    flat ``lax.top_k`` (~4x) and ``lax.approx_min_k`` at recall 1.0 (~2x)
    on TPU, measured at [1024, 65536] k=100.
    ``dists: int32[Q, T]``; positions >= n_valid are invalid.
    """
    q, t = dists.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    dists = jnp.where(pos < n_valid, dists, INF_DIST)
    if t > 2 * block and t % block == 0 and k <= block:
        nb = t // block
        db = dists.reshape(q, nb, block)
        neg, idx = jax.lax.top_k(-db, k)                    # [Q, nb, k]
        block_base = (jnp.arange(nb, dtype=jnp.int32) * block)[None, :, None]
        ids1 = (block_base + idx).reshape(q, nb * k)        # in-chunk pos
        d1 = (-neg).reshape(q, nb * k)
    else:
        d1 = dists
        ids1 = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, t), 1), (q, t))
    kk = min(k, d1.shape[-1])
    neg, idx2 = jax.lax.top_k(-d1, kk)
    d = -neg
    sel = jnp.take_along_axis(ids1, idx2, axis=-1)          # only [Q, k]
    if kk < k:
        d = jnp.pad(d, ((0, 0), (0, k - kk)), constant_values=int(INF_DIST))
        sel = jnp.pad(sel, ((0, 0), (0, k - kk)), constant_values=-1)
    invalid = d >= INF_DIST
    gids = jnp.where(invalid, INVALID_ID, base + sel)
    return jnp.where(invalid, INF_DIST, d), gids


def kth_stats(pool_dist: jax.Array, pool_id: jax.Array, k: int):
    """(pool has >= k valid entries, distance of the kth entry) per query."""
    full = pool_id[..., k - 1] >= 0
    return full, pool_dist[..., k - 1]
