"""The multi-index-hashing index: per-table CSR arrays in HBM.

Replaces the reference's entire storage stack — the Pilaf cuckoo DHT with
protobuf ``Image_List`` bucket values (``Pilaf/dht.h``, ``src/pilaf_proxy.h``)
and the read-modify-write streaming build (``src/build_hash_tables.cc:25-73``,
O(bucket²) bytes per table) — with one sort per table:

    sort (substring, id)  →  entry_ids / entry_codes in bucket order
                          →  directory maps value → (start, count)

Memory parity with the reference: each table stores ``(id, full_code)`` per
entry (``src/image_search.proto:20-23`` — ``ID_Code_Pair``), i.e. m× code
duplication. ``store_codes=False`` gives the compact variant (ids only,
verify against the caller-held code array).
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from verticut_tpu import codes as codes_lib
from verticut_tpu.config import MIHConfig
from verticut_tpu.index import directory as dir_lib
from verticut_tpu.index.bitmap import Bitmap, build_bitmap


class MIHTable(NamedTuple):
    """One substring hash table (the per-MPI-rank table of the reference)."""

    # int32[N] ids in bucket order; None only for memory-tight blocked
    # builds (the ids then live in entry_rows / entry_idrows)
    entry_ids: Optional[jax.Array]
    entry_codes: Optional[jax.Array]  # uint32[N, W] full codes, or None
    directory: dir_lib.Directory
    bitmap: Optional[Bitmap]
    # Blocked (id, code) entry rows for the block-fetch engine:
    # uint32[NB, 128], one row = one BLK-entry block stored word-major
    # (lane w*BLK + r = word w of block entry r; word 0 = id, words
    # 1..W = code, rest zero pad; pad entries carry id 0xFFFFFFFF).
    # BLK = 128 // row_width, so one gathered block is exactly one
    # 128-lane vector register row: the id slice and each code word are
    # static lane slices and the whole score pipeline is lane-parallel
    # (ops/chunks.fetch_score_blocks).
    entry_rows: Optional[jax.Array] = None
    # Compact-mode variant: blocked id-only rows uint32[NBc, 32] (32 ids
    # per 128 B gather row; pad ids 0xFFFFFFFF). Candidate codes are then
    # gathered per-id from the shared id-ordered code array — 4 B/entry
    # per table instead of 32 B, at ~30 ns per candidate code gather
    # (the 100M-1B memory/speed tradeoff, DESIGN.md §3).
    entry_idrows: Optional[jax.Array] = None

    def n_entries(self, n_words: Optional[int] = None) -> int:
        """Entry count (padded upper bound for blocked layouts).

        ``n_words`` (the code word count, = ``queries.shape[-1]``) is
        required for the inline blocked layout: several row widths can
        share one lane count (e.g. 64x2 and 32x4 both fill 128 lanes), so
        inferring the block size from lanes alone silently overestimates
        for W in {3,5,6,7,8,...} — blk must come from the known word count.
        """
        if self.entry_ids is not None:
            return self.entry_ids.shape[0]
        # entry_ids dropped (memory-tight blocked build): padded count
        if self.entry_idrows is not None:
            return self.entry_idrows.shape[0] * self.entry_idrows.shape[1]
        if n_words is None:
            raise ValueError(
                "n_entries of an inline blocked table needs n_words (the "
                "lane count does not determine the block size uniquely)")
        blk = entry_block_size(n_words)
        lanes = self.entry_rows.shape[1]
        if blk * _row_width(n_words) != lanes:
            raise ValueError(
                f"entry-row lane count {lanes} does not match n_words="
                f"{n_words} (expected {blk * _row_width(n_words)})")
        return self.entry_rows.shape[0] * blk


ID_ROW_BLOCK = 32  # ids per compact-mode gather row (128 B)


ID_ROW_ALIGN = 128  # idrow-count alignment (4 blocks of 32)


def make_entry_idrows(sorted_ids: jax.Array) -> jax.Array:
    """Blocked id-only rows (compact mode; see MIHTable.entry_idrows)."""
    n = sorted_ids.shape[0]
    npad = -(-max(n, 1) // ID_ROW_ALIGN) * ID_ROW_ALIGN
    ids = jnp.full((npad,), jnp.uint32(0xFFFFFFFF))
    ids = ids.at[:n].set(sorted_ids.astype(jnp.uint32))
    return ids.reshape(npad // ID_ROW_BLOCK, ID_ROW_BLOCK)


def _row_width(n_words: int) -> int:
    """Entry-row word count: 1 id word + code words — TIGHT, no pow2
    padding. The former pow2 pad (8 words at W=4) wasted 37.5% of every
    row's bytes and HBM; tight 5-word entries pack 25 per 125-lane gather
    block (500 B, still under the flat ~16 ns/row width ceiling), which is
    both 1.56x more entries per fetched row and what makes 100M-scale
    INLINE tables fit one 16 GB chip (~8.2 GB vs 12.8 GB)."""
    return 1 + n_words


def entry_block_size(n_words: int) -> int:
    """Entries per fetch block: the largest BLK with BLK*row_width <= 128
    lanes (one gather row <= 512 B)."""
    return 128 // _row_width(n_words)


def entry_row_align(n_words: int) -> int:
    """Row-count alignment of the blocked (id, code) layout: whole blocks,
    x8 so sharded range-partitions can cut at block boundaries."""
    return entry_block_size(n_words) * 8


def make_entry_rows(sorted_ids: jax.Array, sorted_codes: jax.Array
                    ) -> jax.Array:
    """Blocked word-major (id, code) rows (see MIHTable.entry_rows).

    Assembled column-wise — id column, then one column per code word, each
    a 1-D ``[npad] -> [NB, blk]`` reshape — NOT via a ``[npad, rw]``
    transpose: 2-D reshapes of big [N, small] arrays were observed to
    relayout into (8,128)-tiled form (32x the bytes, fatal at 100M;
    CLAUDE.md layout traps), while 1-D reshapes and lane concatenation
    lower clean."""
    n, w = sorted_codes.shape
    blk = entry_block_size(w)
    align = entry_row_align(w)
    npad = -(-max(n, 1) // align) * align
    nb = npad // blk
    ids = jnp.full((npad,), jnp.uint32(0xFFFFFFFF))
    ids = ids.at[:n].set(sorted_ids.astype(jnp.uint32))
    cols = [ids.reshape(nb, blk)]
    pad = jnp.zeros((npad - n,), jnp.uint32)
    for j in range(w):
        col = sorted_codes[:, j]
        if npad > n:
            col = jnp.concatenate([col, pad])
        cols.append(col.reshape(nb, blk))
    return jnp.concatenate(cols, axis=-1)  # [NB, blk*rw]


def unblock_entry_rows(entry_rows, n_words: int):
    """Host inverse of :func:`make_entry_rows`: blocked word-major rows →
    ``(ids uint32[Npad], codes uint32[Npad, W])`` in entry (bucket) order."""
    rows = np.asarray(entry_rows)
    blk = entry_block_size(n_words)
    ids = rows[:, :blk].reshape(-1)
    codes = np.stack([rows[:, (1 + j) * blk:(2 + j) * blk].reshape(-1)
                      for j in range(n_words)], axis=-1)
    return ids, codes


@dataclasses.dataclass
class MIHIndex:
    """m per-substring tables + metadata. A host-side container of device
    arrays (each field of each table is an independent jax.Array, so tables
    can be placed on different mesh shards)."""

    cfg: MIHConfig
    tables: List[MIHTable]
    n: int                      # number of indexed codes
    codes: Optional[jax.Array]  # uint32[N, W] original id-ordered codes
    #: transposed scan copy uint32[8, Npad] (codes.transpose_scan_layout)
    #: feeding the no-relayout Pallas blockmin kernel; built on TPU only
    #: (derived — never persisted), None elsewhere
    codes_t: Optional[jax.Array] = None
    #: blocked rescore rows uint32[Npad/128, W*128]
    #: (codes.rescore_rows_layout): the scan's block rescore runs at
    #: ~20 ns per gathered 128-code row off this layout vs ~1.4 us per
    #: (block, W) slice off ``codes`` (tools/microbench_r5.py). 16 B/code
    #: extra HBM at W=4; built with codes_t up to ROWS_MAX_N, derived —
    #: never persisted.
    codes_rows: Optional[jax.Array] = None

    def table_subs(self, queries: jax.Array) -> jax.Array:
        """Substring values of a query batch for every table: [Q, m]."""
        return codes_lib.all_substrings(queries, self.cfg.n_tables)


def _make_directory(sorted_subs: jax.Array, cfg: MIHConfig,
                    dense_threshold: int, directory: str):
    if directory == "auto":
        directory = "dense" if cfg.s_bits <= dense_threshold else "range"
    if directory == "dense":
        return dir_lib.build_dense(sorted_subs, cfg.s_bits)
    if directory == "prefix":
        return dir_lib.build_prefix(sorted_subs, cfg.s_bits)
    if directory == "sorted":
        return dir_lib.build_sorted(sorted_subs)
    if directory == "hash":
        return dir_lib.build_hash(sorted_subs)
    if directory == "range":
        return dir_lib.build_range(sorted_subs, cfg.s_bits)
    raise ValueError(f"unknown directory kind {directory!r}")


import functools


@functools.partial(jax.jit, donate_argnums=(0,))
def _sort_pairs_jit(subs):
    """Stable (substring, id) sort — its own program so the sort scratch
    (~2x N) is freed before row assembly allocates (AOT-measured: the
    fused one-program build peaked 14 GB at 100M; split + chunked
    assembly peaks ~5 GB)."""
    n = subs.shape[0]
    ids = jnp.arange(n, dtype=jnp.int32)
    return jax.lax.sort((subs, ids), num_keys=2)


def _assembly_chunks(npad: int, align: int,
                     target: int = 5_000_000) -> Tuple[int, int]:
    """(chunk_rows, padded_total): ~``target``-entry assembly chunks,
    chunk a multiple of ``align`` (whole blocks), total = chunks * chunk
    (>= npad; the extra rows carry invalid ids and sit beyond every
    directory range)."""
    n_chunks = max(1, -(-npad // target))
    ch = -(-(-(-npad // n_chunks)) // align) * align
    return ch, ch * n_chunks


@functools.partial(
    jax.jit, static_argnames=("s_bits", "pbits", "store_codes"))
def _rows_dir_jit(codes_arr, sorted_subs, sorted_ids, *, s_bits: int,
                  pbits: int, store_codes: bool):
    """Range-directory offsets + blocked entry rows from the sorted
    columns — ONE device program shared by every table (the substring
    column is an argument, so table_id never specializes the program).

    The blocked rows are assembled in ~5M-entry chunks inside a
    ``fori_loop`` writing into the output: assembling whole-array
    word-major columns materializes each [NB, blk] column lane-padded to
    128 (5 x 2 GB of temps at 100M — AOT-measured 9.9 GB; the
    reshape+transpose form measured 11.9 GB), while per-chunk assembly
    bounds the padded temps at the chunk size (0.85 GB)."""
    n = codes_arr.shape[0]
    w = codes_arr.shape[1]
    shift = s_bits - pbits
    prefixes = (sorted_subs >> jnp.uint32(shift)).astype(jnp.uint32)
    grid = jnp.arange((1 << pbits) + 1, dtype=jnp.int32).astype(jnp.uint32)
    offs = jnp.searchsorted(prefixes, grid, side="left").astype(jnp.int32)
    se = jnp.stack([offs[:-1], offs[1:]], axis=-1)
    if not store_codes:
        return se, make_entry_idrows(sorted_ids)
    blk = entry_block_size(w)
    align = entry_row_align(w)
    npad0 = -(-max(n, 1) // align) * align
    ch, npad = _assembly_chunks(npad0, align)
    nb = npad // blk
    nbc = ch // blk
    ids_p = jnp.full((npad,), jnp.uint32(0xFFFFFFFF))
    ids_p = ids_p.at[:n].set(sorted_ids.astype(jnp.uint32))

    def body(c, out):
        idc = jax.lax.dynamic_slice(ids_p, (c * ch,), (ch,))
        g = codes_arr[jnp.clip(idc, 0, n - 1).astype(jnp.int32)]
        g = jnp.where((idc != jnp.uint32(0xFFFFFFFF))[:, None], g, 0)
        cols = [idc.reshape(nbc, blk)]
        cols += [g[:, j].reshape(nbc, blk) for j in range(w)]
        return jax.lax.dynamic_update_slice(
            out, jnp.concatenate(cols, axis=-1), (c * nbc, 0))

    out = jnp.zeros((nb, blk * _row_width(w)), jnp.uint32)
    return se, jax.lax.fori_loop(0, npad // ch, body, out)


def _build_table(codes_arr: jax.Array, table_id: int, cfg: MIHConfig,
                 dense_threshold: int, store_codes: bool,
                 with_bitmap: bool, directory: str,
                 keep_entry_ids: bool = True) -> MIHTable:
    n = codes_arr.shape[0]
    if directory == "auto":
        directory = "dense" if cfg.s_bits <= dense_threshold else "range"
    if directory == "range" and not with_bitmap:
        pbits = dir_lib.pick_range_pbits(
            n, cfg.s_bits,
            entry_block_size(cfg.n_words) if store_codes else ID_ROW_BLOCK)
        subs = codes_lib.substring(codes_arr, table_id, cfg.s_bits)
        sorted_subs, sorted_ids = _sort_pairs_jit(subs)
        se, rows = _rows_dir_jit(codes_arr, sorted_subs, sorted_ids,
                                 s_bits=cfg.s_bits, pbits=pbits,
                                 store_codes=store_codes)
        d = dir_lib.RangeDirectory(se=se, s_bits=cfg.s_bits)
        return MIHTable(entry_ids=sorted_ids if keep_entry_ids else None,
                        entry_codes=None,
                        directory=d, bitmap=None,
                        entry_rows=rows if store_codes else None,
                        entry_idrows=None if store_codes else rows)
    subs = codes_lib.substring(codes_arr, table_id, cfg.s_bits)
    ids = jnp.arange(n, dtype=jnp.int32)
    # Stable (substring, id) sort: bucket-internal id order matches the
    # reference's sequential-append order (build_hash_tables.cc:54-63).
    sorted_subs, sorted_ids = jax.lax.sort((subs, ids), num_keys=2)
    d = _make_directory(sorted_subs, cfg, dense_threshold, directory)
    entry_codes = entry_rows = entry_idrows = None
    if isinstance(d, dir_lib.RangeDirectory):
        if store_codes:
            entry_rows = make_entry_rows(sorted_ids, codes_arr[sorted_ids])
        else:
            entry_idrows = make_entry_idrows(sorted_ids)
    elif store_codes:
        entry_codes = codes_arr[sorted_ids]
    bmp = build_bitmap(sorted_subs, cfg.s_bits) if with_bitmap else None
    return MIHTable(entry_ids=sorted_ids, entry_codes=entry_codes,
                    directory=d, bitmap=bmp, entry_rows=entry_rows,
                    entry_idrows=entry_idrows)


def build_index(codes_arr, cfg: MIHConfig = MIHConfig(),
                dense_threshold: int = 24, store_codes: bool = True,
                with_bitmap: bool = False, keep_codes: bool = True,
                directory: str = "auto",
                keep_entry_ids: bool = True,
                scan_copy: Optional[bool] = None) -> MIHIndex:
    """Build the full m-table index on device.

    ``codes_arr``: ``uint32[N, W]`` packed codes, row i = image id i
    (ids are implicit sequential, as in the reference's streaming build).
    ``directory``: auto | dense | prefix | sorted | hash (auto = dense for
    narrow substrings, cuckoo hash rows otherwise).
    ``keep_entry_ids=False`` drops the per-table flat id column (4 B/entry
    duplicated inside the blocked rows) — the memory-tight option for
    100M+ range-engine builds; only the legacy bucket engine and
    integrity tooling need the flat column.
    ``scan_copy``: also keep the transposed scan copy ``codes_t`` (32
    B/code, feeds the no-relayout Pallas blockmin scan — the engine for
    scan-dominated workloads). Default: on TPU whenever codes are kept.
    """
    codes_arr = jnp.asarray(codes_arr, dtype=jnp.uint32)
    if codes_arr.shape[-1] != cfg.n_words:
        raise ValueError(
            f"codes have {codes_arr.shape[-1]} words, config wants {cfg.n_words}")
    tables = [
        _build_table(codes_arr, t, cfg, dense_threshold, store_codes,
                     with_bitmap, directory, keep_entry_ids)
        for t in range(cfg.n_tables)
    ]
    codes_t = _maybe_scan_copy(codes_arr, keep_codes, scan_copy)
    return MIHIndex(cfg=cfg, tables=tables, n=codes_arr.shape[0],
                    codes=codes_arr if keep_codes else None,
                    codes_t=codes_t,
                    codes_rows=_maybe_rescore_rows(codes_t, cfg.n_words,
                                                   codes_arr.shape[0]))


def _maybe_scan_copy(codes_arr: jax.Array, keep_codes: bool,
                     scan_copy: Optional[bool]) -> Optional[jax.Array]:
    """codes_t policy: explicit flag wins; auto = TPU and codes kept (the
    scan engines rescore off the row-major array, so both must exist)."""
    if scan_copy is None:
        scan_copy = keep_codes and jax.devices()[0].platform == "tpu"
    if not (scan_copy and keep_codes):
        return None
    return codes_lib.transpose_scan_layout(codes_arr)


#: largest corpus that also keeps the blocked rescore rows (16 B/code at
#: W=4 on top of codes 16 + codes_t 32): at 100M the inline index + scan
#: copies already sit ~13 GB of the 15.75 GB HBM and the scan's fold
#: temps need the rest, so the 100M cells keep the slice-gather rescore
#: (rescore there is ~13% of the 1.06 s GEMM floor anyway).
ROWS_MAX_N = 48_000_000


def _maybe_rescore_rows(codes_t: Optional[jax.Array], n_words: int,
                        n: int) -> Optional[jax.Array]:
    if codes_t is None or n > ROWS_MAX_N:
        return None
    return codes_lib.rescore_rows_layout(codes_t, n_words)


# --------------------------------------------------------------------------
# Persistence — the checkpoint analog of the Pilaf op log
# (Pilaf/store-server.cc:58-94); we persist the built artifact instead of a
# replayable mutation log because the index is build-then-freeze.
# --------------------------------------------------------------------------

def save_index(path: str, index: MIHIndex) -> None:
    # one batched device->host pull (per-array np.asarray round-trips are
    # painfully slow through a remote-device tunnel)
    tables, codes_host = jax.device_get((tuple(index.tables), index.codes))
    arrs = {"n": np.asarray(index.n), "bits": np.asarray(index.cfg.bits),
            "n_tables": np.asarray(index.cfg.n_tables)}
    if codes_host is not None:
        arrs["codes"] = np.asarray(codes_host)
    for t, tab in enumerate(tables):
        if tab.entry_ids is not None:
            arrs[f"t{t}_ids"] = np.asarray(tab.entry_ids)
        if tab.entry_codes is not None:
            arrs[f"t{t}_codes"] = np.asarray(tab.entry_codes)
        if tab.entry_rows is not None:
            arrs[f"t{t}_rows"] = np.asarray(tab.entry_rows)
        if tab.entry_idrows is not None:
            arrs[f"t{t}_idrows"] = np.asarray(tab.entry_idrows)
        if isinstance(tab.directory, dir_lib.DenseDirectory):
            arrs[f"t{t}_offsets"] = np.asarray(tab.directory.offsets)
        elif isinstance(tab.directory, dir_lib.HashDirectory):
            arrs[f"t{t}_hashrows"] = np.asarray(tab.directory.rows)
        elif isinstance(tab.directory, dir_lib.RangeDirectory):
            arrs[f"t{t}_se"] = np.asarray(tab.directory.se)
        else:  # Sorted/Prefix: the sorted key column is the whole state
            arrs[f"t{t}_keys"] = np.asarray(tab.directory.keys)
        if tab.bitmap is not None:
            arrs[f"t{t}_bitmap"] = np.asarray(tab.bitmap.words)
    np.savez(path, **arrs)


def load_index(path: str) -> MIHIndex:
    z = np.load(path)
    cfg = MIHConfig(bits=int(z["bits"]), n_tables=int(z["n_tables"]))
    tables = []
    for t in range(cfg.n_tables):
        if f"t{t}_offsets" in z:
            d = dir_lib.DenseDirectory(offsets=jnp.asarray(z[f"t{t}_offsets"]))
        elif f"t{t}_hashrows" in z:
            d = dir_lib.HashDirectory(rows=jnp.asarray(z[f"t{t}_hashrows"]))
        elif f"t{t}_se" in z:
            d = dir_lib.RangeDirectory(se=jnp.asarray(z[f"t{t}_se"]),
                                       s_bits=cfg.s_bits)
        else:
            d = dir_lib.build_prefix(jnp.asarray(z[f"t{t}_keys"]), cfg.s_bits)
        bmp = (Bitmap(words=jnp.asarray(z[f"t{t}_bitmap"]))
               if f"t{t}_bitmap" in z else None)
        ec = (jnp.asarray(z[f"t{t}_codes"]) if f"t{t}_codes" in z else None)
        er = (jnp.asarray(z[f"t{t}_rows"]) if f"t{t}_rows" in z else None)
        if er is not None:
            want = entry_block_size(cfg.n_words) * _row_width(cfg.n_words)
            if er.shape[1] != want:
                raise ValueError(
                    f"saved entry_rows have {er.shape[1]} lanes; this "
                    f"build expects {want} (tight blocked layout) — "
                    f"rebuild the index from codes")
        eir = (jnp.asarray(z[f"t{t}_idrows"]) if f"t{t}_idrows" in z
               else None)
        ei = (jnp.asarray(z[f"t{t}_ids"]) if f"t{t}_ids" in z else None)
        tables.append(MIHTable(entry_ids=ei, entry_codes=ec, directory=d,
                               bitmap=bmp, entry_rows=er, entry_idrows=eir))
    codes_arr = jnp.asarray(z["codes"]) if "codes" in z else None
    codes_t = (_maybe_scan_copy(codes_arr, True, None)
               if codes_arr is not None else None)
    return MIHIndex(cfg=cfg, tables=tables, n=int(z["n"]), codes=codes_arr,
                    codes_t=codes_t,
                    codes_rows=_maybe_rescore_rows(codes_t, cfg.n_words,
                                                   int(z["n"])))
