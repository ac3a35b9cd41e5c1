"""Packed binary-code arrays and bit manipulation.

A binary code of B bits is stored as ``uint32[B//32]`` words, word ``w``
holding bytes ``4w..4w+3`` of the on-disk code in little-endian order. This
makes word ``t`` of a 128-bit code exactly the reference's substring value
``binaryToInt(code + t*4, 4)`` (``Pilaf/image_tools.h:12-18``: little-endian
byte composition), so bucket indices here match the C++ index bit-for-bit.

All functions are jit-safe and shape-polymorphic over leading batch dims.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Packing / unpacking (host-side helpers use numpy; device fns use jnp)
# --------------------------------------------------------------------------

def pack_bytes(raw: np.ndarray) -> np.ndarray:
    """Pack ``uint8[N, nbytes]`` code bytes into ``uint32[N, nbytes//4]``.

    Byte ``4w+j`` becomes bits ``8j..8j+7`` of word ``w`` (little-endian,
    matching ``binaryToInt``'s composition order).
    """
    raw = np.asarray(raw, dtype=np.uint8)
    if raw.ndim == 1:
        raw = raw[None]
    n, nbytes = raw.shape
    if nbytes % 4:
        raise ValueError(f"code byte length {nbytes} not a multiple of 4")
    b = raw.reshape(n, nbytes // 4, 4).astype(np.uint32)
    # shift-or, not a matmul: numpy integer matmul has no BLAS kernel and
    # is ~50x slower at corpus scale
    return b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)


def unpack_to_bytes(words: np.ndarray) -> np.ndarray:
    """Inverse of :func:`pack_bytes`: ``uint32[N, W]`` → ``uint8[N, 4W]``."""
    words = np.asarray(words, dtype=np.uint32)
    shifts = np.array([0, 8, 16, 24], dtype=np.uint32)
    b = (words[..., None] >> shifts) & np.uint32(0xFF)
    return b.reshape(*words.shape[:-1], words.shape[-1] * 4).astype(np.uint8)


def random_codes(seed: int, n: int, bits: int = 128) -> np.ndarray:
    """Uniform random packed codes ``uint32[n, bits//32]`` (host-side)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 32, size=(n, bits // 32), dtype=np.uint32)


def clustered_codes(seed: int, n: int, bits: int = 128,
                    n_clusters: int = 64, flip_p: float = 0.05) -> np.ndarray:
    """Codes clustered around random centers — a more realistic (LSH-like)
    distribution than uniform for recall/latency testing.

    Chunked, byte-granular generation: each bit flips with probability
    round(flip_p*256)/256, so 100M-scale corpora generate at memory
    bandwidth instead of materializing n*bits float64 randoms.
    """
    rng = np.random.default_rng(seed)
    nbytes = bits // 8
    w = nbytes // 4
    centers = pack_bytes(
        rng.integers(0, 256, size=(n_clusters, nbytes), dtype=np.uint8))
    assign = rng.integers(0, n_clusters, size=n)
    out = centers[assign].copy()           # uint32[n, w]
    # sample flip positions: Binomial count per row, positions with
    # replacement, XOR-scattered into the packed words (duplicate positions
    # cancel; at p<=0.05 the effective rate differs from Bernoulli by
    # O(p^2), irrelevant for benchmarking)
    counts = rng.binomial(bits, flip_p, size=n)
    total = int(counts.sum())
    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    pos = rng.integers(0, bits, size=total)
    flat = out.reshape(-1)
    idx = row * w + (pos >> 5)
    vals = (np.uint32(1) << (pos & 31)).astype(np.uint32)
    # grouped XOR via sort+reduceat (ufunc.at is ~100x slower)
    order = np.argsort(idx, kind="stable")
    sidx, svals = idx[order], vals[order]
    starts = np.flatnonzero(np.concatenate(
        [[True], sidx[1:] != sidx[:-1]]))
    if len(sidx):
        flat[sidx[starts]] ^= np.bitwise_xor.reduceat(svals, starts)
    return out


def clustered_codes_device(seed: int, n: int, bits: int = 128,
                           n_clusters: int = 64,
                           flip_p: float = 0.05) -> jax.Array:
    """Device-side clustered-code generator (same distribution family as
    :func:`clustered_codes`: random centers, per-bit Bernoulli flips at
    round(flip_p*256)/256).

    Exists because host->HBM uploads run at ~5 MB/s through this rig's
    remote-device relay (CLAUDE.md) — at 100M codes the corpus must be
    *born* on device (1.6 GB would otherwise take ~5 minutes to ship).
    """
    import functools

    import jax.random as jr
    w = bits // 32
    thresh = max(1, round(flip_p * 256))
    chunk = min(n, 4 * 1024 * 1024)
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk

    # ONE jitted program: chunked fori_loop writing into the output carry.
    # Chunking bounds the [R, bits] random-byte transient; doing it inside
    # a single program (rather than eager per-chunk calls) keeps the big
    # [n, w] array in its compact layout — eager-op boundaries were
    # observed to insert lane-padded relayout copies (32x bytes at w=4,
    # fatal at 100M).
    @functools.partial(jax.jit, static_argnames=("rows", "total"))
    def gen_all(key, rows, total):
        k0, k1 = jr.split(key)
        centers = jr.bits(k0, (n_clusters, w), jnp.uint32)
        keys = jr.split(k1, total // rows)
        shifts = jnp.arange(32, dtype=jnp.uint32)

        def body(i, out):
            ka, kb = jr.split(keys[i])
            assign = jr.randint(ka, (rows,), 0, n_clusters, jnp.int32)
            base = centers[assign]                           # [R, w]
            # per-bit Bernoulli(thresh/256) via one random byte per bit
            rb = jr.randint(kb, (rows, bits), 0, 256, jnp.uint8)
            fb = (rb < thresh).astype(jnp.uint32).reshape(rows, w, 32)
            part = base ^ jnp.sum(fb << shifts, axis=-1, dtype=jnp.uint32)
            return jax.lax.dynamic_update_slice(
                out, part, (i * rows, 0))

        out = jnp.zeros((total, w), jnp.uint32)
        return jax.lax.fori_loop(0, total // rows, body, out)

    out = gen_all(jr.PRNGKey(seed), chunk, n_pad)
    return out if n_pad == n else out[:n]


# --------------------------------------------------------------------------
# Substring extraction (the hash-table bucket index)
# --------------------------------------------------------------------------

def substring(codes: jax.Array, table_id: int, s_bits: int) -> jax.Array:
    """Extract substring ``table_id`` (width ``s_bits``) from packed codes.

    Reference semantics: ``binaryToInt(code + table_id*substr_len, substr_len)``
    (``src/build_hash_tables.cc:45``, ``src/search_worker.cc:101``): take
    ``s_bits//8`` consecutive bytes starting at byte ``table_id*s_bits//8``,
    compose little-endian. ``s_bits`` must be a multiple of 8 and ≤ 32.

    Works on any ``uint32[..., W]`` array; returns ``uint32[...]``.
    """
    if s_bits % 8 or s_bits > 32:
        raise ValueError(f"s_bits must be a multiple of 8 and <= 32: {s_bits}")
    if s_bits == 32:
        return codes[..., table_id]
    s_bytes = s_bits // 8
    start = table_id * s_bytes
    val = jnp.zeros(codes.shape[:-1], jnp.uint32)
    for j in range(s_bytes):
        byte_idx = start + j
        word = codes[..., byte_idx // 4]
        byte = (word >> jnp.uint32((byte_idx % 4) * 8)) & jnp.uint32(0xFF)
        val = val | (byte << jnp.uint32(8 * j))
    return val


def all_substrings(codes: jax.Array, n_tables: int) -> jax.Array:
    """``uint32[..., W] -> uint32[..., n_tables]``: every table's substring."""
    s_bits = codes.shape[-1] * 32 // n_tables
    return jnp.stack(
        [substring(codes, t, s_bits) for t in range(n_tables)], axis=-1)


# --------------------------------------------------------------------------
# Hamming distance (XOR + popcount; Pilaf/image_tools.h:21-33)
# --------------------------------------------------------------------------

def hamming_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise Hamming distance between packed codes.

    Broadcasts over leading dims; reduces the trailing word dim.
    ``uint32[..., W] x uint32[..., W] -> int32[...]``.
    """
    x = jax.lax.population_count(a ^ b)
    return jnp.sum(x.astype(jnp.int32), axis=-1)


def pairwise_hamming(queries: jax.Array, db: jax.Array) -> jax.Array:
    """All-pairs Hamming distance: ``[Q, W] x [N, W] -> int32[Q, N]``.

    Materializes ``[Q, N, W]``; callers chunk N (see search/linear.py).
    """
    return hamming_distance(queries[:, None, :], db[None, :, :])


# --------------------------------------------------------------------------
# MXU formulation: dist = (B - <±1 bits, ±1 bits>) / 2
# --------------------------------------------------------------------------

def unpack_bits_pm1(codes: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Unpack ``uint32[..., W]`` to ``±1`` vectors ``[..., 32W]``.

    Bit k of word w (LSB-first) lands at position ``32w + k``. Feeding these
    to a matmul gives ``dot = B - 2*hamming``, turning the linear scan into an
    MXU-bound GEMM (B=128 matches the 128-wide systolic array exactly).
    """
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (codes[..., None] >> shifts) & jnp.uint32(1)
    bits = bits.reshape(*codes.shape[:-1], codes.shape[-1] * 32)
    return (2 * bits.astype(jnp.int32) - 1).astype(dtype)


#: transposed-scan-copy padding: the code count is padded to a
#: SCAN_PAD_UNIT multiple (= 128*block for every supported blockmin block
#: size), and past one SCAN_CHUNK to a SCAN_CHUNK multiple so
#: ops/hamming.scan_blockmin_t's chunked fold never clamp-overlaps its
#: dynamic_slice (worst-case waste < SCAN_CHUNK codes = 128 MB).
SCAN_PAD_UNIT = 128 * 512
SCAN_CHUNK = 4 * 1024 * 1024


@jax.jit
def transpose_scan_layout(db: jax.Array) -> jax.Array:
    """``uint32[N, W] -> uint32[8, Npad]`` transposed scan copy of a
    corpus (words on sublanes, codes on lanes; rows W..7 and lanes >= N
    zero).

    This is the operand layout of the no-relayout Pallas blockmin kernel
    (ops/pallas.pallas_blockmin_t): [8, N] IS the natural (8,128)-tiled
    form, so feeding it to Mosaic inserts no copy at any N — unlike the
    row-major [N, W] operand whose tiling lane-pads W to 128 (32x bytes at
    W=4, OOM beyond ~24M codes). Costs 32 B/code HBM (~3.2 GB at 100M)
    and ~2.5 ns/code to build once at index-build time.
    """
    n, w = db.shape
    npad = -(-max(n, 1) // SCAN_PAD_UNIT) * SCAN_PAD_UNIT
    if npad > SCAN_CHUNK:
        npad = -(-npad // SCAN_CHUNK) * SCAN_CHUNK
    out = jnp.zeros((8, npad), jnp.uint32)
    return jax.lax.dynamic_update_slice(out, db.T, (0, 0))


@functools.partial(jax.jit, static_argnames=("n_words",))
def rescore_rows_layout(db_t: jax.Array, n_words: int) -> jax.Array:
    """``uint32[8, Npad] -> uint32[Npad/128, W*128]`` blocked rescore rows.

    Row ``b`` holds the 128 codes ``[b*128, (b+1)*128)`` word-major: lane
    ``j*128 + r`` = word ``j`` of code ``b*128 + r`` (pad codes 0).
    Why this exists (measured, tools/microbench_r5.py at Q=8192): XLA
    row gathers from a [nb, 512]-wide array run at ~20 ns/row while ANY
    multi-row slice gather — ``(block, w)`` off the row-major corpus,
    ``(8, block)`` off the transposed copy, ``(m, width)`` off this very
    array — costs ~1.4 us per slice, ~70x more per byte at the scan's
    shapes. So the block-min scan's rescore fetches whole 128-code rows
    by plain indexing and nothing else. Costs 16 B/code of HBM at W=4.

    Built from the transposed scan copy: per-word 1-D -> 2-D reshapes and
    a lane concat (2-D reshapes of [N, small] relayout catastrophically;
    CLAUDE.md layout traps).
    """
    npad = db_t.shape[1]
    nb = npad // 128
    return jnp.concatenate(
        [db_t[j].reshape(nb, 128) for j in range(n_words)], axis=-1)


def hamming_via_matmul(q_pm1: jax.Array, db_pm1: jax.Array) -> jax.Array:
    """``[Q, B] x [N, B] -> int32[Q, N]`` Hamming distances on the MXU."""
    bits = q_pm1.shape[-1]
    dot = jax.lax.dot_general(
        q_pm1, db_pm1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return ((bits - dot) * 0.5).astype(jnp.int32)
