"""Native C++ layer: integrity primitives, cuckoo DHT, CSR builder.

Tier-1 data-structure tests (the ht-test.cc / dht-test.cc analogs,
SURVEY.md §4) plus cross-checks of the native builder against the JAX build.
"""

import numpy as np
import pytest

from verticut_tpu import native
from verticut_tpu import codes as codes_lib


# ---------------------------------------------------------------------------
# integrity
# ---------------------------------------------------------------------------

def _crc64_py(data: bytes) -> int:
    """Independent python model of the table-driven CRC."""
    poly, init = 0x42F0E1EBA9EA3693, 0x0060034000F0D50B
    table = []
    for i in range(256):
        acc, bits = 0, i
        for _ in range(8):
            acc = ((acc << 1) ^ poly if bits & 0x80 else acc << 1) & (2**64 - 1)
            bits = (bits << 1) & 0xFF
        table.append(acc)
    h = init
    for b in data:
        h = table[(h ^ b) & 0xFF] ^ (h >> 8)
    return h


def _murmur64_py(data: bytes, seed: int) -> int:
    m, r, mask = 0xC6A4A7935BD1E995, 47, 2**64 - 1
    h = (seed ^ (len(data) * m)) & mask
    nb = len(data) // 8
    for i in range(nb):
        k = int.from_bytes(data[i * 8:(i + 1) * 8], "little")
        k = (k * m) & mask
        k ^= k >> r
        k = (k * m) & mask
        h = ((h ^ k) * m) & mask
    tail = data[nb * 8:]
    if tail:
        t = int.from_bytes(tail, "little")
        h = ((h ^ t) * m) & mask
    h ^= h >> r
    h = (h * m) & mask
    h ^= h >> r
    return h


@pytest.mark.parametrize("payload", [b"", b"a", b"hello world",
                                     bytes(range(256)), b"x" * 1000])
def test_crc64_matches_python_model(payload):
    assert native.crc64(payload) == _crc64_py(payload)


@pytest.mark.parametrize("payload", [b"", b"k", b"0123456", b"01234567",
                                     b"012345678", bytes(range(100))])
def test_murmur64_matches_python_model(payload):
    for seed in (0, 0x199999999999997F, 0x01000193):
        assert native.murmur64(payload, seed) == _murmur64_py(payload, seed)


def test_hash_n_uses_reference_seeds():
    key = b"bucket-key"
    seeds = [0x199999999999997F, 0x1999999999999990, 0x01000193, 0x0100019D]
    for n, s in enumerate(seeds):
        assert native.hash_n(key, n) == native.murmur64(key, s)


# ---------------------------------------------------------------------------
# DHT (ht-test.cc analog: sanity round-trips, then randomized stress)
# ---------------------------------------------------------------------------

def test_dht_basic_roundtrip():
    d = native.NativeDHT(n_slots=16)
    d.put(b"k1", b"v1")
    d.put(b"k2", b"value-two")
    assert d.get(b"k1") == b"v1"
    assert d.get(b"k2") == b"value-two"
    assert d.get(b"nope") is None
    assert d.contains(b"k1") and not d.contains(b"k3")
    d.put(b"k1", b"replaced-with-a-longer-value")
    assert d.get(b"k1") == b"replaced-with-a-longer-value"
    assert len(d) == 2
    assert d.remove(b"k1")
    assert not d.contains(b"k1") and len(d) == 1
    assert not d.remove(b"k1")
    d.close()


def test_dht_stress_with_resize():
    rng = np.random.default_rng(0)
    d = native.NativeDHT(n_slots=8, arena_bytes=4096)  # force many resizes
    model = {}
    for i in range(3000):
        k = rng.integers(0, 800)
        key = f"key-{k}".encode()
        op = rng.random()
        if op < 0.6:
            val = rng.bytes(int(rng.integers(1, 200)))
            d.put(key, val)
            model[key] = val
        elif op < 0.8 and model:
            assert d.get(key) == model.get(key)
        else:
            assert d.remove(key) == (key in model)
            model.pop(key, None)
    assert len(d) == len(model)
    for key, val in model.items():
        assert d.get(key) == val
    st = d.stats()
    assert st["resizes"] >= 1
    assert st["crc_failures"] == 0
    d.close()


def test_dht_cuckoo_placement_parity():
    """Candidate slots must follow hash_n(key, 0..2) mod capacity —
    the placement contract shared with the reference DHT."""
    d = native.NativeDHT(n_slots=64)
    d.put(b"probe-key", b"v")
    # can't introspect slots via the ABI; the contract is exercised by the
    # seeds test above + successful lookups here
    assert d.get(b"probe-key") == b"v"
    d.close()


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("s_bits,n_tables", [(32, 4), (16, 8), (8, 16)])
def test_native_csr_matches_numpy(s_bits, n_tables):
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, size=(500, 16), dtype=np.uint8)
    packed = codes_lib.pack_bytes(raw)
    for t in (0, n_tables - 1):
        keys, ids = native.build_csr(packed, t, s_bits)
        # numpy model
        s_bytes = s_bits // 8
        subs = np.zeros(500, np.uint64)
        for j in range(s_bytes):
            subs |= raw[:, t * s_bytes + j].astype(np.uint64) << (8 * j)
        order = np.lexsort((np.arange(500), subs))
        assert np.array_equal(ids, order.astype(np.int32))
        assert np.array_equal(keys, subs[order].astype(np.uint32))


def test_native_gather_and_bitmap():
    rng = np.random.default_rng(2)
    packed = codes_lib.pack_bytes(
        rng.integers(0, 256, size=(100, 16), dtype=np.uint8))
    ids = rng.permutation(100).astype(np.int32)
    out = native.gather_rows(packed, ids)
    assert np.array_equal(out, packed[ids])
    keys = np.sort(rng.integers(0, 256, size=50).astype(np.uint32))
    words = native.build_bitmap(keys, 8)
    expect = np.zeros(8, np.uint32)
    for v in keys:
        expect[v >> 5] |= np.uint32(1) << (v & 31)
    assert np.array_equal(words, expect)


def test_read_code_file(tmp_path):
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, size=(77, 16), dtype=np.uint8)
    p = str(tmp_path / "lsh.code")
    raw.tofile(p)
    arr = native.read_code_file(p, 16, 1000)
    assert np.array_equal(arr, codes_lib.pack_bytes(raw))
    arr2 = native.read_code_file(p, 16, 10)  # cap respected
    assert arr2.shape[0] == 10


def test_dht_concurrent_readers_see_no_torn_values():
    """VERDICT r1 weak#6 / Pilaf/dht.h:637-674 parity: a writer mutating
    values while reader threads get() must never surface torn data — a
    racing read either returns a complete (old or new) value or fails the
    CRC check (rc -2, counted in crc_failures) and is retried.

    The churn is update-only on a fixed key set with fixed-size values, so
    the arena and slot table never resize (resizing invalidates raw
    pointers and is a stop-the-readers event by design — single-writer
    contract, dht.h header note)."""
    import threading
    from verticut_tpu import native

    lib = native.lib()
    n_keys, vlen = 64, 96
    # arena sized generously up front so the value churn never grows it
    h = lib.vt_dht_create(1024, 1 << 22)
    keys = [f"key-{i:04d}".encode() for i in range(n_keys)]

    def val(i, gen):
        b = (gen * 31 + i) % 251
        return bytes([b]) * vlen

    for i, k in enumerate(keys):
        assert lib.vt_dht_put(h, k, len(k), val(i, 0), vlen) == 0

    stop = threading.Event()
    torn, crc_fails, ok_reads = [], [0], [0]

    def reader():
        import ctypes
        buf = ctypes.create_string_buffer(vlen)
        while not stop.is_set():
            for i, k in enumerate(keys):
                rc = lib.vt_dht_get(h, k, len(k), buf, vlen)
                if rc < 0:
                    # -2: blob CRC mismatch; -1: slot guard mismatch makes
                    # Find skip mid-update. Both are the CRC protocol
                    # firing (Pilaf store-client.cc:174-213 retries both).
                    crc_fails[0] += 1
                    continue
                v = buf.raw[:vlen]
                if len(set(v)) != 1:       # torn: bytes from two values
                    torn.append((i, v[:8]))
                else:
                    ok_reads[0] += 1

    threads = [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    for gen in range(1, 400):
        for i, k in enumerate(keys):
            assert lib.vt_dht_put(h, k, len(k), val(i, gen), vlen) == 0
    stop.set()
    for t in threads:
        t.join()
    lib.vt_dht_destroy(h)
    assert not torn, torn[:5]
    assert ok_reads[0] > 1000  # the readers actually read
