"""Core codes library: packing, substring extraction, Hamming distance.

Property tests vs numpy, matching the reference semantics of
``binaryToInt`` (Pilaf/image_tools.h:12-18) and ``compute_hamming_dist``
(:21-33).
"""

import numpy as np
import jax.numpy as jnp

from verticut_tpu import codes
from tests import reference_model as ref


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(100, 16), dtype=np.uint8)
    packed = codes.pack_bytes(raw)
    assert packed.shape == (100, 4) and packed.dtype == np.uint32
    assert np.array_equal(codes.unpack_to_bytes(packed), raw)


def test_word_matches_binary_to_int():
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, size=(50, 16), dtype=np.uint8)
    packed = codes.pack_bytes(raw)
    for i in range(50):
        for t in range(4):
            expect = ref.binary_to_int(raw[i, t * 4:(t + 1) * 4])
            assert int(packed[i, t]) == expect


def test_substring_widths():
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 256, size=(40, 16), dtype=np.uint8)
    packed = jnp.asarray(codes.pack_bytes(raw))
    for s_bits in (8, 16, 32):
        s_bytes = s_bits // 8
        m = 16 // s_bytes
        for t in range(m):
            got = np.asarray(codes.substring(packed, t, s_bits))
            expect = np.array(
                [ref.binary_to_int(raw[i, t * s_bytes:(t + 1) * s_bytes])
                 for i in range(40)], np.uint32)
            assert np.array_equal(got, expect), (s_bits, t)


def test_hamming_distance_vs_numpy():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(64, 16), dtype=np.uint8)
    b = rng.integers(0, 256, size=(64, 16), dtype=np.uint8)
    pa, pb = jnp.asarray(codes.pack_bytes(a)), jnp.asarray(codes.pack_bytes(b))
    got = np.asarray(codes.hamming_distance(pa, pb))
    expect = np.array([ref.hamming(a[i], b[i]) for i in range(64)])
    assert np.array_equal(got, expect)


def test_pairwise_and_matmul_formulations_agree():
    rng = np.random.default_rng(4)
    q = jnp.asarray(codes.pack_bytes(
        rng.integers(0, 256, size=(8, 16), dtype=np.uint8)))
    db = jnp.asarray(codes.pack_bytes(
        rng.integers(0, 256, size=(33, 16), dtype=np.uint8)))
    d1 = np.asarray(codes.pairwise_hamming(q, db))
    qpm = codes.unpack_bits_pm1(q)
    dpm = codes.unpack_bits_pm1(db)
    d2 = np.asarray(codes.hamming_via_matmul(qpm, dpm))
    assert np.array_equal(d1, d2)


def test_all_substrings_stack():
    rng = np.random.default_rng(5)
    packed = jnp.asarray(rng.integers(0, 1 << 32, size=(10, 4), dtype=np.uint32))
    subs = np.asarray(codes.all_substrings(packed, 4))
    assert np.array_equal(subs, np.asarray(packed))
