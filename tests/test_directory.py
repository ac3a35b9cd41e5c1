"""Directory implementations must agree with each other on lookups."""

import numpy as np
import jax.numpy as jnp

from verticut_tpu.index import directory as dir_lib


def _lookup_np(sorted_vals, v):
    lo = np.searchsorted(sorted_vals, v, side="left")
    hi = np.searchsorted(sorted_vals, v, side="right")
    return lo, hi - lo


def test_all_directories_agree():
    rng = np.random.default_rng(0)
    # skewed keys: hot values + uniform tail, including > 2^31 (uint32 range)
    hot = rng.choice([7, 42, 0xFFFFFFF0, 0x80000001], size=500)
    uni = rng.integers(0, 1 << 32, size=1500, dtype=np.uint32)
    keys = np.sort(np.concatenate([hot, uni]).astype(np.uint32))
    jkeys = jnp.asarray(keys)
    sd = dir_lib.build_sorted(jkeys)
    pd = dir_lib.build_prefix(jkeys, 32)
    probe = np.concatenate([
        rng.integers(0, 1 << 32, size=300, dtype=np.uint32),
        np.asarray([7, 42, 0xFFFFFFF0, 0x80000001, 0, 0xFFFFFFFF], np.uint32),
        keys[rng.integers(0, len(keys), 100)],
    ])
    jv = jnp.asarray(probe)
    s1, c1 = sd.lookup(jv)
    s2, c2 = pd.lookup(jv)
    el, ec = _lookup_np(keys, probe)
    assert np.array_equal(np.asarray(c1), ec)
    assert np.array_equal(np.asarray(s1), el)
    assert np.array_equal(np.asarray(c2), ec)
    assert np.array_equal(np.asarray(s2), el)


def test_dense_directory_small_sbits():
    rng = np.random.default_rng(1)
    keys = np.sort(rng.integers(0, 256, size=1000).astype(np.uint32))
    dd = dir_lib.build_dense(jnp.asarray(keys), 8)
    probe = np.arange(256, dtype=np.uint32)
    s, c = dd.lookup(jnp.asarray(probe))
    el, ec = _lookup_np(keys, probe)
    assert np.array_equal(np.asarray(c), ec)
    assert np.array_equal(np.asarray(s), el)


def test_prefix_directory_small_sbits():
    rng = np.random.default_rng(2)
    keys = np.sort(rng.integers(0, 256, size=777).astype(np.uint32))
    pdir = dir_lib.build_prefix(jnp.asarray(keys), 8)
    probe = np.arange(256, dtype=np.uint32)
    s, c = pdir.lookup(jnp.asarray(probe))
    el, ec = _lookup_np(keys, probe)
    assert np.array_equal(np.asarray(c), ec)
    assert np.array_equal(np.asarray(s), el)


def test_hash_directory_agrees():
    rng = np.random.default_rng(3)
    hot = rng.choice([7, 42, 0xFFFFFFF0, 0x80000001, 0], size=500)
    uni = rng.integers(0, 1 << 32, size=1500, dtype=np.uint32)
    keys = np.sort(np.concatenate([hot, uni]).astype(np.uint32))
    hd = dir_lib.build_hash(keys)
    probe = np.concatenate([
        rng.integers(0, 1 << 32, size=300, dtype=np.uint32),
        np.asarray([7, 42, 0xFFFFFFF0, 0x80000001, 0, 0xFFFFFFFF], np.uint32),
        keys[rng.integers(0, len(keys), 100)],
    ])
    s, c = hd.lookup(jnp.asarray(probe))
    el, ec = _lookup_np(keys, probe)
    assert np.array_equal(np.asarray(c), ec)
    # starts only meaningful where count > 0
    hit = ec > 0
    assert np.array_equal(np.asarray(s)[hit], el[hit])


def test_hash_directory_tiny_and_dense_keys():
    keys = np.zeros(64, np.uint32)  # all duplicates of one value
    hd = dir_lib.build_hash(keys)
    s, c = hd.lookup(jnp.asarray(np.asarray([0, 1], np.uint32)))
    assert np.asarray(c).tolist() == [64, 0]
    assert int(np.asarray(s)[0]) == 0


def test_hashdir_on_xor_family_keys():
    """Regression: MIH substring families (center ^ few bit flips) wedge a
    linear multiply-shift cuckoo hash (identical slot deltas densify the
    cuckoo graph). The avalanche mixer must build at the normal load factor
    without table growth."""
    from verticut_tpu import native
    rng = np.random.default_rng(0)
    centers = rng.integers(0, 1 << 32, 2000, dtype=np.uint32)
    flips = np.uint32(1) << rng.integers(0, 32, (2000, 40)).astype(np.uint32)
    keys = np.sort((centers[:, None] ^ flips).reshape(-1))
    uniq = int((keys[1:] != keys[:-1]).sum()) + 1
    rows = dir_lib.build_hash(jnp.asarray(keys))
    expect_slots = 1 << max(3, int(np.ceil(np.log2(uniq / 0.4))))
    assert rows.rows.shape[0] == expect_slots, (rows.rows.shape, expect_slots)
    # and lookups still exact
    probe = keys[rng.integers(0, len(keys), 500)]
    s, c = rows.lookup(jnp.asarray(probe))
    el = np.searchsorted(keys, probe, side="left")
    ec = np.searchsorted(keys, probe, side="right") - el
    assert np.array_equal(np.asarray(c), ec)
    assert np.array_equal(np.asarray(s), el)
