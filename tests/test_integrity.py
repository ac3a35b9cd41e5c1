"""Vectorized integrity checker (index/integrity.py) — the scale-ready
``integrity_check.cc:37-70`` analog: green on every build layout, and it
must DETECT corruption in each stored component (a checker that can only
pass is not a checker)."""

import numpy as np
import pytest
import jax.numpy as jnp

from verticut_tpu import codes
from verticut_tpu.config import MIHConfig
from verticut_tpu.index import build_index
from verticut_tpu.index.integrity import check_index, check_table


def make_db(n, seed=0, bits=128):
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, size=(n, bits // 8), dtype=np.uint8)
    return codes.pack_bytes(raw)


@pytest.mark.parametrize("directory,store_codes,keep_ids", [
    ("range", True, True),     # inline blocked rows
    ("range", False, True),    # compact id rows
    ("range", False, False),   # memory-tight: blocked rows only
    ("dense", True, True),
    ("hash", True, True),
    ("prefix", True, True),
    ("sorted", True, True),
])
def test_clean_index_passes(directory, store_codes, keep_ids):
    cfg = MIHConfig(bits=128, n_tables=4)
    if directory == "dense":
        cfg = MIHConfig(bits=64, n_tables=4)   # s_bits=16 dense-feasible
    db = make_db(3000, seed=1, bits=cfg.bits)
    idx = build_index(jnp.asarray(db), cfg, directory=directory,
                      store_codes=store_codes, keep_entry_ids=keep_ids)
    rep = check_index(idx)
    assert rep["ok"], rep
    assert all(r["id_mismatches"] == 0 for r in rep["tables"])


def _corrupt(arr, flat_pos, new_val):
    host = np.asarray(arr).copy()
    host.reshape(-1)[flat_pos] = new_val
    return jnp.asarray(host)


def test_detects_corrupted_inline_id():
    cfg = MIHConfig(bits=128, n_tables=4)
    idx = build_index(jnp.asarray(make_db(2000, seed=2)), cfg,
                      directory="range")
    t = idx.tables[0]
    # flip one id inside the id lane slice (lanes [0, blk))
    rows = np.asarray(t.entry_rows).copy()
    rows[3, 1] ^= 1
    bad = t._replace(entry_rows=jnp.asarray(rows))
    rep = check_table(idx.codes, bad, 0, cfg)
    assert not rep["ok"] and rep["id_mismatches"] >= 1


def test_detects_corrupted_inline_code_word():
    cfg = MIHConfig(bits=128, n_tables=4)
    idx = build_index(jnp.asarray(make_db(2000, seed=3)), cfg,
                      directory="range")
    t = idx.tables[1]
    blk = np.asarray(t.entry_rows).shape[1] // 5   # rw = 1 + 4 words
    rows = np.asarray(t.entry_rows).copy()
    rows[2, blk + 4] ^= 0x10000                    # a code word lane
    bad = t._replace(entry_rows=jnp.asarray(rows))
    rep = check_table(idx.codes, bad, 1, cfg)
    assert not rep["ok"] and rep["code_mismatches"] >= 1


def test_detects_corrupted_directory():
    cfg = MIHConfig(bits=128, n_tables=4)
    idx = build_index(jnp.asarray(make_db(2000, seed=4)), cfg,
                      directory="range")
    t = idx.tables[0]
    se = np.asarray(t.directory.se).copy()
    nz = np.nonzero(se[:, 1] - se[:, 0])[0][0]
    se[nz, 0] += 1
    import verticut_tpu.index.directory as dir_lib
    bad = t._replace(directory=dir_lib.RangeDirectory(
        se=jnp.asarray(se), s_bits=cfg.s_bits))
    rep = check_table(idx.codes, bad, 0, cfg)
    assert not rep["ok"] and rep["directory_mismatches"] >= 1


def test_detects_corrupted_compact_idrow():
    cfg = MIHConfig(bits=128, n_tables=4)
    idx = build_index(jnp.asarray(make_db(2500, seed=5)), cfg,
                      directory="range", store_codes=False)
    t = idx.tables[0]
    rows = np.asarray(t.entry_idrows).copy()
    rows[1, 7] ^= 3
    bad = t._replace(entry_idrows=jnp.asarray(rows))
    rep = check_table(idx.codes, bad, 0, cfg)
    assert not rep["ok"] and rep["id_mismatches"] >= 1
