"""Host-native index build: C++ radix sort feeding device arrays.

The production-scale path for corpora where a device-side ``lax.sort`` of
N rows is wasteful or doesn't fit alongside the final index (SURVEY §3.1:
the reference builds by streaming every code through the KV store; we build
CSR columns on host at memory bandwidth and upload once).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from verticut_tpu import native
from verticut_tpu.config import MIHConfig
from verticut_tpu.index import directory as dir_lib
from verticut_tpu.index.bitmap import Bitmap
from verticut_tpu.index.mih import MIHIndex, MIHTable


def build_index_native(codes_arr: np.ndarray, cfg: MIHConfig = MIHConfig(),
                       dense_threshold: int = 24, store_codes: bool = True,
                       with_bitmap: bool = False, keep_codes: bool = True
                       ) -> MIHIndex:
    codes_arr = np.ascontiguousarray(codes_arr, np.uint32)
    n = codes_arr.shape[0]
    if codes_arr.shape[-1] != cfg.n_words:
        raise ValueError(
            f"codes have {codes_arr.shape[-1]} words, config wants "
            f"{cfg.n_words}")
    tables = []
    for t in range(cfg.n_tables):
        keys, ids = native.build_csr(codes_arr, t, cfg.s_bits)
        entry_codes = (jnp.asarray(native.gather_rows(codes_arr, ids))
                       if store_codes else None)
        if cfg.s_bits <= dense_threshold:
            d = dir_lib.build_dense(jnp.asarray(keys), cfg.s_bits)
        else:  # cuckoo rows built directly from the host key column
            d = dir_lib.HashDirectory(
                rows=jnp.asarray(native.build_hashdir(keys)))
        bmp = (Bitmap(words=jnp.asarray(native.build_bitmap(keys, cfg.s_bits)))
               if with_bitmap else None)
        tables.append(MIHTable(entry_ids=jnp.asarray(ids),
                               entry_codes=entry_codes, directory=d,
                               bitmap=bmp))
    return MIHIndex(cfg=cfg, tables=tables, n=n,
                    codes=jnp.asarray(codes_arr) if keep_codes else None)
