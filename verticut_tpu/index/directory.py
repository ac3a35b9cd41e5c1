"""Bucket directories: substring value → (start, count) in the CSR entry
arrays.

This is the TPU-native replacement for the Pilaf DHT bucket lookup
(``Pilaf/dht.h:604-676``): instead of cuckoo-probing remote memory via RDMA
READ, a directory is a device array co-resident with the entries it
describes, and lookups are vectorized gathers/binary searches over the whole
probe batch at once.

Two implementations (same ``lookup`` contract):

* :class:`DenseDirectory` — ``offsets[2^s + 1]``; O(1) gather per probe.
  Feasible for ``s_bits`` ≤ ~26 (offsets of 256 MB at s=26).
* :class:`SortedDirectory` — the sorted substring column itself; two
  vectorized binary searches (left/right) per probe. Always feasible
  (the s=32 default: a dense 2^32-entry directory would be 16 GB/table,
  which is why the reference hashes instead — SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp


class DenseDirectory(NamedTuple):
    """CSR offsets over the full 2^s_bits value space."""

    offsets: jax.Array  # int32[2^s_bits + 1], offsets[v+1]-offsets[v] = count

    @property
    def s_bits(self) -> int:
        return (self.offsets.shape[0] - 1).bit_length() - 1

    def lookup(self, vals: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """``uint32[...] -> (start int32[...], count int32[...])``."""
        v = vals.astype(jnp.int32)  # 2^s+1 fits int32 for s<=26
        start = self.offsets[v]
        count = self.offsets[v + 1] - start
        return start, count


class SortedDirectory(NamedTuple):
    """Binary-search directory over the sorted substring column."""

    keys: jax.Array  # uint32[N], ascending (the sorted substring values)

    def lookup(self, vals: jax.Array) -> Tuple[jax.Array, jax.Array]:
        flat = vals.reshape(-1)
        lo = jnp.searchsorted(self.keys, flat, side="left")
        hi = jnp.searchsorted(self.keys, flat, side="right")
        start = lo.astype(jnp.int32).reshape(vals.shape)
        count = (hi - lo).astype(jnp.int32).reshape(vals.shape)
        return start, count


Directory = Union[DenseDirectory, SortedDirectory]


def build_dense(sorted_subs: jax.Array, s_bits: int) -> DenseDirectory:
    """Offsets via one vectorized searchsorted over all 2^s values."""
    if s_bits > 26:
        raise ValueError(
            f"dense directory infeasible at s_bits={s_bits} "
            f"(2^{s_bits}+1 offsets); use SortedDirectory")
    grid = jnp.arange((1 << s_bits) + 1, dtype=jnp.int32).astype(jnp.uint32)
    offs = jnp.searchsorted(sorted_subs, grid, side="left")
    return DenseDirectory(offsets=offs.astype(jnp.int32))


def build_sorted(sorted_subs: jax.Array) -> SortedDirectory:
    return SortedDirectory(keys=sorted_subs)
