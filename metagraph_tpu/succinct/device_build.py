"""Device-side graph construction ops.

The reference's construction hot loop is extraction -> parallel sort ->
dedupe (SortedSet + ips4o, ref sorted_set.cpp:43).  On TPU this is:

  codes -> rolling window packing (device or native) -> multiword lax.sort
        -> adjacent-diff dedupe mask

lax.sort with num_keys=W sorts the uint32 word columns lexicographically —
exactly the BOSS one-swapped co-lex order of the packed keys.  Compaction of
the deduped set is a host step (dynamic shape); everything O(N log N) runs on
device.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def sort_kmers_device(keys: jnp.ndarray):
    """(N, W) uint32 keys -> (sorted keys, unique mask).

    Sorted in BOSS order; mask[i] = True iff row i differs from row i-1.
    """
    W = keys.shape[1]
    cols = tuple(keys[:, w] for w in range(W))
    sorted_cols = lax.sort(cols, num_keys=W)
    s = jnp.stack(sorted_cols, axis=1)
    prev = jnp.concatenate([jnp.full((1, W), 0xFFFFFFFF, jnp.uint32),
                            s[:-1]], axis=0)
    new = jnp.any(s != prev, axis=1)
    new = new.at[0].set(True)
    return s, new


@jax.jit
def sort_kmers_device_with_counts(keys: jnp.ndarray):
    """Also returns per-unique-row multiplicities via segment boundaries."""
    s, new = sort_kmers_device(keys)
    idx = jnp.cumsum(new.astype(jnp.int32)) - 1        # group id per row
    counts = jax.ops.segment_sum(jnp.ones(len(s), jnp.int32), idx,
                                 num_segments=len(s))
    return s, new, counts


def _pad_pow2(keys: np.ndarray) -> np.ndarray:
    """Pad rows to the next power of two with 0xFF sentinels so jitted sort
    shapes are reused across batches (sentinels sort last and are dropped)."""
    n = len(keys)
    target = 1 << max(int(np.ceil(np.log2(max(n, 2)))), 1)
    if target == n:
        return keys
    pad = np.full((target - n, keys.shape[1]), 0xFFFFFFFF, dtype=keys.dtype)
    return np.concatenate([keys, pad])


def device_sort_unique(keys: np.ndarray, with_counts: bool = False):
    """Host wrapper: device sort+dedupe, host compaction.

    Drops sentinel (all-0xFF padding / invalid-window) keys.
    """
    if len(keys) == 0:
        return (keys, None) if with_counts else keys
    keys = _pad_pow2(keys)
    if with_counts:
        s, new, counts = sort_kmers_device_with_counts(jnp.asarray(keys))
        s = np.asarray(s)
        new = np.asarray(new)
        counts = np.asarray(counts)
        valid = ~np.all(s == np.uint32(0xFFFFFFFF), axis=1)
        keep = new & valid
        group_counts = counts[: int(new.sum())]
        uniq = s[keep]
        # counts are indexed by group id; select groups of kept rows
        gids = (np.cumsum(new) - 1)[keep]
        return uniq, group_counts[gids]
    s, new = sort_kmers_device(jnp.asarray(keys))
    s = np.asarray(s)
    new = np.asarray(new)
    valid = ~np.all(s == np.uint32(0xFFFFFFFF), axis=1)
    return s[new & valid]


def build_kmer_set_device(codes: np.ndarray, k: int):
    """codes (with separators) -> sorted unique packed k-mers, device path."""
    from .. import native
    keys = native.pack_windows_boss(codes, k, bits=32)
    if keys is None:
        from ..succinct.ops import pack_kmers32
        wins = np.lib.stride_tricks.sliding_window_view(codes, k)
        bad = np.concatenate([[0], np.cumsum(codes > 4)])
        valid = (bad[k:] - bad[:-k]) == 0
        W = (k + 7) // 8
        keys = np.full((len(wins), W), 0xFFFFFFFF, dtype=np.uint32)
        keys[valid] = pack_kmers32(wins[valid])
    return device_sort_unique(keys)
