"""Minimizer-bucketed static k-mer dictionary — the SSHash-style
representation (ref src/graph/representation/hash/dbg_sshash.hpp:17, which
wraps the external sshash library).

Design (same idea, array-native): every k-mer is bucketed by its minimizer
(the smallest m-mer of the k-mer under a mixed ordering).  Buckets are
contiguous ranges of a sorted (minimizer, kmer) array, located by a bucket
offset table.  Lookup = compute minimizer (vectorized) + binary search within
the bucket — O(log bucket) instead of O(log N), and bucket entries are
cache/VMEM local.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..kmer import packing
from ..kmer.alphabets import DNA, Alphabet
from .hash_graph import _KmerGraphBase, BASIC, CANONICAL


def _mix(x: np.ndarray) -> np.ndarray:
    """order-scrambling hash of m-mer codes (avoids poly-A megabuckets)."""
    x = x.astype(np.uint64)
    x = (x * np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


def compute_minimizers(kmers: np.ndarray, m: int) -> np.ndarray:
    """(N, k) code matrices -> minimizer value per k-mer (packed m-mer)."""
    N, k = kmers.shape
    n_win = k - m + 1
    packed = np.zeros((N, n_win), dtype=np.uint64)
    for j in range(m):
        packed |= kmers[:, j: j + n_win].astype(np.uint64) << np.uint64(
            4 * (m - 1 - j))
    return packed[np.arange(N), np.argmin(_mix(packed), axis=1)]


class DBGSSHashGraph(_KmerGraphBase):
    """Static minimizer-bucketed dictionary with the DeBruijnGraph protocol."""

    NAME = "sshash"

    def __init__(self, keys, minimizers, bucket_offsets, ids, k, m,
                 mode=BASIC, alphabet: Alphabet = DNA):
        super().__init__(k, mode, alphabet)
        self.m = m
        self._keys = keys                    # (N, W) packed kmers, bucket-sorted
        self._minims = minimizers            # (N,) minimizer per entry (sorted)
        self._offsets = bucket_offsets       # minimizer -> [start, end) via search
        self._ids = ids                      # (N,) original rank (node id - 1)

    @classmethod
    def build(cls, sequences: Sequence, k: int, mode: str = BASIC,
              alphabet: Alphabet = DNA, m: int | None = None, **_):
        from ..kmer.extractor import KmerExtractor
        if m is None:
            m = max(4, min(k - 1, (k + 1) // 2))
        ex = KmerExtractor(alphabet)
        collector_mode = "both" if mode == CANONICAL else "basic"
        chars, _ = ex.extract(sequences, k, mode=collector_mode)
        keys = packing.pack_codes(chars)           # plain order for node ids
        order0 = packing.lexsort_rows(keys)
        chars = chars[order0]
        keys = keys[order0]
        minims = compute_minimizers(chars, m)
        order = np.argsort(minims, kind="stable")
        return cls(keys[order], minims[order],
                   np.unique(minims[order]),
                   np.arange(1, len(keys) + 1)[order].astype(np.int64),
                   k, m, mode, alphabet)

    def _kmer_id(self, chars: np.ndarray) -> int:
        if (chars >= self.alphabet.sigma).any() or (chars == 0).any():
            return 0
        minim = compute_minimizers(chars[None, :], self.m)[0]
        lo = np.searchsorted(self._minims, minim, side="left")
        hi = np.searchsorted(self._minims, minim, side="right")
        if lo == hi:
            return 0
        key = packing.pack_codes(chars[None, :])[0]
        bucket = self._keys[lo:hi]
        # binary search within the bucket (entries sorted by key within
        # a minimizer because the stable sort preserved key order)
        pos = packing.searchsorted_rows(bucket, key[None, :])[0]
        if pos < len(bucket) and (bucket[pos] == key).all():
            return int(self._ids[lo + pos])
        return 0

    def _node_chars(self, node: int) -> np.ndarray:
        idx = int(np.flatnonzero(self._ids == node)[0])
        return packing.unpack_codes(self._keys[idx][None, :], self.k)[0]

    GRAPH_TYPE = "sshash"

    def call_kmers(self):
        chars = packing.unpack_codes(self._keys, self.k)
        for pos in range(len(chars)):
            yield int(self._ids[pos]), chars[pos]

    @classmethod
    def rebuild(cls, kmers, ids, k, mode, alphabet=None) -> "DBGSSHashGraph":
        # rebuild from the raw k-mer set (bucket layout is derived)
        table = DNA.decode_table
        seqs = [table[np.asarray(km, dtype=np.uint8)].tobytes()
                for km in kmers]
        return cls.build(seqs, k, mode=mode)

    def num_nodes(self) -> int:
        return len(self._keys)

    def max_index(self) -> int:
        return len(self._keys)
