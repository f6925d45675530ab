"""Blocked Bloom filter for k-mer prefiltering
(ref src/common/bloom_filter.{hpp,cpp}, src/kmer/kmer_bloom_filter.hpp).

Vectorized: hashes are computed for whole k-mer batches; each element probes
`num_hash` bits within one 512-bit block (cache-line / VPU-lane friendly, the
same blocked scheme as the reference).  No false negatives, so query results
are unaffected by the prefilter — only lookup work is saved.
"""

from __future__ import annotations

import math

import numpy as np

BLOCK_BITS = 512


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


class BloomFilter:
    def __init__(self, filter_size: int, expected_num_elements: int = 0,
                 max_num_hash_functions: int = 10):
        size = max(BLOCK_BITS,
                   ((filter_size + BLOCK_BITS - 1) // BLOCK_BITS) * BLOCK_BITS)
        self.bits = np.zeros(size // 64, dtype=np.uint64)
        if expected_num_elements:
            opt = int(round(math.log(2) * size / expected_num_elements))
            self.num_hash = max(1, min(opt, max_num_hash_functions))
        else:
            self.num_hash = max(1, max_num_hash_functions)

    @property
    def size(self) -> int:
        return len(self.bits) * 64

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(N, num_hash) absolute bit positions, all within one block."""
        n_blocks = self.size // BLOCK_BITS
        block = (hashes % np.uint64(n_blocks)).astype(np.uint64)
        pos = []
        h = hashes
        for i in range(self.num_hash):
            h = _splitmix64(h ^ np.uint64(i * 0x9E3779B9))
            pos.append(block * np.uint64(BLOCK_BITS)
                       + (h % np.uint64(BLOCK_BITS)))
        return np.stack(pos, axis=1)

    def insert(self, hashes: np.ndarray):
        pos = self._positions(np.asarray(hashes, dtype=np.uint64))
        np.bitwise_or.at(self.bits, (pos // 64).ravel(),
                         np.uint64(1) << (pos % np.uint64(64)).ravel())

    def check(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(np.asarray(hashes, dtype=np.uint64))
        got = (self.bits[pos // 64] >> (pos % np.uint64(64))) & np.uint64(1)
        return got.all(axis=1)


class KmerBloomFilter:
    """k-mer front end (ref kmer_bloom_filter.hpp:17): canonical mode hashes
    the canonical form of each k-mer."""

    def __init__(self, k: int, canonical_mode: bool = False,
                 filter_size: int = BLOCK_BITS,
                 expected_num_elements: int = 0,
                 max_num_hash_functions: int = 10):
        self.k = k
        self.canonical_mode = canonical_mode
        self.filter = BloomFilter(filter_size, expected_num_elements,
                                  max_num_hash_functions)

    @classmethod
    def from_fpp(cls, k: int, canonical_mode: bool, num_kmers: int,
                 fpp: float) -> "KmerBloomFilter":
        size = max(1, int(-num_kmers * math.log(fpp) / (math.log(2) ** 2)))
        return cls(k, canonical_mode, size, num_kmers)

    def _hash_kmers(self, packed: np.ndarray) -> np.ndarray:
        h = np.zeros(len(packed), dtype=np.uint64)
        for w in range(packed.shape[1]):
            h = _splitmix64(h ^ packed[:, w].astype(np.uint64))
        return h

    def _sequence_hashes(self, sequence: bytes):
        from . import packing
        from .extractor import KmerExtractor
        ex = KmerExtractor()
        codes = ex.encode(sequence)
        k = self.k
        if len(codes) < k:
            return np.zeros(0, np.uint64), np.zeros(0, bool)
        wins = np.lib.stride_tricks.sliding_window_view(codes, k)
        bad = np.concatenate([[0], np.cumsum(codes >= ex.alphabet.sigma)])
        valid = (bad[k:] - bad[:-k]) == 0
        chars = wins.copy()
        if self.canonical_mode:
            comp = ex.extended_complement_table()
            rc = comp[codes[::-1]]
            rcw = np.lib.stride_tricks.sliding_window_view(rc, k)[::-1]
            order = packing.boss_priority_order(k)
            kf = packing.pack_codes(chars, order)
            kr = packing.pack_codes(rcw, order)
            from .extractor import _rows_greater
            take = _rows_greater(kf, kr)
            chars = np.where(take[:, None], rcw, chars)
        packed = packing.pack_codes(chars, packing.boss_priority_order(k))
        return self._hash_kmers(packed), valid

    def add_sequence(self, sequence: bytes):
        h, valid = self._sequence_hashes(sequence)
        if valid.any():
            self.filter.insert(h[valid])

    def check_kmer_presence(self, sequence: bytes) -> np.ndarray:
        h, valid = self._sequence_hashes(sequence)
        out = np.zeros(len(h), dtype=bool)
        if valid.any():
            out[valid] = self.filter.check(h[valid])
        return out

    def save(self, path: str):
        np.savez_compressed(path, k=self.k, canonical=self.canonical_mode,
                            bits=self.filter.bits,
                            num_hash=self.filter.num_hash)

    @classmethod
    def load(cls, path: str) -> "KmerBloomFilter":
        z = np.load(path)
        obj = cls(int(z["k"]), bool(z["canonical"]))
        obj.filter.bits = z["bits"]
        obj.filter.num_hash = int(z["num_hash"])
        return obj
