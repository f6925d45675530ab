"""Compressed bit-vector hierarchy: stat / sd (Elias-Fano) / rrr.

The TPU-native analog of the reference's bit_vector family
(src/common/vectors/bit_vector.hpp:12, bit_vector_sdsl.hpp:18,
vector_algorithm.hpp smallest_representation): three interchangeable
rank/select representations plus an adaptive chooser that predicts each
encoding's footprint and picks the smallest — the role of
bit_vector_adaptive / bit_vector_small / bit_vector_smart.

* ``BitVectorStat`` — plain packed words + two-level rank directory
  (wraps ``BitRank``); ~1.05 bits/bit.  Best for dense vectors.
* ``BitVectorSD``   — Elias-Fano over the set-bit positions (the sdsl
  sd_vector layout: low bits fixed-width packed, high bits unary in a
  stat vector); ~m*(2 + log2(n/m)) bits.  Best for sparse vectors.
* ``BitVectorRRR``  — 15-bit blocks stored as (class, binomial offset)
  pairs with sampled rank/pointer directories (the rrr_vector<15>
  layout); approaches H0.  Best at intermediate densities.

All rank/select/access operations are batch numpy (vectorized over query
arrays), matching the batch-first design of the rest of the runtime.
"""

from __future__ import annotations

import numpy as np

from .bitrank import BitRank

_WORD = 64


# --------------------------------------------------------------------------
# bit-stream helpers (little-endian packing into uint64 words)
# --------------------------------------------------------------------------

def _pack_stream(values: np.ndarray, widths: np.ndarray):
    """Pack values[i] (widths[i] low bits) into a little-endian uint64
    stream; returns (words, start_bit_offsets)."""
    values = np.asarray(values, dtype=np.uint64)
    widths = np.asarray(widths, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(widths)])
    total = int(starts[-1])
    nw = max((total + _WORD - 1) // _WORD, 1)
    words = np.zeros(nw + 1, dtype=np.uint64)    # +1 pad word for reads
    nz = widths > 0            # zero-width entries write nothing (and their
    off = starts[:-1][nz]      # offsets may sit past the stream end)
    vals = values[nz]
    w = off // _WORD
    s = (off % _WORD).astype(np.uint64)
    lo = (vals << s)
    hi = np.where(s > 0, vals >> (np.uint64(_WORD) - s), np.uint64(0))
    np.bitwise_or.at(words, w, lo)
    np.bitwise_or.at(words, w + 1, hi)
    return words, starts


def _read_stream(words: np.ndarray, offs: np.ndarray,
                 widths: np.ndarray) -> np.ndarray:
    """Read widths[i]-bit values at bit offsets offs[i] (vectorized)."""
    offs = np.asarray(offs, dtype=np.int64)
    widths = np.asarray(widths, dtype=np.uint64)
    w = offs // _WORD
    s = (offs % _WORD).astype(np.uint64)
    lo = words[w] >> s
    hi = np.where(s > 0, words[np.minimum(w + 1, len(words) - 1)]
                  << (np.uint64(_WORD) - s), np.uint64(0))
    v = lo | hi
    mask = np.where(widths >= 64, ~np.uint64(0),
                    (np.uint64(1) << widths) - np.uint64(1))
    return v & mask


# --------------------------------------------------------------------------
# stat
# --------------------------------------------------------------------------

class BitVectorStat:
    """Uncompressed rank/select vector (sdsl bit_vector + rank/select
    supports; ref bit_vector_sdsl.hpp:18 bit_vector_stat)."""

    kind = "stat"

    def __init__(self, bits: np.ndarray = None, *, br: BitRank = None):
        self._br = br if br is not None else BitRank(bits)
        self.n = self._br.n
        self.num_set_bits = self._br.total

    def rank1(self, i):
        """# of set bits in [0, i) (batch; BitRank.rank is inclusive)."""
        i = np.asarray(i, dtype=np.int64)
        return self._br.rank(i - 1)

    def select1(self, j):
        """Position of the (j+1)-th set bit, 0-based j (batch)."""
        j = np.asarray(j, dtype=np.int64)
        return self._br.select(j + 1)

    def get(self, i):
        i = np.asarray(i, dtype=np.int64)
        return ((self._br.words[i // _WORD]
                 >> (i % _WORD).astype(np.uint64)) & np.uint64(1)) \
            .astype(bool)

    def size_bytes(self) -> int:
        return (self._br.words.nbytes + self._br._sup.nbytes
                + self._br._sub.nbytes)

    def to_dict(self):
        return {"kind": "stat", "n": self.n, "words": self._br.words}

    @classmethod
    def from_dict(cls, d):
        return cls(br=BitRank(words=np.asarray(d["words"], dtype=np.uint64),
                              n=int(d["n"])))


# --------------------------------------------------------------------------
# sd (Elias-Fano)
# --------------------------------------------------------------------------

class BitVectorSD:
    """Elias-Fano compressed vector (sdsl sd_vector layout,
    ref bit_vector_sdsl.hpp bit_vector_sd; seq_io/refformat.py:112 reads the
    same on-disk structure)."""

    kind = "sd"

    def __init__(self, bits: np.ndarray = None, *, positions=None, n=None):
        if positions is None:
            bits = np.asarray(bits).astype(bool)
            positions = np.flatnonzero(bits)
            n = len(bits)
        positions = np.asarray(positions, dtype=np.int64)
        self.n = int(n)
        m = len(positions)
        self.num_set_bits = m
        self.lo_width = max(int(np.floor(np.log2(max(self.n, 1) / m)))
                            if m else 0, 0)
        l = self.lo_width
        lo = (positions & ((1 << l) - 1)).astype(np.uint64) if l \
            else np.zeros(m, np.uint64)
        self._lo_words, _ = _pack_stream(lo, np.full(m, l, np.int64)) \
            if l else (np.zeros(1, np.uint64), None)
        hi_len = m + (self.n >> l) + 1
        hi = np.zeros(hi_len, dtype=np.uint8)
        hi[(positions >> l) + np.arange(m)] = 1
        self._hi = BitRank(hi)

    # internal: low halves of elements j (batch)
    def _lo(self, j):
        l = self.lo_width
        if l == 0:
            return np.zeros(len(np.atleast_1d(j)), dtype=np.int64)
        j = np.asarray(j, dtype=np.int64)
        return _read_stream(self._lo_words, j * l,
                            np.full(len(j), l, np.uint64)).astype(np.int64)

    def select1(self, j):
        j = np.atleast_1d(np.asarray(j, dtype=np.int64))
        hi_val = self._hi.select(j + 1) - j
        return (hi_val << self.lo_width) | self._lo(j)

    def rank1(self, i):
        """Binary search over select1 (log m steps of O(1) batch select)."""
        i = np.atleast_1d(np.asarray(i, dtype=np.int64))
        m = self.num_set_bits
        if m == 0:
            return np.zeros(len(i), dtype=np.int64)
        lo = np.zeros(len(i), dtype=np.int64)
        hi = np.full(len(i), m, dtype=np.int64)
        for _ in range(int(np.ceil(np.log2(m + 1))) + 1):
            mid = (lo + hi) >> 1
            probe = np.clip(mid, 0, m - 1)
            less = (self.select1(probe) < i) & (mid < m)
            lo = np.where(less, mid + 1, lo)
            hi = np.where(less, hi, mid)
        return lo

    def get(self, i):
        i = np.atleast_1d(np.asarray(i, dtype=np.int64))
        return (self.rank1(i + 1) - self.rank1(i)) > 0

    def size_bytes(self) -> int:
        return (self._lo_words.nbytes + self._hi.words.nbytes
                + self._hi._sup.nbytes + self._hi._sub.nbytes)

    def to_dict(self):
        return {"kind": "sd", "n": self.n, "m": self.num_set_bits,
                "lo_width": self.lo_width, "lo_words": self._lo_words,
                "hi_words": self._hi.words, "hi_n": self._hi.n}

    @classmethod
    def from_dict(cls, d):
        obj = cls.__new__(cls)
        obj.n = int(d["n"])
        obj.num_set_bits = int(d["m"])
        obj.lo_width = int(d["lo_width"])
        obj._lo_words = np.asarray(d["lo_words"], dtype=np.uint64)
        obj._hi = BitRank(words=np.asarray(d["hi_words"], dtype=np.uint64),
                          n=int(d["hi_n"]))
        return obj


# --------------------------------------------------------------------------
# rrr (15-bit blocks, binomial enumerative coding)
# --------------------------------------------------------------------------

_RRR_B = 15
_RRR_SAMPLE = 32          # blocks per sample

_rrr_tables = None


def _rrr_init():
    """code<->pattern tables for 15-bit blocks: patterns of each popcount
    class ordered ascending; offset = rank of pattern within its class."""
    global _rrr_tables
    if _rrr_tables is not None:
        return _rrr_tables
    pats = np.arange(1 << _RRR_B, dtype=np.uint16)
    cls = np.bitwise_count(pats).astype(np.uint8)
    order = np.argsort(cls, kind="stable")        # class-major, ascending
    pattern_by_code = pats[order]                 # (class base + offset) -> pattern
    offset_of_pattern = np.empty(1 << _RRR_B, dtype=np.uint16)
    counts = np.bincount(cls, minlength=_RRR_B + 1).astype(np.int64)
    base = np.concatenate([[0], np.cumsum(counts)])[:-1]
    offset_of_pattern[order] = (np.arange(1 << _RRR_B) -
                                np.repeat(base, counts)).astype(np.uint16)
    width_of_class = np.ceil(np.log2(np.maximum(counts, 2))).astype(np.uint8)
    width_of_class[counts == 1] = 0               # classes 0 and 15
    _rrr_tables = (pattern_by_code, offset_of_pattern, base.astype(np.int64),
                   width_of_class)
    return _rrr_tables


class BitVectorRRR:
    """H0-compressed vector: 15-bit blocks as (class, binomial-offset) with
    sampled rank and offset-pointer directories (sdsl rrr_vector<15> layout,
    ref bit_vector_sdsl.hpp bit_vector_rrr<15>)."""

    kind = "rrr"

    def __init__(self, bits: np.ndarray = None, *, _d=None):
        if _d is not None:
            return
        pattern_by_code, offset_of_pattern, base, width_of_class = _rrr_init()
        bits = np.asarray(bits).astype(np.uint8)
        self.n = len(bits)
        nb = max(-(-self.n // _RRR_B), 1)
        pad = nb * _RRR_B - self.n
        if pad:
            bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
        blocks = (bits.reshape(nb, _RRR_B)
                  << np.arange(_RRR_B, dtype=np.uint16)).sum(
                      axis=1, dtype=np.uint16)
        self._classes = np.bitwise_count(blocks).astype(np.uint8)
        self.num_set_bits = int(self._classes.sum(dtype=np.int64))
        widths = width_of_class[self._classes].astype(np.int64)
        offsets = offset_of_pattern[blocks].astype(np.uint64)
        self._off_words, starts = _pack_stream(offsets, widths)
        # samples every _RRR_SAMPLE blocks: cumulative rank + offset pointer
        csum = np.concatenate([[0], np.cumsum(self._classes,
                                              dtype=np.int64)])
        self._rank_samp = csum[::_RRR_SAMPLE].copy()
        self._ptr_samp = starts[:-1][::_RRR_SAMPLE].copy()

    def _block_decode(self, b):
        """(classes<=b's sample window scan) -> (rank_before_block,
        pattern_of_block) for block indices b (batch)."""
        pattern_by_code, _, base, width_of_class = _rrr_init()
        b = np.asarray(b, dtype=np.int64)
        s = b // _RRR_SAMPLE
        rank = self._rank_samp[s].copy()
        ptr = self._ptr_samp[s].copy()
        first = s * _RRR_SAMPLE
        nb = len(self._classes)
        for step in range(_RRR_SAMPLE):
            blk = first + step
            live = blk < np.minimum(b + 1, nb)
            cls = np.where(blk < nb, self._classes[np.minimum(blk, nb - 1)],
                           0).astype(np.int64)
            is_target = live & (blk == b)
            w = width_of_class[cls].astype(np.int64)
            off = _read_stream(self._off_words, ptr,
                               w.astype(np.uint64)).astype(np.int64)
            # non-target lanes read garbage offsets (their ptr hasn't been
            # walked); clamp before the table lookup, mask after
            code = np.clip(base[cls] + off, 0, (1 << _RRR_B) - 1)
            pat = np.where(is_target, pattern_by_code[code], 0)
            if step == 0:
                pattern = pat.astype(np.int64)
            else:
                pattern |= pat.astype(np.int64)
            before = live & (blk < b)
            rank += np.where(before, cls, 0)
            ptr += np.where(before, w, 0)
        return rank, pattern.astype(np.uint16)

    def rank1(self, i):
        i = np.atleast_1d(np.asarray(i, dtype=np.int64))
        b = np.minimum(i // _RRR_B, len(self._classes) - 1)
        r = i - b * _RRR_B                      # bits of block b to count
        rank, pat = self._block_decode(b)
        inblock = np.bitwise_count(
            (pat & ((np.uint16(1) << np.minimum(r, _RRR_B).astype(np.uint16))
                    - np.uint16(1))).astype(np.uint16)).astype(np.int64)
        return rank + inblock

    def select1(self, j):
        """Binary search on rank1 (select is off the hot path here)."""
        j = np.atleast_1d(np.asarray(j, dtype=np.int64))
        lo = np.zeros(len(j), dtype=np.int64)
        hi = np.full(len(j), self.n, dtype=np.int64)
        for _ in range(int(np.ceil(np.log2(self.n + 1))) + 1):
            mid = (lo + hi) >> 1
            le = self.rank1(mid + 1) <= j
            lo = np.where(le, mid + 1, lo)
            hi = np.where(le, hi, mid)
        return lo

    def get(self, i):
        i = np.atleast_1d(np.asarray(i, dtype=np.int64))
        b = i // _RRR_B
        _, pat = self._block_decode(b)
        return ((pat >> (i - b * _RRR_B).astype(np.uint16))
                & np.uint16(1)).astype(bool)

    def size_bytes(self) -> int:
        return (self._classes.nbytes // 2      # 4-bit classes when packed
                + self._off_words.nbytes + self._rank_samp.nbytes
                + self._ptr_samp.nbytes)

    def to_dict(self):
        return {"kind": "rrr", "n": self.n, "classes": self._classes,
                "off_words": self._off_words, "rank_samp": self._rank_samp,
                "ptr_samp": self._ptr_samp}

    @classmethod
    def from_dict(cls, d):
        obj = cls(_d=True)
        obj.n = int(d["n"])
        obj._classes = np.asarray(d["classes"], dtype=np.uint8)
        obj.num_set_bits = int(obj._classes.sum(dtype=np.int64))
        obj._off_words = np.asarray(d["off_words"], dtype=np.uint64)
        obj._rank_samp = np.asarray(d["rank_samp"], dtype=np.int64)
        obj._ptr_samp = np.asarray(d["ptr_samp"], dtype=np.int64)
        return obj


_KINDS = {"stat": BitVectorStat, "sd": BitVectorSD, "rrr": BitVectorRRR}


def predict_size_bits(n: int, m: int, kind: str) -> float:
    """Predicted footprint in bits (the reference's footprint() /
    predict_size heuristics, common/vectors/bit_vector.hpp:12)."""
    if kind == "stat":
        return n * 1.06
    if kind == "sd":
        l = max(int(np.floor(np.log2(max(n, 1) / m))) if m else 0, 0)
        return m * (l + 2.06) + (n >> l) * 1.06 + 64
    if kind == "rrr":
        nb = max(-(-n // _RRR_B), 1)
        d = m / max(n, 1)
        h0 = 0.0 if d in (0.0, 1.0) else \
            -(d * np.log2(d) + (1 - d) * np.log2(1 - d))
        return nb * (4 + h0 * _RRR_B) + (nb / _RRR_SAMPLE) * 96
    raise ValueError(kind)


def bit_vector_smallest(bits: np.ndarray = None, *, positions=None, n=None):
    """Adaptive chooser: build the representation with the smallest
    predicted footprint (the role of bit_vector_small/smart,
    common/vectors/bit_vector.hpp smallest_representation)."""
    if positions is not None:
        m = len(positions)
    else:
        bits = np.asarray(bits).astype(bool)
        n = len(bits)
        m = int(np.count_nonzero(bits))
    best = min(("stat", "sd", "rrr"),
               key=lambda k: predict_size_bits(n, m, k))
    if best == "sd":
        if positions is None:
            positions = np.flatnonzero(bits)
        return BitVectorSD(positions=positions, n=n)
    if positions is not None and bits is None:
        bits = np.zeros(n, dtype=np.uint8)
        bits[np.asarray(positions, dtype=np.int64)] = 1
    return _KINDS[best](bits)


def bitvector_from_dict(d):
    return _KINDS[str(d["kind"])].from_dict(d)
