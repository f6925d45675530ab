"""Elias-Fano encoding of monotone integer sequences — vectorized.

The reference streams sorted k-mer chunks through an Elias-Fano encoder to
keep disk spill compact during external-memory construction
(ref common/elias_fano/elias_fano.hpp:37 EliasFanoEncoder,
sorted_set_disk_base.hpp:34).  This is the numpy equivalent: a monotone
uint64 sequence is split into fixed-width lower bits (packed) and a unary
upper-bits bitmap; encode/decode are single vectorized passes, ~n*(2 +
log2(universe/n))/8 bytes total.
"""

from __future__ import annotations

import numpy as np


def encode(values: np.ndarray):
    """Monotone (non-decreasing) uint64 array -> dict of codec arrays."""
    values = np.asarray(values, dtype=np.uint64)
    n = len(values)
    if n == 0:
        return {"n": 0, "lbits": 0, "lo": np.zeros(0, np.uint64),
                "hi": np.zeros(0, np.uint64), "base": np.uint64(0)}
    base = values[0]
    span = int(values[-1] - base) + 1
    lbits = max(int(np.floor(np.log2(max(span // n, 1)))), 0)
    rel = values - base
    lo_vals = rel & np.uint64((1 << lbits) - 1) if lbits else None
    hi_vals = (rel >> np.uint64(lbits)).astype(np.uint64)

    # pack lower bits contiguously into uint64 words
    if lbits:
        total_bits = n * lbits
        lo = np.zeros((total_bits + 63) // 64, dtype=np.uint64)
        starts = np.arange(n, dtype=np.uint64) * np.uint64(lbits)
        word = (starts >> np.uint64(6)).astype(np.int64)
        off = (starts & np.uint64(63)).astype(np.uint64)
        np.bitwise_or.at(lo, word, lo_vals << off)
        spill = off.astype(np.int64) + lbits > 64
        if spill.any():
            np.bitwise_or.at(lo, word[spill] + 1,
                             lo_vals[spill] >> (np.uint64(64) - off[spill]))
    else:
        lo = np.zeros(0, dtype=np.uint64)

    # unary upper bitmap: bit (hi[i] + i) set
    pos = hi_vals + np.arange(n, dtype=np.uint64)
    nbits = int(pos[-1]) + 1
    hi = np.zeros((nbits + 63) // 64, dtype=np.uint64)
    np.bitwise_or.at(hi, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))
    return {"n": n, "lbits": lbits, "lo": lo, "hi": hi, "base": base}


def decode(enc) -> np.ndarray:
    """Inverse of encode."""
    n = int(enc["n"])
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    lbits = int(enc["lbits"])
    hi_words = np.asarray(enc["hi"], dtype=np.uint64)
    import sys
    if sys.byteorder == "big":
        # encode places bits arithmetically (endian-independent values);
        # the uint8 view below assumes little-endian byte order per word
        hi_words = hi_words.byteswap()
    # positions of set bits, vectorized via unpackbits
    bits = np.unpackbits(hi_words.view(np.uint8), bitorder="little")
    pos = np.flatnonzero(bits).astype(np.uint64)[:n]
    hi_vals = pos - np.arange(n, dtype=np.uint64)
    if lbits:
        lo_words = np.asarray(enc["lo"], dtype=np.uint64)
        starts = np.arange(n, dtype=np.uint64) * np.uint64(lbits)
        word = (starts >> np.uint64(6)).astype(np.int64)
        off = starts & np.uint64(63)
        mask = np.uint64((1 << lbits) - 1)
        lo_vals = (lo_words[word] >> off) & mask
        spill = off.astype(np.int64) + lbits > 64
        if spill.any():
            extra = lo_words[word[spill] + 1] \
                << (np.uint64(64) - off[spill])
            lo_vals[spill] = (lo_vals[spill] | extra) & mask
        rel = (hi_vals << np.uint64(lbits)) | lo_vals
    else:
        rel = hi_vals
    return rel + np.uint64(enc["base"])


def size_bytes(enc) -> int:
    return int(enc["lo"].nbytes + enc["hi"].nbytes + 16)
