"""Succinct bit-vector rank/select with o(n) overhead.

Plays the role of the reference's bit_vector hierarchy
(src/common/vectors/bit_vector.hpp:12, bit_vector_sdsl.hpp:18): the round-1
host BOSS kept full int64 cumulative counts and select position lists
(~100 B/edge); this packs the bits into uint64 words (0.125 B/bit) with a
two-level rank directory (int64 superblock every 4096 bits + uint16 word
offsets, ~0.05 B/bit) and answers select by directory search + in-word byte
tables.  All operations come in batch (numpy vectorized) and scalar (pure
int) flavors — the batch forms are the same gather+popcount pattern the
device kernels use (succinct/ops.py).
"""

from __future__ import annotations

import numpy as np

_WORD = 64
_SUP = 64          # words per superblock -> 4096 bits


def _native():
    """Native batch kernels (native/fastio.cpp bitrank_*), or None."""
    from ..native import get_lib
    return get_lib()

# in-byte select tables
_POP8 = np.bitwise_count(np.arange(256, dtype=np.uint8)).astype(np.uint8)
_SEL8 = np.full((256, 8), 8, dtype=np.uint8)   # pos of (j+1)-th set bit
for _b in range(256):
    _pos = [i for i in range(8) if _b >> i & 1]
    _SEL8[_b, : len(_pos)] = _pos


class BitRank:
    """rank/select over a 0/1 uint8 array, packed to uint64 words."""

    def __init__(self, bits=None, *, words=None, n=None):
        if words is not None:
            self.n = int(n)
            self.words = words
        else:
            bits = np.asarray(bits)
            if bits.dtype != np.uint8:
                bits = bits.astype(np.uint8)
            self.n = len(bits)
            nw0 = max((self.n + _WORD - 1) // _WORD, 1)
            pad = nw0 * _WORD - self.n
            if pad:
                bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
            self.words = np.packbits(bits, bitorder="little").view(np.uint64)
        nw = len(self.words)
        wpop = np.bitwise_count(self.words).astype(np.int64)
        cum = np.concatenate([np.zeros(1, np.int64), np.cumsum(wpop)])
        self.total = int(cum[-1])
        # two-level directory: cum count at superblock start (int64) and at
        # word start relative to its superblock (uint16; <= 4096)
        self._sup = cum[:-1:_SUP].copy()
        nsup = len(self._sup)
        self._sub = (cum[:-1] - np.repeat(self._sup, _SUP)[: nw]) \
            .astype(np.uint16)
        # pad sub to a superblock multiple for vectorized select
        spad = nsup * _SUP - nw
        if spad:
            self._sub = np.concatenate(
                [self._sub, np.full(spad, 0xFFFF, np.uint16)])
        self._nw = nw
        self._ptrs = (self.words.ctypes.data, self._sup.ctypes.data,
                      self._sub.ctypes.data)

    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_ptrs", None)          # raw pointers don't survive pickling
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._ptrs = (self.words.ctypes.data, self._sup.ctypes.data,
                      self._sub.ctypes.data)

    # ------------------------------------------------------------------ rank
    def rank(self, i):
        """#set bits in [0..i] inclusive, vectorized; i < 0 -> 0."""
        i = np.asarray(i, dtype=np.int64)
        lib = _native()
        if lib is not None and i.size > 16:
            # cached int pointers: the per-call ctypes.data_as churn was
            # ~10%% of the aligner batch (320k casts per 480 reads)
            pw, ps, pb = self._ptrs
            iq = np.ascontiguousarray(i.reshape(-1))
            out = np.empty(iq.shape, dtype=np.int64)
            lib.bitrank_rank_batch(pw, ps, pb, self.n, iq.ctypes.data,
                                   iq.size, out.ctypes.data)
            return out.reshape(i.shape)
        if self.n == 0:
            return np.zeros(i.shape, dtype=np.int64)
        neg = i < 0
        i = np.where(neg, 0, np.minimum(i, self.n - 1))
        w = i >> 6
        off = (i & 63).astype(np.uint64)
        mask = ~np.uint64(0) >> (np.uint64(63) - off)
        r = (self._sup[w >> 6] + self._sub[w]
             + np.bitwise_count(self.words[w] & mask).astype(np.int64))
        return np.where(neg, 0, r)

    def rank_scalar(self, i: int) -> int:
        i = int(i)
        if i < 0 or self.n == 0:
            return 0
        if i >= self.n:
            i = self.n - 1
        w = i >> 6
        mask = (1 << ((i & 63) + 1)) - 1
        return (int(self._sup[w >> 6]) + int(self._sub[w])
                + (int(self.words[w]) & mask).bit_count())

    # ---------------------------------------------------------------- select
    def select(self, r):
        """position of the r-th set bit (r >= 1), vectorized.

        Out-of-range ranks clamp to the nearest valid rank (callers guard,
        same contract as the round-1 position-list implementation)."""
        r = np.asarray(r, dtype=np.int64)
        if self.total == 0:
            # no set bits anywhere: clamp past the end (callers guard)
            return np.full(r.shape, self.n, dtype=np.int64)
        lib = _native()
        if lib is not None and r.size > 16:
            pw, ps, pb = self._ptrs
            rq = np.ascontiguousarray(r.reshape(-1))
            out = np.empty(rq.shape, dtype=np.int64)
            lib.bitrank_select_batch(pw, ps, pb, self._nw, len(self._sup),
                                     self.total, rq.ctypes.data, rq.size,
                                     out.ctypes.data)
            return out.reshape(r.shape)
        r = np.clip(r, 1, max(self.total, 1))
        sup_cum = self._sup  # count before superblock start
        sb = np.maximum(np.searchsorted(sup_cum, r, side="left") - 1, 0)
        # some superblocks may be empty: searchsorted('left')-1 already lands
        # on the last superblock whose prefix count < r
        rr = r - sup_cum[sb]
        sub = self._sub[(sb[:, None] * _SUP
                         + np.arange(_SUP, dtype=np.int64)[None, :])
                        .reshape(-1)].reshape(-1, _SUP).astype(np.int64)
        w_local = np.maximum((sub < rr[:, None]).sum(axis=1) - 1, 0)
        w = sb * _SUP + w_local
        rw = rr - np.take_along_axis(sub, w_local[:, None], axis=1)[:, 0]
        word = self.words[np.minimum(w, self._nw - 1)]
        byts = (word[:, None] >> (np.uint64(8)
                                  * np.arange(8, dtype=np.uint64)[None, :])
                ).astype(np.uint8)
        bcnt = _POP8[byts].astype(np.int64)
        bcum = np.concatenate(
            [np.zeros((len(word), 1), np.int64), np.cumsum(bcnt, axis=1)],
            axis=1)
        bidx = np.maximum((bcum[:, :8] < rw[:, None]).sum(axis=1) - 1, 0)
        rb = rw - np.take_along_axis(bcum, bidx[:, None], axis=1)[:, 0]
        bval = np.take_along_axis(byts, bidx[:, None].astype(np.int64),
                                  axis=1)[:, 0]
        bitpos = _SEL8[bval, np.clip(rb - 1, 0, 7)].astype(np.int64)
        return w * 64 + bidx * 8 + bitpos

    def select_scalar(self, r: int) -> int:
        if self.total == 0:
            return self.n          # no set bits: clamp past the end
        r = int(r)
        if r < 1:
            r = 1
        elif r > self.total:
            r = max(self.total, 1)
        sb = max(int(np.searchsorted(self._sup, r, side="left")) - 1, 0)
        rr = r - int(self._sup[sb])
        base = sb * _SUP
        sub = self._sub[base: base + _SUP]
        w_local = max(int(np.searchsorted(sub, rr, side="left")) - 1, 0)
        w = base + w_local
        if w >= self._nw:
            w = self._nw - 1
            w_local = w - base
        rw = rr - int(sub[w_local])
        word = int(self.words[w])
        pos = w * 64
        while True:
            c = (word & 0xFF).bit_count()
            if rw <= c:
                break
            rw -= c
            word >>= 8
            pos += 8
        b = word & 0xFF
        return pos + int(_SEL8[b, rw - 1])

    # ------------------------------------------------------- succ/pred scans
    def succ_scalar(self, i: int) -> int:
        """first set-bit position >= i, or -1."""
        r = self.rank_scalar(i - 1) + 1
        if r > self.total:
            return -1
        return self.select_scalar(r)

    def pred_scalar(self, i: int) -> int:
        """last set-bit position <= i, or -1."""
        r = self.rank_scalar(i)
        if r == 0:
            return -1
        return self.select_scalar(r)

    def nbytes(self) -> int:
        return (self.words.nbytes + self._sup.nbytes + self._sub.nbytes)


def packed_eq(arr, value, chunk=1 << 24) -> BitRank:
    """BitRank over (arr == value) built chunkwise — never materializes the
    full boolean plane (bounded transient memory; mmap-friendly: `arr` may be
    a np.memmap and is streamed once)."""
    n = len(arr)
    nw = max((n + _WORD - 1) // _WORD, 1)
    by = np.zeros(nw * 8, dtype=np.uint8)
    for lo in range(0, n, chunk):          # chunk is a multiple of 64
        seg = np.asarray(arr[lo: lo + chunk]) == value
        pb = np.packbits(seg, bitorder="little")
        by[lo // 8: lo // 8 + len(pb)] = pb
    return BitRank(words=by.view(np.uint64), n=n)
