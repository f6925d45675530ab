"""Packed k-mer arrays and the BOSS ordering.

A batch of k-mers is a dense ``(N, K) uint8`` matrix of codes in the
sentinel-included code space ($=0, A=1, ..).  For sorting / dedup / search we
pack each k-mer into ``ceil(K/16)`` uint64 words, 4 bits per character,
most-significant-first in a chosen *priority order* of the characters.
Comparing the word tuples lexicographically then equals comparing the priority
character tuples — an order-preserving re-encoding of the reference's bit-packed
integers (ref kmer_boss.hpp:29: 64/128/256-bit ints, L bits/char).

Priority orders:

* BOSS ("one-swapped co-lex", ref kmer_boss.hpp:58-68): for the edge string
  s[0..K-1] (source node s[0..K-2], edge label s[K-1]) the comparison priority
  is  s[K-2], s[K-3], ..., s[0], s[K-1]  — node co-lex first, label last.
* co-lex (ref kmer.hpp): s[K-1], s[K-2], ..., s[0] — used for node strings.

On device the same packing uses uint32 words (8 chars each) so multi-key
``lax.sort`` and vectorized binary search stay in native 32-bit lanes.
"""

from __future__ import annotations

import numpy as np


def boss_priority_order(K: int) -> np.ndarray:
    """Column order (most significant first) for the BOSS edge-kmer comparison."""
    return np.array(list(range(K - 2, -1, -1)) + [K - 1], dtype=np.int64)


def colex_priority_order(K: int) -> np.ndarray:
    """Column order for plain co-lex comparison (node strings)."""
    return np.arange(K - 1, -1, -1, dtype=np.int64)


def pack_codes(chars: np.ndarray, order: np.ndarray | None = None,
               bits: int = 4) -> np.ndarray:
    """Pack (N, K) uint8 codes into (N, W) uint64 words.

    ``order`` lists columns most-significant first; default is left-to-right.
    Word 0 is the most significant word; within a word, the first character of
    the group sits in the top slot.  ``bits`` per code: 4 (codes < 16; the
    DNA/DNA5 default, 16 chars/word) or 8 (codes < 256; Protein, 8 chars/word).
    Both are order-preserving: packed-row comparison == code-row comparison.
    """
    chars = np.asarray(chars)
    if chars.ndim == 1:
        chars = chars[None, :]
    N, K = chars.shape
    if bits == 4 and N > 1024 and chars.dtype == np.uint8:
        from .. import native
        out = native.pack_rows64(
            chars, order if order is not None
            else np.arange(K, dtype=np.int32))
        if out is not None:
            return out
    if order is not None:
        chars = chars[:, order]
    per = 64 // bits
    W = (K + per - 1) // per
    out = np.zeros((N, W), dtype=np.uint64)
    for j in range(K):
        w, slot = divmod(j, per)
        shift = np.uint64(64 - bits - bits * slot)
        out[:, w] |= chars[:, j].astype(np.uint64) << shift
    return out


def unpack_codes(packed: np.ndarray, K: int, order: np.ndarray | None = None,
                 bits: int = 4) -> np.ndarray:
    """Inverse of pack_codes: (N, W) uint64 -> (N, K) uint8 codes."""
    packed = np.asarray(packed, dtype=np.uint64)
    if packed.ndim == 1:
        packed = packed[None, :]
    N = packed.shape[0]
    per = 64 // bits
    mask = np.uint64((1 << bits) - 1)
    chars = np.empty((N, K), dtype=np.uint8)
    for j in range(K):
        w, slot = divmod(j, per)
        shift = np.uint64(64 - bits - bits * slot)
        chars[:, j] = ((packed[:, w] >> shift) & mask).astype(np.uint8)
    if order is not None:
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        chars = chars[:, inv]
    return chars


def rows_lex_lt(a, b, xp=np):
    """Lexicographic a < b over the trailing word axis; b broadcasts
    (single cut row or same shape).  Works for numpy and jax.numpy (pass
    xp=jnp inside jit) — the ONE row-compare loop shared by extractor,
    disk sort, device ops, sharded build, and the device pipeline."""
    lt = xp.zeros(a.shape[:-1], dtype=bool)
    decided = xp.zeros(a.shape[:-1], dtype=bool)
    for w in range(a.shape[-1]):
        aw, bw = a[..., w], b[..., w]
        lt = lt | (~decided & (aw < bw))
        decided = decided | (aw != bw)
    return lt


def rows_lex_gt(a, b, xp=np):
    """Lexicographic a > b over the trailing word axis (see rows_lex_lt)."""
    gt = xp.zeros(a.shape[:-1], dtype=bool)
    decided = xp.zeros(a.shape[:-1], dtype=bool)
    for w in range(a.shape[-1]):
        aw, bw = a[..., w], b[..., w]
        gt = gt | (~decided & (aw > bw))
        decided = decided | (aw != bw)
    return gt


def bits_for_alphabet(alph_size: int) -> int:
    """Code width for pack_codes: 4 when every code (incl. the invalid-char
    marker == alph_size) fits a nibble, else 8."""
    return 4 if alph_size < 16 else 8


def _void_view(packed: np.ndarray) -> np.ndarray:
    """View (N, W) uint64 rows as opaque fixed-size keys comparable bytewise."""
    be = np.ascontiguousarray(packed.astype(">u8"))
    return be.view(f"V{be.shape[1] * 8}").ravel()


def lexsort_rows(packed: np.ndarray) -> np.ndarray:
    """argsort of (N, W) uint64 rows in lexicographic (word 0 first) order.

    Large inputs go through the native stable parallel row sorter (the
    ips4o analog, ref sorted_set.cpp:43; ~4x numpy at 8 threads).  The
    numpy fallback: np.lexsort over the word columns (last key primary) —
    stable, so equal rows keep input order."""
    if packed.dtype == np.uint64 and len(packed) > (1 << 15):
        from .. import native
        out = native.argsort_rows64(packed)
        if out is not None:
            return out
    if packed.shape[1] == 1:
        return np.argsort(packed[:, 0], kind="stable")
    return np.lexsort(tuple(packed[:, w]
                            for w in range(packed.shape[1] - 1, -1, -1)))


def sort_rows(packed: np.ndarray) -> np.ndarray:
    return packed[lexsort_rows(packed)]


def unique_rows(packed: np.ndarray, counts: np.ndarray | None = None):
    """Sort + dedupe rows.  If ``counts`` given, sums counts of duplicates.

    Returns (unique_sorted_rows, summed_counts or None).
    """
    if packed.shape[0] == 0:
        return packed, (counts if counts is None else counts[:0])
    idx = lexsort_rows(packed)
    s = packed[idx]
    new = np.empty(s.shape[0], dtype=bool)
    new[0] = True
    np.any(s[1:] != s[:-1], axis=1, out=new[1:])
    if counts is None:
        return s[new], None
    starts = np.flatnonzero(new)
    csum = np.concatenate([[0], np.cumsum(counts[idx])])
    ends = np.concatenate([starts[1:], [s.shape[0]]])
    return s[new], (csum[ends] - csum[starts])


def searchsorted_rows(sorted_packed: np.ndarray, query_packed: np.ndarray,
                      side: str = "left") -> np.ndarray:
    """np.searchsorted generalized to multiword row keys."""
    return np.searchsorted(_void_view(sorted_packed), _void_view(query_packed), side=side)


def rows_in(sorted_packed: np.ndarray, query_packed: np.ndarray) -> np.ndarray:
    """Membership of query rows in sorted unique rows (bool mask)."""
    if sorted_packed.shape[0] == 0:
        return np.zeros(query_packed.shape[0], dtype=bool)
    pos = searchsorted_rows(sorted_packed, query_packed, side="left")
    pos_c = np.minimum(pos, sorted_packed.shape[0] - 1)
    return (pos < sorted_packed.shape[0]) & np.all(
        sorted_packed[pos_c] == query_packed, axis=1)


def rows_equal_adjacent(packed: np.ndarray) -> np.ndarray:
    """For sorted rows: mask[i] = (row[i] == row[i+1]); last entry False."""
    out = np.zeros(packed.shape[0], dtype=bool)
    if packed.shape[0] > 1:
        np.all(packed[1:] == packed[:-1], axis=1, out=out[:-1])
    return out


def reverse_complement(chars: np.ndarray, complement_table: np.ndarray) -> np.ndarray:
    """(N, K) codes -> reverse complement codes (ref kmer_extractor.cpp:47-62)."""
    return complement_table[chars[:, ::-1]]
