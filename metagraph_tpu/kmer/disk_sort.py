"""Disk-backed sorted k-mer set with bounded RAM — the external-memory
construction path.

The reference's SortedSetDisk accumulates k-mers in a fixed-size RAM buffer,
sorts and spills Elias-Fano-compressed chunks to disk, then k-way-merges the
chunks through a ChunkedWaitQueue (ref
common/sorted_sets/sorted_set_disk_base.hpp:34, elias_fano/elias_fano.hpp:37,
threads/chunked_wait_queue.hpp:51).  The array-first equivalent:

  insert(batch) -> RAM buffer; on overflow: sort+unique+sum, EF-encode, spill
  merge()       -> windowed k-way merge: read a bounded block from every
                   chunk, cut at the global minimum of the chunk heads' last
                   keys, merge-sort the window, emit unique rows + summed
                   counts.  Peak RAM = block_rows x n_chunks x row bytes.

Keys are (N, W) uint32 packed rows sorted lexicographically; each chunk
stores the leading 64 bits Elias-Fano-encoded (monotone within a sorted
chunk) and the remaining words raw.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Iterator, Tuple

import numpy as np

from ..common import elias_fano as ef
from . import packing


def _sort_unique_sum(keys: np.ndarray, counts: np.ndarray | None):
    # packing.unique_rows does the sort+dedupe+count-sum (cumsum
    # differencing — much faster than the np.add.at scatter it replaces)
    uniq, sums = packing.unique_rows(
        keys, counts.astype(np.uint64) if counts is not None else None)
    return uniq, sums


def _row_less(a: np.ndarray, b: np.ndarray) -> bool:
    """Lexicographic a < b for single rows."""
    for x, y in zip(a.tolist(), b.tolist()):
        if x != y:
            return x < y
    return False


def _hi64(keys: np.ndarray) -> Tuple[np.ndarray, int]:
    """(leading 64 bits of each packed row, #words folded) — monotone when
    rows are sorted.  Rows may be uint64 or uint32 words."""
    if keys.dtype == np.uint64:
        return keys[:, 0], 1
    W = keys.shape[1]
    hi = keys[:, 0].astype(np.uint64) << np.uint64(32)
    if W > 1:
        hi |= keys[:, 1].astype(np.uint64)
        return hi, 2
    return hi, 1


class SortedSetDisk:
    """Bounded-RAM sorted multiset of packed k-mer rows (+ counts)."""

    def __init__(self, ram_cap_bytes: int = 1 << 28, tmp_dir: str | None = None,
                 with_counts: bool = False):
        self.ram_cap = max(int(ram_cap_bytes), 1 << 16)
        self.dir = tempfile.mkdtemp(prefix="mg_sortdisk_",
                                    dir=tmp_dir or None)
        self.with_counts = with_counts
        self._bufs = []
        self._cnts = []
        self._buf_bytes = 0
        self._chunks = []
        self.spilled_bytes = 0

    # ------------------------------------------------------------- insert
    def insert(self, keys: np.ndarray, counts: np.ndarray | None = None):
        if not len(keys):
            return
        assert keys.dtype in (np.uint32, np.uint64), keys.dtype
        keys = np.ascontiguousarray(keys)
        self._bufs.append(keys)
        if self.with_counts:
            self._cnts.append(
                np.ones(len(keys), np.uint64) if counts is None
                else np.asarray(counts, dtype=np.uint64))
        self._buf_bytes += keys.nbytes
        if self.with_counts:
            self._buf_bytes += self._cnts[-1].nbytes
        if self._buf_bytes >= self.ram_cap:
            self._spill()

    def _spill(self):
        if not self._bufs:
            return
        keys = np.concatenate(self._bufs)
        counts = np.concatenate(self._cnts) if self.with_counts else None
        self._bufs, self._cnts, self._buf_bytes = [], [], 0
        uniq, sums = _sort_unique_sum(keys, counts)
        path = os.path.join(self.dir, f"chunk_{len(self._chunks)}.npz")
        hi_vals, folded = _hi64(uniq)
        hi = ef.encode(hi_vals)
        payload = {"n": len(uniq), "W": uniq.shape[1], "folded": folded,
                   "u64": uniq.dtype == np.uint64,
                   "hi_n": hi["n"], "hi_lbits": hi["lbits"],
                   "hi_lo": hi["lo"], "hi_hi": hi["hi"],
                   "hi_base": hi["base"],
                   "rest": uniq[:, folded:]}
        if sums is not None:
            payload["counts"] = sums
        np.savez(path, **payload)
        self.spilled_bytes += os.path.getsize(path)
        self._chunks.append(path)

    # -------------------------------------------------------------- merge
    def _open_chunk(self, path):
        """Decode one EF chunk into DISK-backed memmaps (scratch .npy next
        to the chunk) and return mmap views.  Only ONE chunk's arrays are
        RAM-resident at a time (each chunk is <= the spill cap by
        construction); the merge loop then reads bounded block slices, so
        total resident RAM stays O(ram_cap + block_rows * n_chunks) instead
        of the whole spilled set."""
        scratch_k = path + ".keys.npy"
        scratch_c = path + ".counts.npy"
        if not os.path.exists(scratch_k):
            z = np.load(path, mmap_mode="r")
            n = int(z["n"])
            W = int(z["W"])
            folded = int(z["folded"])
            hi = ef.decode({"n": int(z["hi_n"]),
                            "lbits": int(z["hi_lbits"]),
                            "lo": z["hi_lo"], "hi": z["hi_hi"],
                            "base": z["hi_base"]})
            dt = np.uint64 if bool(z["u64"]) else np.uint32
            keys = np.lib.format.open_memmap(scratch_k, mode="w+",
                                             dtype=dt, shape=(n, W))
            if dt == np.uint64:
                keys[:, 0] = hi
            else:
                keys[:, 0] = (hi >> np.uint64(32)).astype(np.uint32)
                if folded > 1:
                    keys[:, 1] = (hi
                                  & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            if W > folded:
                keys[:, folded:] = z["rest"]
            keys.flush()
            del keys, hi
            if "counts" in z.files:
                c = np.lib.format.open_memmap(scratch_c, mode="w+",
                                              dtype=np.uint64,
                                              shape=(n,))
                c[:] = z["counts"]
                c.flush()
                del c
        keys = np.load(scratch_k, mmap_mode="r")
        counts = np.load(scratch_c, mmap_mode="r") \
            if os.path.exists(scratch_c) else None
        return keys, counts

    def merge(self, block_rows: int = 1 << 18
              ) -> Iterator[Tuple[np.ndarray, np.ndarray | None]]:
        """Yield (keys, counts) blocks of the merged sorted unique stream.

        Each yielded block is sorted, unique, and strictly precedes the next
        block; peak resident size is O(block_rows * n_chunks)."""
        self._spill()
        chunks = [self._open_chunk(p) for p in self._chunks]
        ptrs = [0] * len(chunks)
        carry_k = carry_c = None
        while True:
            heads, head_c, cuts = [], [], []
            for i, (keys, counts) in enumerate(chunks):
                lo = ptrs[i]
                hi = min(lo + block_rows, len(keys))
                if hi > lo:
                    heads.append(keys[lo:hi])
                    if self.with_counts:
                        head_c.append(np.asarray(counts[lo:hi],
                                                 dtype=np.uint64))
                    if hi < len(keys):
                        cuts.append(keys[hi - 1])
            if carry_k is not None and len(carry_k):
                heads.append(carry_k)
                if self.with_counts:
                    head_c.append(carry_c)
            if not heads:
                return
            window = np.concatenate(heads)
            wc = np.concatenate(head_c) if self.with_counts else None
            # cut at the smallest "last fully read key" so no later chunk row
            # can interleave below it
            if cuts:
                cut = cuts[0]
                for c in cuts[1:]:
                    if _row_less(c, cut):
                        cut = c
                take = ~packing.rows_lex_gt(window, cut)
            else:
                take = np.ones(len(window), dtype=bool)
            emit_k, emit_c = window[take], \
                (wc[take] if self.with_counts else None)
            carry_k, carry_c = window[~take], \
                (wc[~take] if self.with_counts else None)
            for i in range(len(chunks)):
                ptrs[i] = min(ptrs[i] + block_rows, len(chunks[i][0]))
            if len(emit_k):
                yield _sort_unique_sum(emit_k, emit_c)

    def merge_all(self):
        """Materialize the full merged set (for final table emission)."""
        parts_k, parts_c = [], []
        for k, c in self.merge():
            parts_k.append(k)
            if self.with_counts:
                parts_c.append(c)
        if not parts_k:
            W = 0
            return (np.zeros((0, W), np.uint32),
                    np.zeros(0, np.uint64) if self.with_counts else None)
        return (np.concatenate(parts_k),
                np.concatenate(parts_c) if self.with_counts else None)

    def cleanup(self):
        shutil.rmtree(self.dir, ignore_errors=True)
