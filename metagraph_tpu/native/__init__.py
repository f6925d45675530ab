"""ctypes bindings for the native data-loading kernels (native/fastio.cpp).

The shared library is built on demand with g++; all entry points degrade
gracefully to the numpy implementations when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native")
_SRCS = [os.path.join(_NATIVE_DIR, "fastio.cpp"),
         os.path.join(_NATIVE_DIR, "align_engine.cpp")]
_SRC = _SRCS[0]
_SO = os.path.join(_HERE, "_fastio.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread"] + [s for s in _SRCS if os.path.exists(s)]
            + ["-o", _SO],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib or None
    src_mtime = max((os.path.getmtime(s) for s in _SRCS
                     if os.path.exists(s)), default=0)
    if not os.path.exists(_SO) or src_mtime > os.path.getmtime(_SO):
        if not os.path.exists(_SRC) or not _build():
            _lib = False
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _lib = False
        return None
    lib.fasta_encode.restype = ctypes.c_int64
    lib.fasta_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    lib.pack_windows_boss.restype = None
    lib.pack_windows_boss.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p]
    lib.pack_windows_boss32.restype = None
    lib.pack_windows_boss32.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p]
    lib.dust_low_complexity.restype = ctypes.c_int
    lib.dust_low_complexity.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32]
    lib.pack_rows64.restype = None
    lib.pack_rows64.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int32]
    lib.bitrank_rank_batch.restype = None
    lib.bitrank_rank_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib.bitrank_select_batch.restype = None
    lib.bitrank_select_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p]
    lib.boss_map_edges_batch.restype = None
    lib.boss_map_edges_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32]
    lib.bitrank_rank_multi.restype = None
    lib.bitrank_rank_multi.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib.bitrank_select_multi.restype = None
    lib.bitrank_select_multi.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_void_p]
    lib.refbase_build.restype = None
    lib.refbase_build.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.tile_pack2.restype = ctypes.c_int64
    lib.tile_pack2.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int32]
    lib.refbase_query.restype = None
    lib.refbase_query.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32]
    lib.refbase_lookup.restype = None
    lib.refbase_lookup.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32]
    lib.argsort_rows64.restype = None
    lib.argsort_rows64.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
        ctypes.c_int32]
    lib.count_rows.restype = None
    lib.count_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32]
    lib.align_wave.restype = None
    lib.align_wave.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p]
    _lib = lib
    return lib


class RefBaseline:
    """C-speed stand-in for the reference engine's per-core batch query path
    (hash lookup + per-sequence label counting; see native/fastio.cpp for why
    the actual reference binary cannot be built here)."""

    def __init__(self, keys: np.ndarray, ids: np.ndarray,
                 bitmap: np.ndarray | None = None):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native toolchain unavailable")
        # reject silent value-truncating casts (uint64 keys must be .view()ed
        # to uint32 pairs by the caller, not astype()d)
        assert np.asarray(keys).dtype.itemsize == 4, np.asarray(keys).dtype
        keys = np.ascontiguousarray(keys, dtype=np.uint32)
        ids = np.ascontiguousarray(ids, dtype=np.uint32)
        n, W = keys.shape
        M = 1 << int(np.ceil(np.log2(max(n / 0.6, 2))))
        self.tkeys = np.empty((M, W), dtype=np.uint32)
        self.tids = np.empty(M, dtype=np.uint32)
        lib.refbase_build(keys.ctypes.data_as(ctypes.c_void_p),
                          ids.ctypes.data_as(ctypes.c_void_p), n, W,
                          self.tkeys.ctypes.data_as(ctypes.c_void_p),
                          self.tids.ctypes.data_as(ctypes.c_void_p), M)
        self.M, self.W = M, W
        self.bitmap = None if bitmap is None \
            else np.ascontiguousarray(bitmap, dtype=np.uint32)

    def lookup(self, queries: np.ndarray, n_threads: int = 1) -> np.ndarray:
        """(Q, W) packed window keys -> (Q,) int64 node ids (0 = miss)."""
        lib = get_lib()
        queries = np.ascontiguousarray(queries, dtype=np.uint32)
        out = np.empty(len(queries), dtype=np.int64)
        lib.refbase_lookup(
            self.tkeys.ctypes.data_as(ctypes.c_void_p),
            self.tids.ctypes.data_as(ctypes.c_void_p), self.M, self.W,
            queries.ctypes.data_as(ctypes.c_void_p), len(queries),
            out.ctypes.data_as(ctypes.c_void_p), n_threads)
        return out

    def query(self, queries: np.ndarray, seq_ids: np.ndarray, num_seqs: int,
              num_labels: int, n_threads: int = 1):
        """-> (counts (S, L) int32, present (S,) int32)."""
        lib = get_lib()
        queries = np.ascontiguousarray(queries, dtype=np.uint32)
        seq_ids = np.ascontiguousarray(seq_ids, dtype=np.int32)
        counts = np.empty((num_seqs, num_labels), dtype=np.int32)
        present = np.empty(num_seqs, dtype=np.int32)
        lib.refbase_query(
            self.tkeys.ctypes.data_as(ctypes.c_void_p),
            self.tids.ctypes.data_as(ctypes.c_void_p), self.M, self.W,
            queries.ctypes.data_as(ctypes.c_void_p),
            seq_ids.ctypes.data_as(ctypes.c_void_p), len(queries),
            self.bitmap.ctypes.data_as(ctypes.c_void_p),
            self.bitmap.shape[0], self.bitmap.shape[1], num_labels, num_seqs,
            counts.ctypes.data_as(ctypes.c_void_p),
            present.ctypes.data_as(ctypes.c_void_p), n_threads)
        return counts, present


def argsort_rows64(keys: np.ndarray, n_threads: int | None = None):
    """Stable lexicographic argsort of (N, W) uint64 rows via the native
    parallel sorter (the ips4o analog, ref sorted_set.cpp:43); None when
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    out = np.empty(len(keys), dtype=np.int64)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 8)
    lib.argsort_rows64(keys.ctypes.data_as(ctypes.c_void_p), len(keys),
                       keys.shape[1], out.ctypes.data_as(ctypes.c_void_p),
                       n_threads)
    return out


def count_rows(rows: np.ndarray, seq_ids: np.ndarray, bitmap: np.ndarray,
               num_seqs: int, num_labels: int, n_threads: int = 1):
    """Per-sequence label-occurrence counts from pre-mapped annotation rows
    (-1 = miss).  seq_ids must be non-decreasing (threads split at sequence
    boundaries).  -> (counts (S, L) int32, present (S,) int32); None when
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    seq_ids = np.ascontiguousarray(seq_ids, dtype=np.int32)
    bitmap = np.ascontiguousarray(bitmap, dtype=np.uint32)
    counts = np.empty((num_seqs, num_labels), dtype=np.int32)
    present = np.empty(num_seqs, dtype=np.int32)
    lib.count_rows(
        rows.ctypes.data_as(ctypes.c_void_p),
        seq_ids.ctypes.data_as(ctypes.c_void_p), len(rows),
        bitmap.ctypes.data_as(ctypes.c_void_p),
        bitmap.shape[0], bitmap.shape[1], num_labels, num_seqs,
        counts.ctypes.data_as(ctypes.c_void_p),
        present.ctypes.data_as(ctypes.c_void_p), n_threads)
    return counts, present


def fasta_encode(data: bytes):
    """FASTA/FASTQ bytes -> (codes uint8 incl. separators, record offsets)."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.empty(len(data) + 2, dtype=np.uint8)
    max_records = data.count(b">") + data.count(b"@") + 2
    offsets = np.empty(max_records, dtype=np.int64)
    n_records = ctypes.c_int64(0)
    n = lib.fasta_encode(
        data if isinstance(data, bytes) else bytes(data), len(data),
        codes.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p),
        max_records, ctypes.byref(n_records))
    if n < 0:
        return None
    return codes[:n], offsets[: n_records.value]


def pack_windows_boss(codes: np.ndarray, k: int, bits: int = 64):
    """codes -> packed window keys in BOSS order; invalid windows = ~0."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    n_win = len(codes) - k + 1
    if n_win <= 0:
        W = (k + 15) // 16 if bits == 64 else (k + 7) // 8
        dt = np.uint64 if bits == 64 else np.uint32
        return np.zeros((0, W), dtype=dt)
    if bits == 64:
        W = (k + 15) // 16
        out = np.empty((n_win, W), dtype=np.uint64)
        lib.pack_windows_boss(codes.ctypes.data_as(ctypes.c_void_p),
                              len(codes), k,
                              out.ctypes.data_as(ctypes.c_void_p))
    else:
        W = (k + 7) // 8
        out = np.empty((n_win, W), dtype=np.uint32)
        lib.pack_windows_boss32(codes.ctypes.data_as(ctypes.c_void_p),
                                len(codes), k,
                                out.ctypes.data_as(ctypes.c_void_p))
    return out


def tile_pack2(seqs, K: int, T: int, n_threads: int | None = None):
    """Raw sequence byte strings -> 2-bit packed device query tiles.

    Returns (packed2 (N, TKp/4) uint8, validb (N, ceil(TK/8)) uint8,
    tile_seq (N,) int32, nwins list) where TK = T+K-1 and TKp is TK rounded
    up to a multiple of 4 — the transfer-optimal layout for
    query_epoch_codes2 (2.25 bits/bp on the wire instead of 8).
    None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    nwins = np.maximum(lens - K + 1, 0)
    n_tiles = int((-(-nwins // T)).sum())
    TK = T + K - 1
    TKp = (TK + 3) & ~3
    packed2 = np.empty((n_tiles, TKp // 4), dtype=np.uint8)
    validb = np.empty((n_tiles, (TK + 7) // 8), dtype=np.uint8)
    tile_seq = np.empty(n_tiles, dtype=np.int32)
    if n_tiles:
        cat = b"".join(bytes(s) for s in seqs)
        if n_threads is None:
            n_threads = min(os.cpu_count() or 1, 8)
        nt = lib.tile_pack2(
            cat, lens.ctypes.data_as(ctypes.c_void_p), len(seqs), K, T,
            packed2.ctypes.data_as(ctypes.c_void_p),
            validb.ctypes.data_as(ctypes.c_void_p),
            tile_seq.ctypes.data_as(ctypes.c_void_p), n_threads)
        assert nt == n_tiles, (nt, n_tiles)
    return packed2, validb, tile_seq, nwins.tolist()


def dust_low_complexity(window: bytes, T: int = 20, W: int = 64):
    """Symmetric DUST check; None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    return bool(lib.dust_low_complexity(window, len(window), T, W))


def pack_rows64(chars, order, n_threads: int | None = None):
    """(N, K) uint8 codes + column order -> (N, W) uint64 nibble words,
    row ranges packed by a worker-thread pool (the data-parallel ingest of
    ref kmer_collector.cpp:27-100); None when the native lib is
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np
    chars = np.ascontiguousarray(chars, dtype=np.uint8)
    order32 = np.ascontiguousarray(order, dtype=np.int32)
    N, K = chars.shape
    W = (K + 15) // 16
    out = np.empty((N, W), dtype=np.uint64)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 8)
    lib.pack_rows64(chars.ctypes.data_as(ctypes.c_void_p), N, K,
                    order32.ctypes.data_as(ctypes.c_void_p),
                    out.ctypes.data_as(ctypes.c_void_p), n_threads)
    return out
