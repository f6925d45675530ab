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
_SRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native",
                    "fastio.cpp")
_SO = os.path.join(_HERE, "_fastio.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib or None
    if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                   os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
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
        ctypes.c_void_p]
    _lib = lib
    return lib


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


def dust_low_complexity(window: bytes, T: int = 20, W: int = 64):
    """Symmetric DUST check; None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    return bool(lib.dust_low_complexity(window, len(window), T, W))


def pack_rows64(chars, order):
    """(N, K) uint8 codes + column order -> (N, W) uint64 nibble words;
    None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np
    chars = np.ascontiguousarray(chars, dtype=np.uint8)
    order32 = np.ascontiguousarray(order, dtype=np.int32)
    N, K = chars.shape
    W = (K + 15) // 16
    out = np.empty((N, W), dtype=np.uint64)
    lib.pack_rows64(chars.ctypes.data_as(ctypes.c_void_p), N, K,
                    order32.ctypes.data_as(ctypes.c_void_p),
                    out.ctypes.data_as(ctypes.c_void_p))
    return out
