"""KMC3 database reader (ref src/seq_io/kmc_parser.cpp — the reference links
the KMC library; here the public KMC3 file format is parsed directly).

Format (verified against the test databases):
  .kmc_pre: "KMCP" | prefix LUT (4^lut_prefix_length uint64 record offsets)
            | 64-byte header | header_offset u32 | "KMCP"
    header: kmer_length u32, mode u32, counter_size u32, lut_prefix_length u32,
            min_count u32, max_count u32, total_kmers u64, only_canonical u8...
  .kmc_suf: "KMCS" | records (suffix bytes + counter) * total | "KMCS"
    suffix packs (k - lut_prefix_length) 2-bit chars, first char in the
    most significant bits; prefix index encodes the first chars likewise.
"""

from __future__ import annotations

import struct
from typing import Iterator, Tuple

import numpy as np

_CODES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _strip_suffix(path: str) -> str:
    for suf in (".kmc_suf", ".kmc_pre"):
        if path.endswith(suf):
            return path[: -len(suf)]
    return path


class KMCDatabase:
    def __init__(self, path: str):
        base = _strip_suffix(path)
        pre = open(base + ".kmc_pre", "rb").read()
        if pre[:4] != b"KMCP" or pre[-4:] != b"KMCP":
            raise ValueError(f"{base}.kmc_pre: not a KMC database")
        header_offset = struct.unpack("<I", pre[-8:-4])[0]
        h = struct.unpack_from("<6IQ", pre, len(pre) - 8 - header_offset)
        (self.k, self.mode, self.counter_size, self.lut_prefix_length,
         self.min_count, self.max_count, self.total_kmers) = h
        only_canonical = pre[len(pre) - 8 - header_offset + 32]
        # GetBothStrands() semantics: the byte stores "single strand only"
        self.both_strands = only_canonical == 0
        n_prefixes = 4 ** self.lut_prefix_length
        self.lut = np.frombuffer(pre, dtype="<u8", count=n_prefixes, offset=4)

        suf = open(base + ".kmc_suf", "rb").read()
        if suf[:4] != b"KMCS":
            raise ValueError(f"{base}.kmc_suf: not a KMC database")
        suffix_chars = self.k - self.lut_prefix_length
        self.suffix_bytes = (suffix_chars + 3) // 4
        rec = self.suffix_bytes + self.counter_size
        self.records = np.frombuffer(
            suf, dtype=np.uint8, count=self.total_kmers * rec,
            offset=4).reshape(self.total_kmers, rec)

    def kmers_and_counts(self) -> Tuple[np.ndarray, np.ndarray]:
        """Decode all k-mers -> ((N, k) ACGT byte matrix, (N,) counts)."""
        N = self.total_kmers
        k = self.k
        lp = self.lut_prefix_length
        # prefix per record from LUT boundaries
        boundaries = np.concatenate([self.lut, [N]])
        lengths = np.diff(boundaries).astype(np.int64)
        prefix_vals = np.repeat(np.arange(len(self.lut), dtype=np.int64),
                                lengths)
        chars = np.empty((N, k), dtype=np.uint8)
        for i in range(lp):
            shift = 2 * (lp - 1 - i)
            chars[:, i] = _CODES[(prefix_vals >> shift) & 3]
        sfx = self.records[:, : self.suffix_bytes]
        pos = 0
        for b in range(self.suffix_bytes):
            byte = sfx[:, b].astype(np.int64)
            for j in range(4):
                if pos >= k - lp:
                    break
                chars[:, lp + pos] = _CODES[(byte >> (6 - 2 * j)) & 3]
                pos += 1
        counts = np.zeros(N, dtype=np.uint64)
        for b in range(self.counter_size):
            counts |= self.records[:, self.suffix_bytes + b].astype(np.uint64) \
                << np.uint64(8 * b)
        return chars, counts


def read_kmers(path: str, both_from_canonical: bool = True,
               min_count: int = 1, max_count: int = 2 ** 63):
    """-> ((N, k) ACGT byte matrix incl. rc expansion, counts)
    (ref kmc_parser.cpp:27-62)."""
    db = KMCDatabase(path)
    chars, counts = db.kmers_and_counts()
    keep = (counts >= min_count) & (counts < max_count)
    chars, counts = chars[keep], counts[keep]
    if both_from_canonical and db.both_strands:
        comp = np.zeros(256, dtype=np.uint8)
        comp[ord("A")], comp[ord("C")] = ord("T"), ord("G")
        comp[ord("G")], comp[ord("T")] = ord("C"), ord("A")
        rc = comp[chars[:, ::-1]]
        chars = np.concatenate([chars, rc], axis=0)
        counts = np.concatenate([counts, counts])
    return chars, counts, db.k


def is_kmc_file(path: str) -> bool:
    return path.endswith(".kmc_suf") or path.endswith(".kmc_pre")
