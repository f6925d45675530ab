"""Vectorized k-mer extraction.

Replaces the reference's per-character sliding extraction loops
(ref kmer_extractor.cpp:69-237, kmer_collector.cpp:27-100) with dense window
operations: all input sequences are concatenated with one invalid separator
code between them, validity of every window is computed with one cumulative
sum, and the (N, K) code matrix is produced by a strided window view.  This is
the layout the device sort/build pipeline consumes directly.

Canonical semantics (ref kmer_extractor.cpp:110-141): the canonical form of a
window is the *smaller of the packed forward/reverse-complement k-mers under
the packed comparison order* (NOT plain string order).  For the BOSS pipeline
that order is the one-swapped co-lex order.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

from .alphabets import Alphabet, DNA, dna_encode_table
from . import packing


class KmerExtractor:
    """Extracts (N, K) code matrices of valid k-mers from raw sequences."""

    def __init__(self, alphabet: Alphabet = DNA):
        self.alphabet = alphabet
        if alphabet.name == "DNA":
            self._enc = dna_encode_table()
        else:
            self._enc = alphabet.encode_table
            if alphabet.name == "DNA5":
                # ref kBOSSCharToDNA (shared with DNA5): unknown chars are
                # the catch-all 'N' (a REAL character here), U/u -> T
                self._enc[self._enc == alphabet.sigma] = \
                    self._enc[ord("N")]
                self._enc[ord("U")] = self._enc[ord("T")]
                self._enc[ord("u")] = self._enc[ord("T")]
            elif alphabet.name == "DNA_CASE":
                # ref kBOSSCharToDNACaseSent: unknown -> 'N', U -> T, u -> t
                self._enc[self._enc == alphabet.sigma] = \
                    self._enc[ord("N")]
                self._enc[ord("U")] = self._enc[ord("T")]
                self._enc[ord("u")] = self._enc[ord("t")]
            elif alphabet.name == "Protein":
                # ref kBOSSCharToProtein: unknown -> catch-all 'X'
                self._enc[self._enc == alphabet.sigma] = \
                    self._enc[ord("X")]
        self._invalid = alphabet.sigma
        # code width for packed keys: the invalid marker (== sigma) must fit
        self._bits = packing.bits_for_alphabet(alphabet.sigma)

    def encode(self, seq: bytes | str) -> np.ndarray:
        if isinstance(seq, str):
            seq = seq.encode()
        return self._enc[np.frombuffer(seq, dtype=np.uint8)]

    def decode(self, codes: np.ndarray) -> str:
        return self.alphabet.decode_table[codes].tobytes().decode()

    def _concat_codes(self, seqs: Iterable[bytes | str]) -> np.ndarray:
        """Concatenate encoded sequences separated by an invalid code."""
        parts = []
        sep = np.array([self._invalid], dtype=np.uint8)
        for s in seqs:
            parts.append(self.encode(s))
            parts.append(sep)
        if not parts:
            return sep[:0]
        return np.concatenate(parts)

    def extended_complement_table(self) -> np.ndarray:
        """Complement map extended so the separator/invalid code maps to
        itself — the ONE table shared by every canonical window path
        (extractor, graph mapping, device pipeline, batch query graph)."""
        return np.concatenate(
            [self.alphabet.complement_table,
             np.arange(self.alphabet.sigma,
                       self._invalid + 1)]).astype(np.uint8)

    def valid_windows(self, codes: np.ndarray, K: int) -> np.ndarray:
        """Bool mask over window starts: window [j, j+K) contains no invalid code."""
        n = codes.shape[0]
        if n < K:
            return np.zeros(0, dtype=bool)
        bad = np.concatenate([[0], np.cumsum(codes >= self._invalid)])
        return (bad[K:] - bad[:-K]) == 0

    def window_codes(self, codes: np.ndarray, K: int) -> np.ndarray:
        """Strided (n-K+1, K) view of all windows (no copy)."""
        return np.lib.stride_tricks.sliding_window_view(codes, K)

    def extract(self, seqs: Sequence[bytes | str], K: int,
                mode: str = "basic", with_counts: bool = False,
                window_weights: Sequence[np.ndarray] | None = None):
        """Extract k-mers from sequences.

        mode:
          'basic'     — forward k-mers as they occur.
          'canonical' — the canonical (min of fwd/rc in BOSS packed order) k-mer
                        per window (ref KmerCollector::Mode::CANONICAL_ONLY).
          'both'      — every window's fwd and rc k-mer (used for canonical-mode
                        graphs, which contain both strands).

        Returns (chars, counts | None):
          chars  — (N, K) uint8 deduplicated sorted (BOSS order) code matrix
          counts — per-kmer multiplicities (uint64) if with_counts
        """
        packed, weights = self._packed_windows(seqs, K, mode, window_weights)
        if packed.shape[0] == 0:
            empty = np.zeros((0, K), dtype=np.uint8)
            return empty, (np.zeros(0, dtype=np.uint64) if with_counts else None)
        order = packing.boss_priority_order(K)
        if with_counts:
            w = np.ones(packed.shape[0], dtype=np.uint64) if weights is None \
                else weights
            upacked, counts = packing.unique_rows(packed, w)
        else:
            upacked, counts = packing.unique_rows(packed)
        return packing.unpack_codes(upacked, K, order,
                                    bits=self._bits), counts

    def _packed_windows(self, seqs, K: int, mode: str,
                        window_weights=None):
        """All (strand-expanded/canonicalized) windows as packed BOSS-order
        keys + aligned weights (None when no weights given)."""
        codes = self._concat_codes(seqs)
        valid = self.valid_windows(codes, K)
        order = packing.boss_priority_order(K)
        if int(valid.sum()) == 0:
            per = 64 // self._bits
            W = (K + per - 1) // per
            return (np.zeros((0, W), dtype=np.uint64),
                    np.zeros(0, np.uint64) if window_weights is not None
                    else None)

        weights = None
        if window_weights is not None:
            weights = np.zeros(len(codes) - K + 1, dtype=np.uint64)
            off = 0
            for s, w in zip(seqs, window_weights):
                L = len(s)
                nwin = max(L - K + 1, 0)
                if nwin:
                    weights[off: off + nwin] = np.asarray(w[:nwin],
                                                          dtype=np.uint64)
                off += L + 1
            weights = weights[valid]

        fwd = self.window_codes(codes, K)[valid]
        if mode == "basic":
            return packing.pack_codes(fwd, order, bits=self._bits), weights
        comp = self.extended_complement_table()
        # rc of window j of `codes` == window (n-K-j) of rc(codes)
        rc_codes = comp[codes[::-1]]
        rc_all = np.lib.stride_tricks.sliding_window_view(rc_codes, K)
        rc = rc_all[::-1][valid]
        if mode == "both":
            packed = np.concatenate(
                [packing.pack_codes(fwd, order, bits=self._bits),
                 packing.pack_codes(rc, order, bits=self._bits)], axis=0)
            if weights is not None:
                weights = np.concatenate([weights, weights])
            return packed, weights
        if mode == "canonical":
            kf = packing.pack_codes(fwd, order, bits=self._bits)
            kr = packing.pack_codes(rc, order, bits=self._bits)
            take_rc = _rows_greater(kf, kr)
            return np.where(take_rc[:, None], kr, kf), weights
        raise ValueError(f"unknown mode {mode!r}")

    def extract_disk(self, seqs: Sequence[bytes | str], K: int,
                     mode: str = "basic", with_counts: bool = False,
                     window_weights=None, ram_cap_bytes: int = 1 << 28,
                     tmp_dir: str | None = None, batch_bp: int = 1 << 24):
        """Bounded-RAM extraction: stream sequence batches into a
        SortedSetDisk (the reference's --disk-swap path,
        ref kmer_collector.cpp:27 + sorted_set_disk_base.hpp:34), then
        k-way-merge the spilled chunks.  Returns the same (chars, counts) as
        extract()."""
        from .disk_sort import SortedSetDisk
        sink = SortedSetDisk(ram_cap_bytes=ram_cap_bytes, tmp_dir=tmp_dir,
                             with_counts=with_counts)
        batch, bp, woff = [], 0, 0
        ww = window_weights

        def flush(batch, woff):
            w = ww[woff: woff + len(batch)] if ww is not None else None
            packed, weights = self._packed_windows(batch, K, mode, w)
            if len(packed):
                sink.insert(packed, weights if with_counts else None)

        for s in seqs:
            batch.append(s)
            bp += len(s)
            if bp >= batch_bp:
                flush(batch, woff)
                woff += len(batch)
                batch, bp = [], 0
        if batch:
            flush(batch, woff)
        upacked, counts = sink.merge_all()
        sink.cleanup()
        order = packing.boss_priority_order(K)
        if upacked.shape[0] == 0:
            return (np.zeros((0, K), dtype=np.uint8),
                    np.zeros(0, np.uint64) if with_counts else None)
        return packing.unpack_codes(upacked, K, order,
                                    bits=self._bits), counts


def _rows_greater(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Lexicographic a > b per row (shared loop in kmer/packing.py)."""
    return packing.rows_lex_gt(a, b)
