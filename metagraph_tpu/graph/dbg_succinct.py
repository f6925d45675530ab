"""DBGSuccinct — the de Bruijn graph facade over the BOSS table.

Ref: src/graph/representation/succinct/dbg_succinct.{hpp,cpp}.
Node index == BOSS edge index (npos = 0); `valid` masks out dummy edges, and
num_nodes counts valid edges only (ref dbg_succinct.cpp:680-684).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..kmer.alphabets import DNA, Alphabet
from ..kmer.extractor import KmerExtractor
from ..succinct.boss import BOSS
from ..succinct.construct import build_boss_arrays

BASIC = "basic"
CANONICAL = "canonical"
PRIMARY = "primary"


class DBGSuccinct:
    def __init__(self, boss: BOSS, k: int, mode: str = BASIC,
                 alphabet: Alphabet = DNA, mask_dummy: bool = True):
        self.boss = boss
        self.k = k                      # dbg k (= boss.k + 1)
        self.mode = mode
        self.alphabet = alphabet
        self.extractor = KmerExtractor(alphabet)
        self.masked = mask_dummy

    # ---------------------------------------------------------------- build
    @classmethod
    def build(cls, sequences: Sequence[bytes | str], k: int, mode: str = BASIC,
              alphabet: Alphabet = DNA, with_counts: bool = False,
              bits_per_count: int = 8, mask_dummy: bool = True,
              window_weights=None) -> "DBGSuccinct":
        """Build from raw sequences (ref cli/build.cpp:53 pipeline).

        ``window_weights``: per-sequence per-window k-mer counts (from extended
        FASTA sidecars) used instead of occurrence counting.
        """
        ex = KmerExtractor(alphabet)
        collector_mode = {"basic": "basic", "canonical": "both",
                          "primary": "basic"}[mode]
        kmers, counts = ex.extract(sequences, k, mode=collector_mode,
                                   with_counts=with_counts,
                                   window_weights=window_weights)
        arrays = build_boss_arrays(kmers, alph_size=alphabet.sigma,
                                   counts=counts if with_counts else None,
                                   bits_per_count=bits_per_count)
        return cls(BOSS(arrays), k, mode, alphabet, mask_dummy)

    # ---------------------------------------------------------------- stats
    def num_nodes(self) -> int:
        if self.masked:
            return int(self.boss._cum_valid[-1])
        return self.boss.num_edges

    def max_index(self) -> int:
        return self.boss.num_edges

    # ------------------------------------------------------------- mapping
    def map_to_nodes_sequentially(self, sequence: bytes | str) -> np.ndarray:
        """Node per k-mer window, no canonicalization (ref sequence_graph.hpp:49)."""
        codes = self.extractor.encode(sequence)
        edges = self.boss.map_sequence(codes)
        if self.masked:
            edges = np.where(self.boss.valid[edges] > 0, edges, 0)
        return edges

    def map_to_nodes(self, sequence: bytes | str) -> np.ndarray:
        if self.mode == CANONICAL:
            # canonical graphs contain both strands: forward mapping suffices
            # only for k-mers present; canonicalize per-kmer (ref CanonicalDBG)
            fwd = self.map_to_nodes_sequentially(sequence)
            if isinstance(sequence, str):
                sequence = sequence.encode()
            rc = _revcomp_bytes(sequence)
            bwd = self.map_to_nodes_sequentially(rc)[::-1]
            return np.where(fwd > 0, fwd, bwd)
        return self.map_to_nodes_sequentially(sequence)

    # ------------------------------------------------------------ sequences
    def get_node_kmers(self, nodes: np.ndarray) -> list[str]:
        chars = self.boss.get_edge_seq(np.asarray(nodes, dtype=np.int64))
        table = self.alphabet.decode_table
        return [table[row].tobytes().decode() for row in chars]

    # ------------------------------------------------------------- storage
    def save(self, path: str):
        self.boss.save(path if path.endswith(".npz") else path + ".dbg.npz")

    @classmethod
    def load(cls, path: str, mode: str = BASIC) -> "DBGSuccinct":
        boss = BOSS.load(path)
        return cls(boss, boss.k + 1, mode)


def _revcomp_bytes(seq: bytes) -> bytes:
    table = bytes.maketrans(b"ACGTacgtUu", b"TGCATGCAAA")
    return seq.translate(table)[::-1]
