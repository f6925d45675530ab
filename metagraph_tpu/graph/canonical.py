"""Canonical and reverse-complement graph views
(ref src/graph/representation/canonical_dbg.{hpp,cpp}, rc_dbg.hpp:18).

CanonicalDBG presents a PRIMARY graph as canonical: node ids 1..N are the
base graph's nodes, N+1..2N their reverse complements
(ref canonical_dbg.hpp:22-41; get_base_node arithmetic at :38-41).
"""

from __future__ import annotations

import numpy as np

REVCOMP = bytes.maketrans(b"ACGTacgt", b"TGCATGCA")


def revcomp(seq: bytes) -> bytes:
    return seq.translate(REVCOMP)[::-1]


class CanonicalDBG:
    def __init__(self, graph):
        assert graph.mode in ("primary", "basic")
        self.graph = graph
        self.k = graph.k
        self.mode = "canonical"
        self.alphabet = graph.alphabet
        self.extractor = graph.extractor
        self.offset = graph.max_index()

    def num_nodes(self) -> int:
        return self.graph.num_nodes() * 2

    def max_index(self) -> int:
        return self.offset * 2

    def get_base_node(self, node: int) -> int:
        """ref canonical_dbg.hpp:38-41."""
        return node if node <= self.offset else node - self.offset

    def reverse_complement_node(self, node: int) -> int:
        return node + self.offset if node <= self.offset else node - self.offset

    # ------------------------------------------------------------- mapping
    def map_to_nodes_sequentially(self, sequence) -> np.ndarray:
        """Map in the given orientation: forward hit -> base id,
        rc hit -> base id + offset."""
        if isinstance(sequence, str):
            sequence = sequence.encode()
        fwd = self.graph.map_to_nodes_sequentially(sequence)
        missing = fwd == 0
        if missing.any():
            rc = self.graph.map_to_nodes_sequentially(revcomp(sequence))[::-1]
            fwd = np.where(missing & (rc > 0), rc + self.offset, fwd)
        return fwd

    def map_to_nodes(self, sequence) -> np.ndarray:
        """Canonical mapping: each k-mer maps to the canonical form's node
        (ref sequence_graph.hpp:49-55)."""
        return self.map_to_nodes_sequentially(sequence)

    # ------------------------------------------------------------ traversal
    def _node_seq(self, node: int) -> bytes:
        base = self.get_base_node(node)
        s = self.graph.get_node_sequence(base)
        return s if node <= self.offset else revcomp(s)

    def get_node_sequence(self, node: int) -> bytes:
        return self._node_seq(node)

    def _lookup(self, kmer: bytes) -> int:
        n = self.graph.map_to_nodes_sequentially(kmer)
        if len(n) and n[0]:
            return int(n[0])
        n = self.graph.map_to_nodes_sequentially(revcomp(kmer))
        if len(n) and n[0]:
            return int(n[0]) + self.offset
        return 0

    def call_outgoing_kmers(self, node: int):
        seq = self._node_seq(node)
        out = []
        for ch in "ACGT":
            nid = self._lookup(seq[1:] + ch.encode())
            if nid:
                out.append((nid, ch))
        return out

    def call_incoming_kmers(self, node: int):
        seq = self._node_seq(node)
        out = []
        for ch in "ACGT":
            nid = self._lookup(ch.encode() + seq[:-1])
            if nid:
                out.append((nid, ch))
        return out

    def traverse(self, node: int, ch: str) -> int:
        seq = self._node_seq(node)
        return self._lookup(seq[1:] + ch.encode())

    def has_multiple_outgoing(self, node: int) -> bool:
        return len(self.call_outgoing_kmers(node)) > 1

    def has_single_incoming(self, node: int) -> bool:
        return len(self.call_incoming_kmers(node)) == 1


class RCDBG:
    """Reverse-complement view: traversal proceeds backwards with
    complemented characters (ref rc_dbg.hpp:18); node ids are shared with
    the base graph."""

    def __init__(self, graph):
        self.graph = graph
        self.k = graph.k
        self.mode = graph.mode
        self.alphabet = graph.alphabet
        self.extractor = graph.extractor

    def num_nodes(self):
        return self.graph.num_nodes()

    def max_index(self):
        return self.graph.max_index()

    def map_to_nodes_sequentially(self, sequence) -> np.ndarray:
        if isinstance(sequence, str):
            sequence = sequence.encode()
        return self.graph.map_to_nodes_sequentially(revcomp(sequence))[::-1]

    map_to_nodes = map_to_nodes_sequentially

    def get_node_sequence(self, node: int) -> bytes:
        return revcomp(self.graph.get_node_sequence(node))

    def call_outgoing_kmers(self, node: int):
        return [(n, chr(ord(revcomp(c.encode()))))
                for n, c in self.graph.call_incoming_kmers(node)]

    def call_incoming_kmers(self, node: int):
        return [(n, chr(ord(revcomp(c.encode()))))
                for n, c in self.graph.call_outgoing_kmers(node)]

    def has_multiple_outgoing(self, node: int) -> bool:
        return len(self.call_outgoing_kmers(node)) > 1

    def has_single_incoming(self, node: int) -> bool:
        return len(self.call_incoming_kmers(node)) == 1
