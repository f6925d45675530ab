"""Canonical and reverse-complement graph views
(ref src/graph/representation/canonical_dbg.{hpp,cpp}, rc_dbg.hpp:18).

CanonicalDBG presents a PRIMARY graph as canonical: node ids 1..N are the
base graph's nodes, N+1..2N their reverse complements
(ref canonical_dbg.hpp:22-41; get_base_node arithmetic at :38-41).
"""

from __future__ import annotations

import numpy as np

REVCOMP = bytes.maketrans(b"ACGTacgtUu", b"TGCAtgcaAa")


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
        # traversal caches (the NodeFirstCache analog, ref node_first_cache.hpp)
        self._out_cache: dict = {}
        self._in_cache: dict = {}
        self._seq_cache: dict = {}

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
        hit = self._seq_cache.get(node)
        if hit is not None:
            return hit
        base = self.get_base_node(node)
        s = self.graph.get_node_sequence(base)
        if node > self.offset:
            s = revcomp(s)
        self._seq_cache[node] = s
        return s

    def get_node_sequence(self, node: int) -> bytes:
        return self._node_seq(node)

    def _lookup_batch(self, kmers: list) -> list:
        """Batch canonical lookup: fwd ids, else rc ids + offset."""
        chars = np.stack([self.extractor.encode(km) for km in kmers])
        if hasattr(self.graph, "map_kmers_batch"):
            fwd = self.graph.map_kmers_batch(chars)
            comp = self.alphabet.complement_table
            rc = comp[chars[:, ::-1]]
            bwd = self.graph.map_kmers_batch(rc)
        else:
            fwd = np.array([self.graph.map_to_nodes_sequentially(km)[0]
                            for km in kmers])
            bwd = np.array([self.graph.map_to_nodes_sequentially(revcomp(km))[0]
                            for km in kmers])
        return np.where(fwd > 0, fwd,
                        np.where(bwd > 0, bwd + self.offset, 0)).tolist()

    def _lookup(self, kmer: bytes) -> int:
        return self._lookup_batch([kmer])[0]

    def call_outgoing_kmers(self, node: int):
        hit = self._out_cache.get(node)
        if hit is not None:
            return hit
        seq = self._node_seq(node)
        chars = self.alphabet.letters[1:]     # real chars (DNA5's N included)
        cands = [seq[1:] + ch.encode() for ch in chars]
        ids = self._lookup_batch(cands)
        out = [(nid, ch) for nid, ch in zip(ids, chars) if nid]
        self._out_cache[node] = out
        return out

    def call_incoming_kmers(self, node: int):
        hit = self._in_cache.get(node)
        if hit is not None:
            return hit
        seq = self._node_seq(node)
        chars = self.alphabet.letters[1:]
        cands = [ch.encode() + seq[:-1] for ch in chars]
        ids = self._lookup_batch(cands)
        out = [(nid, ch) for nid, ch in zip(ids, chars) if nid]
        self._in_cache[node] = out
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
