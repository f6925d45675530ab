"""Batch query graph with hull expansion for `query --align --batch-align`
(ref src/cli/query.cpp:874-1110 construct_query_graph, :494-606
call_hull_sequences, :718-806 add_hull_contigs).

The reference accelerates batch alignment by aligning reads against a small
per-batch graph instead of the full index: the distinct query k-mers found in
the full graph, augmented with a "hull" — full-graph contigs reachable from
the batch graph's unmatched positions and sinks within bounded depth/forks.

TPU-native differences from the reference (behavior-preserving where it
matters):
  * no intermediate contig extraction/rebalancing — the distinct-k-mer map is
    ONE vectorized lookup (engine.map_batch), which is inherently
    load-balanced (the reference splits contigs into 640-k-mer segments only
    to balance its per-thread mapping loops,
    ref query.cpp:986-989 split_contigs_for_rebalancing);
  * the small graph is a DBGSuccinct built from the matched segments + hull
    contigs (the reference uses DBGHashOrdered, or a BOSS when sub-k suffix
    seeding is requested, query.cpp:1051-1063) — so the whole aligner stack,
    including sub-k suffix seeding, works against it unchanged;
  * every k-mer in the small graph is by construction present in the full
    graph, so an alignment's graph spelling can be re-queried against the
    full index directly (the reference instead slices the annotation onto
    the small graph's rows).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..kmer import packing


@dataclass
class BatchGraphStats:
    num_query_kmers: int = 0
    num_matched_kmers: int = 0
    num_hull_contigs: int = 0
    num_hull_chars: int = 0


def _valid_windows(codes: np.ndarray, k: int, sigma: int):
    """(n-k+1, k) windows of a code array + validity mask (no invalid code)."""
    if len(codes) < k:
        return (np.zeros((0, k), np.uint8), np.zeros(0, bool))
    wins = np.lib.stride_tricks.sliding_window_view(codes, k)
    bad = np.concatenate([[0], np.cumsum(codes >= sigma)])
    return wins, (bad[k:] - bad[:-k]) == 0


def hull_contigs(full_graph, starts, kmer_set, max_forks: int,
                 max_depth: int) -> List[np.ndarray]:
    """DFS hull traversal of the full graph (ref query.cpp:494-606).

    starts: list of (kmer_codes (k,) uint8, full_node) to expand from.
    kmer_set: set of batch k-mers as code bytes — traversal is cut when it
    re-enters the batch graph.  Returns contig code arrays; every k-mer of
    every contig is a full-graph k-mer.
    """
    enc = full_graph.extractor.alphabet.encode_table
    visited: dict = {}   # node -> min depth seen (ref distance_traversed map)
    out: List[np.ndarray] = []

    def cont(kmer_bytes: bytes, node: int, depth: int, forks: int) -> bool:
        if forks > max_forks or depth >= max_depth:
            return False
        if kmer_bytes in kmer_set:
            return False
        prev = visited.get(node)
        if prev is None or depth < prev:
            visited[node] = depth
            return True
        return False

    for kmer, node in starts:
        if not node:
            continue
        base = list(kmer[1:])
        stack = []
        for nnode, c in full_graph.call_outgoing_kmers(node):
            if c == "$":
                continue
            k2 = base + [enc[ord(c)]]
            k2b = bytes(k2)
            if cont(k2b, nnode, 1, 0):
                stack.append((k2, nnode, 1, 0))
            else:
                out.append(np.array(k2, dtype=np.uint8))
        while stack:
            seq, node2, depth, forks = stack.pop()
            extend = True
            while extend:
                outs = [(n, c) for n, c in full_graph.call_outgoing_kmers(
                    node2) if c != "$"]
                if len(outs) != 1:
                    break
                nnode, c = outs[0]
                seq.append(enc[ord(c)])
                node2 = nnode
                depth += 1
                extend = cont(bytes(seq[-len(kmer):]), node2, depth, forks)
            out.append(np.array(seq, dtype=np.uint8))
            if not extend:
                continue
            # a fork (or sink) before max depth: schedule further traversals
            last = seq[-len(kmer) + 1:]
            for nnode, c in full_graph.call_outgoing_kmers(node2):
                if c == "$":
                    continue
                k2 = last + [enc[ord(c)]]
                k2b = bytes(k2)
                if cont(k2b, nnode, depth + 1, forks + 1):
                    stack.append((k2, nnode, depth + 1, forks + 1))
                else:
                    out.append(np.array(k2, dtype=np.uint8))
    return out


def construct_batch_graph(engine, seqs: List[bytes],
                          max_hull_forks: int = 4,
                          max_hull_depth: Optional[int] = None,
                          max_nodes_per_seq_char: float = 5.0):
    """Build the per-batch alignment graph (ref construct_query_graph).

    Returns (small_graph, stats) — a DBGSuccinct over the batch's matched
    segments plus the hull, in the full graph's mode.  None when the full
    graph's mode isn't supported (primary wrappers align against the full
    graph instead).
    """
    from ..graph.dbg_succinct import DBGSuccinct
    full = engine.graph
    mode = getattr(full, "mode", "basic")
    if mode not in ("basic", "canonical"):
        return None, None
    k = full.k
    ex = full.extractor
    sigma = ex.alphabet.sigma
    stats = BatchGraphStats()

    if max_hull_depth is None:
        max_hull_depth = 1 << 62
    maxlen = max((len(s) for s in seqs), default=0)
    max_hull_depth = min(max_hull_depth,
                         int(max_nodes_per_seq_char * maxlen))

    # 1. matched segments: map every query window against the full graph in
    #    one vectorized batch (the reference's contig-map step, vectorized)
    nodes_list = engine.map_batch(seqs)
    segments: List[bytes] = []
    all_wins = []
    for s, nodes in zip(seqs, nodes_list):
        codes = ex.encode(s)
        wins, valid = _valid_windows(codes, k, sigma)
        if valid.any():
            all_wins.append(wins[valid])
        hit = nodes > 0
        if hit.any():
            # runs of consecutive matched windows -> substring segments
            # (ref add_to_graph splits contigs at npos, query.cpp:806-824)
            d = np.diff(np.concatenate([[0], hit.view(np.int8), [0]]))
            for a, b in zip(np.flatnonzero(d == 1), np.flatnonzero(d == -1)):
                segments.append(bytes(s[a: b + k - 1]).upper())

    if not all_wins:
        return None, None

    # 2. distinct batch k-mers, their full-graph nodes, and the batch
    #    adjacency needed for hull start detection
    wins_cat = np.concatenate(all_wins)
    if mode == "canonical":
        comp = ex.extended_complement_table()
        wins_cat = np.concatenate([wins_cat, comp[wins_cat][:, ::-1]])
    bits = packing.bits_for_alphabet(ex.alphabet.sigma)
    keys = packing.pack_codes(wins_cat, bits=bits)
    order = packing.lexsort_rows(keys)
    skeys = keys[order]
    new = np.empty(len(skeys), dtype=bool)
    new[0] = True
    np.any(skeys[1:] != skeys[:-1], axis=1, out=new[1:])
    keys_u = skeys[new]
    wins_u = wins_cat[order[new]]
    U = len(wins_u)
    stats.num_query_kmers = U

    dec = ex.alphabet.decode_table
    kmer_bytes_list = [dec[wins_u[i]].tobytes() for i in range(U)]
    nodes_u = np.array(
        [int(a[0]) if len(a) else 0
         for a in engine.map_batch(kmer_bytes_list)], dtype=np.int64)
    stats.num_matched_kmers = int((nodes_u > 0).sum())

    # batch out-degrees: which successors of each k-mer are batch k-mers
    # (ref batch_graph.outdegree for the sink test, query.cpp:805).
    # Sequence codes are 1..sigma-1 (code 0 is the $ sentinel).
    bases = np.arange(1, sigma, dtype=np.uint8)
    nb = len(bases)
    succ = np.repeat(wins_u[:, 1:], nb, axis=0)
    succ = np.concatenate(
        [succ, np.tile(bases, U)[:, None]], axis=1)
    succ_in = packing.rows_in(keys_u, packing.pack_codes(succ, bits=bits))
    outdeg = succ_in.reshape(U, nb).sum(axis=1)

    starts = []
    # sinks of the batch graph that exist in the full graph
    for i in np.flatnonzero((outdeg == 0) & (nodes_u > 0)):
        starts.append((wins_u[i], int(nodes_u[i])))
    # unmatched k-mers: expand forward from their batch predecessors
    # (ref query.cpp:780-795 adjacent_incoming_nodes on unmatched positions)
    unmatched = np.flatnonzero(nodes_u == 0)
    if len(unmatched):
        pred = np.repeat(wins_u[unmatched][:, :-1], nb, axis=0)
        pred = np.concatenate(
            [np.tile(bases, len(unmatched))[:, None], pred], axis=1)
        pkeys = packing.pack_codes(pred, bits=bits)
        ppos = packing.searchsorted_rows(keys_u, pkeys)
        ppos_c = np.minimum(ppos, U - 1)
        pin = (ppos < U) & np.all(keys_u[ppos_c] == pkeys, axis=1)
        for j in np.unique(ppos_c[pin]):
            if nodes_u[j] > 0:
                starts.append((wins_u[j], int(nodes_u[j])))

    hull = []
    if max_hull_forks and starts:
        kmer_set = {wins_u[i].tobytes() for i in range(U)}
        hull = hull_contigs(full, starts, kmer_set, max_hull_forks,
                            max_hull_depth)
        stats.num_hull_contigs = len(hull)
        stats.num_hull_chars = int(sum(len(h) for h in hull))

    hull_seqs = [dec[h].tobytes() for h in hull]
    build_seqs = segments + hull_seqs
    if not build_seqs:
        return None, None
    small = DBGSuccinct.build(build_seqs, k, mode=mode,
                              alphabet=ex.alphabet)
    return small, stats
