"""BOSS table construction from a sorted set of k-mers — fully vectorized.

The reference builds the table with streaming iterators over sorted k-mer
streams (ref boss_chunk_construct.cpp:57-171 dummy generation,
boss_chunk.cpp:33-133 row emission).  Here every step is dense set algebra on
(N, K) code matrices / packed keys, so the same pipeline runs on numpy today
and maps 1:1 onto device sorts + scans:

  real k-mers (sorted, unique)
    -> dummy sink edges     = {target_node + '$' : target node has no out-edge}
    -> dummy source chains  = {'$'*c + prefix : source node has no in-edge}, c=1..k
    -> merge-sort all + the all-$ edge
    -> one vectorized scan emits W (with minus flags), last, F

Terminology follows the reference: the *edge string* has K = k+1 characters
(k = BOSS node length = dbg_k - 1); s[0..K-2] is the source node, s[K-1] the
edge label.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..kmer import packing


@dataclass
class BossArrays:
    """The raw BOSS table: result of construction, input to the BOSS class.

    Row 0 is the sentinel zero row (ref boss_chunk.cpp:60-62).
    """

    k: int                      # BOSS node length (dbg k - 1)
    alph_size: int              # sentinel-included alphabet size (5 for DNA)
    W: np.ndarray               # (M,) uint8, values in [0, 2*alph_size)
    last: np.ndarray            # (M,) uint8 in {0,1}
    F: np.ndarray               # (alph_size,) int64
    valid: np.ndarray           # (M,) uint8: 1 iff row is a real (non-dummy) edge
    weights: np.ndarray | None = None   # (M,) uint64 or None

    @property
    def num_edges(self) -> int:
        return len(self.W) - 1


def _node_key(chars: np.ndarray, bits: int = 4) -> np.ndarray:
    """Packed co-lex key of the source node s[0..K-2] of each edge string."""
    K = chars.shape[1]
    return packing.pack_codes(chars[:, : K - 1],
                              packing.colex_priority_order(K - 1), bits=bits)


def _target_key(chars: np.ndarray, bits: int = 4) -> np.ndarray:
    """Packed co-lex key of the target node s[1..K-1]."""
    K = chars.shape[1]
    return packing.pack_codes(chars[:, 1:],
                              packing.colex_priority_order(K - 1), bits=bits)


def generate_dummy_kmers(kmers: np.ndarray, bits: int = 4) -> np.ndarray:
    """All dummy edges needed for the BOSS table of the given real edges.

    ``kmers``: (N, K) unique real edge strings (codes 1..alph-1) sorted in
    BOSS PRIORITY ORDER (one-swapped co-lex, packing.boss_priority_order) —
    the adjacent-dedupe/binary-search steps below rely on the packed source
    keys arriving sorted, which plain row-lex order does NOT guarantee.
    Returns (D, K) dummy edge strings (unsorted), NOT including the all-$ edge.

    Semantics (ref boss_chunk_construct.cpp:42-171):
      * dummy sink  v->$    for every target node v with no outgoing real edge
      * dummy-1 source $p->c for every source node n=p+c with no incoming real edge
      * higher-level sources: prepend '$' to the node of each previous-level
        dummy, deduped by node, for levels 2..k.
    """
    N, K = kmers.shape
    k = K - 1

    source_nodes = kmers[:, : K - 1]
    target_nodes = kmers[:, 1:]
    order_k = packing.colex_priority_order(k)

    # BOSS edge order is (source-node co-lex, label): the packed source keys
    # arrive ALREADY SORTED, so unique sources are an adjacent-dedupe — only
    # the target keys need a sort (1 sort instead of 4 void-dtype uniques)
    src_keys = packing.pack_codes(source_nodes, order_k, bits=bits)
    s_new = np.ones(N, dtype=bool)
    if N > 1:
        np.any(src_keys[1:] != src_keys[:-1], axis=1, out=s_new[1:])
    src_first = np.flatnonzero(s_new)
    src_keys_u = src_keys[src_first]

    tgt_key_all = packing.pack_codes(target_nodes, order_k, bits=bits)
    t_idx = packing.lexsort_rows(tgt_key_all)
    ts = tgt_key_all[t_idx]
    t_new = np.ones(N, dtype=bool)
    if N > 1:
        np.any(ts[1:] != ts[:-1], axis=1, out=t_new[1:])
    tgt_first = t_idx[t_new]
    tgt_keys_u = ts[t_new]

    # --- dummy sinks: unique targets not among sources -----------------------
    sink_mask = ~packing.rows_in(src_keys_u, tgt_keys_u)
    sink_nodes = target_nodes[tgt_first[sink_mask]]
    dummy_sinks = np.concatenate(
        [sink_nodes, np.zeros((sink_nodes.shape[0], 1), dtype=np.uint8)], axis=1)

    # --- dummy-1 sources: unique sources not among targets -------------------
    src1_mask = ~packing.rows_in(tgt_keys_u, src_keys_u)
    src1_nodes = source_nodes[src_first[src1_mask]]
    # edge string = '$' + node  (node $n[0..k-2], label n[k-1];
    # ref boss_chunk_construct.cpp:151-169: to_prev(k+1, 0))
    level = np.concatenate(
        [np.zeros((src1_nodes.shape[0], 1), dtype=np.uint8), src1_nodes], axis=1)

    dummies = [dummy_sinks, level]

    # --- higher-level sources (ref boss_chunk_construct.cpp:380-397) ---------
    for _ in range(2, k + 1):
        nodes = level[:, : K - 1]
        keys = packing.pack_codes(nodes, packing.colex_priority_order(k),
                                  bits=bits)
        _, first = np.unique(packing._void_view(keys), return_index=True)
        uniq_nodes = nodes[np.sort(first)]
        level = np.concatenate(
            [np.zeros((uniq_nodes.shape[0], 1), dtype=np.uint8), uniq_nodes], axis=1)
        dummies.append(level)

    return np.concatenate(dummies, axis=0)


def emit_boss(stream: np.ndarray, alph_size: int,
              counts: np.ndarray | None = None,
              bits_per_count: int = 8) -> BossArrays:
    """Vectorized equivalent of the reference's row emission
    (ref boss_chunk.cpp:33-133, verified semantics in SURVEY.md A.1).

    ``stream``: (M, K) edge strings sorted in BOSS order, beginning with the
    all-$ row; ``counts`` aligned per-row multiplicities (0 for dummies).
    """
    M, K = stream.shape
    k = K - 1

    labels = stream[:, K - 1].astype(np.int64)          # curW
    node_last = stream[:, K - 2].astype(np.int64)       # curF
    first_char = stream[:, 0].astype(np.int64)          # kmer[1] in ref indexing

    bits = packing.bits_for_alphabet(alph_size)
    node_keys = _node_key(stream, bits)
    same_node_next = packing.rows_equal_adjacent(node_keys)

    # redundant dummy sink rows: label $, non-$ node ending, next row same node
    drop = same_node_next & (labels == 0) & (node_last > 0)
    keep = ~drop

    last_bits = (~same_node_next).astype(np.uint8)

    # minus flags: within each label c>0, a row whose target node equals the
    # previous label-c row's target node is a non-first incoming edge
    tkeys = _target_key(stream, bits)
    minus = np.zeros(M, dtype=bool)
    for c in range(1, alph_size):
        idx = np.flatnonzero(keep & (labels == c))
        if idx.size > 1:
            same = np.all(tkeys[idx[1:]] == tkeys[idx[:-1]], axis=1)
            minus[idx[1:]] = same

    W_full = (labels + np.where(minus, alph_size, 0)).astype(np.uint8)

    kept = np.flatnonzero(keep)
    W = np.concatenate([[0], W_full[kept]]).astype(np.uint8)
    last = np.concatenate([[0], last_bits[kept]]).astype(np.uint8)

    # F[c] = index of the last row whose node-last-char < c (sentinel row at 0)
    nlc = node_last[kept]
    F = np.zeros(alph_size, dtype=np.int64)
    for c in range(1, alph_size):
        F[c] = np.searchsorted(nlc, c, side="left")

    # valid (non-dummy) rows: label != $ and first node char != $
    valid = np.concatenate(
        [[0], ((labels[kept] > 0) & (first_char[kept] > 0)).astype(np.uint8)]
    ).astype(np.uint8)

    weights = None
    if counts is not None:
        cap = (1 << bits_per_count) - 1
        w = np.minimum(counts[kept], cap)
        w[(labels[kept] == 0) | (first_char[kept] == 0)] = 0
        weights = np.concatenate([[0], w]).astype(np.uint64)

    return BossArrays(k=k, alph_size=alph_size, W=W, last=last, F=F,
                      valid=valid, weights=weights)


def merge_sorted_edge_sets(kmer_sets, count_sets=None, bits: int = 4):
    """Linear merge of BOSS-sorted unique edge-string sets (the sorted-table
    merge of ref src/graph/representation/succinct/boss_merge.cpp merge():
    co-iterate the sorted tables, no contig re-extraction or global re-sort).

    Each input is an (N_i, K) code matrix already in BOSS priority order
    (valid edges read off a BOSS table are).  Duplicate edges collapse;
    counts (if given) sum.  Returns (merged (N, K), counts or None).
    Vectorized two-way merges folded left: rank positions come from two
    searchsorted passes, so each fold is O(n+m) row moves."""
    sets = [np.asarray(s) for s in kmer_sets]
    have_counts = count_sets is not None
    counts = [np.asarray(c, dtype=np.uint64) for c in count_sets] \
        if have_counts else [None] * len(sets)
    K = sets[0].shape[1]
    order = packing.boss_priority_order(K)
    acc, acc_keys, acc_c = sets[0], None, counts[0]
    for s, c in zip(sets[1:], counts[1:]):
        assert s.shape[1] == K
        ka = packing.pack_codes(acc, order, bits=bits) \
            if acc_keys is None else acc_keys
        kb = packing.pack_codes(s, order, bits=bits)
        na, nb = len(acc), len(s)
        # final rank of a-rows: own index + #b-rows strictly before (ties ->
        # a first); of b-rows: own index + #a-rows at-or-before
        pos_a = np.arange(na) + packing.searchsorted_rows(kb, ka, "left")
        pos_b = np.arange(nb) + packing.searchsorted_rows(ka, kb, "right")
        merged = np.empty((na + nb, K), dtype=acc.dtype)
        merged[pos_a] = acc
        merged[pos_b] = s
        mkeys = np.empty((na + nb, ka.shape[1]), dtype=ka.dtype)
        mkeys[pos_a] = ka
        mkeys[pos_b] = kb
        if have_counts:
            mc = np.empty(na + nb, dtype=np.uint64)
            mc[pos_a] = acc_c
            mc[pos_b] = c
        dup = packing.rows_equal_adjacent(mkeys)     # row i == row i+1
        if dup.any():
            keep = np.concatenate([[True], ~dup[:-1]])
            if have_counts:
                # duplicates are adjacent pairs (inputs were unique): fold
                # the second copy's count into the first
                mc = mc.copy()
                mc[dup] += mc[np.flatnonzero(dup) + 1]
                acc_c = mc[keep]
            acc, acc_keys = merged[keep], mkeys[keep]
        else:
            acc, acc_keys = merged, mkeys
            if have_counts:
                acc_c = mc
    return acc, (acc_c if have_counts else None)


def build_boss_arrays(kmers: np.ndarray, alph_size: int = 5,
                      counts: np.ndarray | None = None,
                      bits_per_count: int = 8) -> BossArrays:
    """sorted unique real edge k-mers (N, K) -> BOSS arrays.

    Mirrors construct_boss_chunk (ref boss_chunk_construct.cpp:341-462).
    """
    N, K = kmers.shape
    bits = packing.bits_for_alphabet(alph_size)
    dummies = generate_dummy_kmers(kmers, bits=bits)
    all0 = np.zeros((1, K), dtype=np.uint8)
    stream = np.concatenate([all0, kmers, dummies], axis=0)

    order = packing.boss_priority_order(K)
    sort_idx = packing.lexsort_rows(
        packing.pack_codes(stream, order, bits=bits))
    stream = stream[sort_idx]

    stream_counts = None
    if counts is not None:
        stream_counts = np.zeros(stream.shape[0], dtype=np.uint64)
        c = np.concatenate([np.zeros(1, dtype=np.uint64),
                            counts.astype(np.uint64),
                            np.zeros(dummies.shape[0], dtype=np.uint64)])
        stream_counts = c[sort_idx]

    return emit_boss(stream, alph_size, stream_counts, bits_per_count)
