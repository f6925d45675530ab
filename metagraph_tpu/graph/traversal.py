"""BOSS path/contig/unitig extraction (ref boss.cpp:2044-3100 call_paths /
call_sequences / call_unitigs).

A faithful single-threaded mirror of the reference traversal:

  phase 1 — start from the source-dummy edges (node $^k), last to first
  phase 2 — start from every unvisited out-edge of multi-out forks (ascending)
  phase 3 — remaining cycles, each started at its minimum edge

Contig mode extends through forks (picking the first unvisited out-edge in
descending-index order, queueing the rest LIFO); unitig mode stops at forks
and multi-in nodes.  kmers_in_single_form marks the reverse complement of
every emitted k-mer as visited and cuts paths where the pair was already
emitted (primary contigs).
"""

from __future__ import annotations

from collections import deque
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..succinct.boss import BOSS


def _outgoing(boss: BOSS, last_edge: int, mask) -> List[int]:
    """Edges of the node whose last edge is `last_edge`, in descending index
    order (ref call_outgoing boss.hpp:779-784 + masked_call_outgoing)."""
    out = []
    e = last_edge
    while True:
        if mask is None or mask[e]:
            out.append(e)
        e -= 1
        if e <= 0 or boss.last[e]:
            break
    return out


def _is_single_incoming(boss: BOSS, i: int, w: int) -> bool:
    """ref boss.cpp:802-815: edge i has W==w (non-minus); single incoming iff
    no (w+alph) edge before the next w edge."""
    if w > boss.alph_size:
        return False
    i += 1
    M = len(boss.W)
    if i >= M:
        return True
    # find next occurrence of w or w+alph at >= i
    n1 = boss._next_W(i, w)
    n2 = boss._next_W(i, w + boss.alph_size)
    return not (n2 and (not n1 or n2 < n1))


def _pick_single_incoming(boss: BOSS, j: int, d: int, mask) -> Tuple[int, bool]:
    """ref masked_pick_single_incoming (boss.cpp:1893-1935): j = first
    incoming edge (W==d).  Returns (edge or 0, is_single)."""
    if mask is None:
        return j, _is_single_incoming(boss, j, d)
    found = 0
    multiple = False
    e = j
    alph = boss.alph_size
    M = len(boss.W)
    while True:
        if mask[e]:
            if found:
                multiple = True
                break
            found = e
        # advance to next incoming edge of same target: next W == d+alph
        # before the next W == d
        nxt = boss._next_W(e + 1, d + alph) if e + 1 < M else 0
        stop = boss._next_W(e + 1, d) if e + 1 < M else 0
        if not nxt or (stop and stop < nxt):
            break
        e = nxt
    if multiple:
        return j, False
    return found, bool(found)


def _pick_single_outgoing(boss: BOSS, i: int, mask) -> Tuple[int, bool]:
    """ref masked_pick_single_outgoing: i = last edge of node."""
    out = _outgoing(boss, i, mask)
    if not out:
        return 0, False
    if len(out) == 1:
        return out[0], True
    return i, False


class _Traversal:
    def __init__(self, boss: BOSS, split_to_unitigs: bool,
                 kmers_in_single_form: bool, trim_sentinels: bool, mask):
        self.boss = boss
        self.split = split_to_unitigs
        self.single_form = kmers_in_single_form
        self.trim = trim_sentinels
        self.mask = mask
        M = len(boss.W)
        self.visited = np.zeros(M, dtype=bool)
        if mask is not None:
            self.visited[:] = ~np.asarray(mask, dtype=bool)
        self.visited[0] = True
        if trim_sentinels:
            self.visited[boss.W == 0] = True
        self.fetched = set()
        self.results: List[Tuple[List[int], List[int]]] = []

    # ------------------------------------------------------------- helpers
    def emit(self, path, sequence):
        self.results.append((list(path), list(sequence)))

    # ----------------------------------------------------------- traversal
    def run(self):
        boss = self.boss
        M = len(boss.W)
        if self.mask is None:
            # phase 1: source dummy edges, last to first
            start = int(boss.succ_last(np.array([1]))[0])
            for i in range(start, 0, -1):
                if not self.visited[i]:
                    self.walk(deque([(i, None)]))
        else:
            # nodes with no incoming edges in the subgraph
            seen_nodes = set()
            for i in np.flatnonzero(np.asarray(self.mask, dtype=bool)):
                if i == 0:
                    continue
                last_e = boss.succ_last_scalar(i)
                if last_e in seen_nodes:
                    continue
                seen_nodes.add(last_e)
                j = boss.bwd_scalar(last_e)
                j, _ = _pick_single_incoming(
                    boss, j, int(boss.W[j]) % boss.alph_size, self.mask)
                if j:
                    continue
                for e in _outgoing(boss, last_e, self.mask):
                    if not self.single_form or not self.visited[e]:
                        self.walk(deque([(e, None)]))

        # phase 2: forks
        i = 1
        while i < M:
            if self.visited[i]:
                i += 1
                continue
            last_i = boss.succ_last_scalar(i)
            edges = _outgoing(boss, last_i, self.mask)
            if len(edges) >= 2:
                for e in edges:
                    if not self.visited[e]:
                        self.walk(deque([(e, None)]))
            i = last_i + 1

        # phase 3: cycles
        i = 1
        while i < M:
            if self.visited[i]:
                i += 1
                continue
            self.process_cycle(i)
            i += 1

    def process_cycle(self, edge):
        boss = self.boss
        start = edge
        path = []
        while True:
            path.append(edge)
            edge = boss.fwd_scalar(edge)
            edge, _ = _pick_single_outgoing(boss, edge, self.mask)
            assert edge
            if edge == start:
                break
        rep = min(path)
        if not self.visited[rep]:
            self.walk(deque([(rep, None)]))

    def walk(self, queue: deque):
        boss = self.boss
        alph = boss.alph_size
        while queue:
            edge, kmer = queue.pop()
            if self.visited[edge]:
                continue
            if kmer is not None:
                sequence = list(kmer)
            else:
                sequence = list(boss.get_node_seq(np.array([edge]))[0])
            path = []

            while not self.visited[edge]:
                self.visited[edge] = True
                w = int(boss.W[edge])
                d = w % alph
                sequence.append(d)
                path.append(edge)
                if not d:
                    break

                if not self.split:
                    stop_even_if_single_outgoing = False
                elif self.mask is None and w != d:
                    stop_even_if_single_outgoing = True
                else:
                    e2 = edge
                    if w != d:
                        e2 = boss._prev_W(edge, d)
                    _, single = _pick_single_incoming(boss, e2, d, self.mask)
                    stop_even_if_single_outgoing = not single

                edge = boss.fwd_scalar(edge, d)
                out_edges = _outgoing(boss, edge, self.mask)
                if not out_edges:
                    break
                edge = out_edges[0]
                if len(out_edges) == 1 and not stop_even_if_single_outgoing:
                    continue

                next_edge = 0
                for e in out_edges:
                    if not self.visited[e]:
                        if not next_edge and not self.split:
                            next_edge = e
                        else:
                            queue.append((e, list(sequence[-boss.k:])))
                if not next_edge:
                    break
                edge = next_edge

            if path:
                self.call_path(path, sequence, queue)

    # ------------------------------------------------------- path finishing
    def call_path(self, path, sequence, queue):
        boss = self.boss
        if not self.trim and not self.single_form:
            self.emit(path, sequence)
            return

        if sequence[-1] == 0:                       # trailing sentinel
            sequence = sequence[:-1]
            path = path[:-1]
        first_valid = 0
        while first_valid < len(sequence) and sequence[first_valid] == 0:
            first_valid += 1
        if first_valid + boss.k >= len(sequence):
            return
        sequence = sequence[first_valid:]
        path = path[first_valid:]

        if not self.single_form:
            self.emit(path, sequence)
            return

        # --- primary mode: mark dual (rc) path visited, cut emitted pairs ---
        comp = boss_complement(boss)
        rc_seq = [comp[c] for c in reversed(sequence)]
        dual = boss.map_sequence(np.array(rc_seq, dtype=np.uint8))
        dual = list(dual)
        if self.mask is not None:
            dual = [e if (e and self.mask[e]) else 0 for e in dual]

        dual_visited_rev = []
        for i, e in enumerate(dual):
            if not e:
                continue
            if not self.visited[e]:
                self.visited[e] = True
                if i + 1 == len(dual) or not dual[i + 1]:
                    nxt = boss.fwd_scalar(e)
                    nxt, single = _pick_single_outgoing(boss, nxt, self.mask)
                    if single and nxt and not self.visited[nxt]:
                        queue.appendleft((nxt, list(rc_seq[i + 1: i + 1 + boss.k])))
            else:
                dual_visited_rev.append(len(dual) - 1 - i)

        if not dual_visited_rev:
            self.emit(path, sequence)
            return

        dual_aligned = dual[::-1]
        breakpoints = []
        for i in dual_visited_rev:
            if dual_aligned[i] not in self.fetched:
                self.fetched.add(path[i])
            else:
                breakpoints.append(i)
                self.fetched.discard(dual_aligned[i])
        breakpoints.reverse()
        breakpoints.append(len(path))

        begin = 0
        for i in breakpoints:
            if begin < i:
                self.emit(path[begin:i], sequence[begin:i + boss.k])
            begin = i + 1


def boss_complement(boss: BOSS):
    """complement code map for the BOSS alphabet ($ self-complementary)."""
    # DNA: $ACGT -> $TGCA (ref alphabets.hpp kBOSSComplementMapDNA)
    if boss.alph_size == 5:
        return [0, 4, 3, 2, 1]
    raise NotImplementedError("complement only defined for DNA alphabets")


def call_paths(boss: BOSS, split_to_unitigs=False, kmers_in_single_form=False,
               trim_sentinels=False, subgraph_mask=None):
    t = _Traversal(boss, split_to_unitigs, kmers_in_single_form,
                   trim_sentinels, subgraph_mask)
    t.run()
    return t.results


def call_sequences(boss: BOSS, unitigs=False, kmers_in_single_form=False,
                   min_tip_size=1, subgraph_mask=None):
    """Contigs (or unitigs) as code arrays (ref call_sequences/call_unitigs)."""
    if not unitigs:
        return [np.array(seq, dtype=np.uint8)
                for _, seq in call_paths(boss, False, kmers_in_single_form,
                                         True, subgraph_mask)]
    out = []
    for path, seq in call_paths(boss, True, kmers_in_single_form, True,
                                subgraph_mask):
        if _keep_unitig(boss, path, seq, min_tip_size, subgraph_mask):
            out.append(np.array(seq, dtype=np.uint8))
    return out


def _keep_unitig(boss: BOSS, path, seq, min_tip_size, mask) -> bool:
    """Tip filtering (ref call_unitigs boss.cpp:3003-3098)."""
    if len(seq) >= boss.k + min_tip_size:
        return True
    first_edge, last_edge = path[0], path[-1]

    last_fwd = 0
    if seq[-1] != 0:
        last_fwd = boss.fwd_scalar(last_edge, int(seq[-1]))
        last_fwd, single = _pick_single_outgoing(boss, last_fwd, mask)
        if not single and last_fwd:
            return True

    first_bwd = 0
    if seq[0] != 0:
        first_bwd = boss.bwd_scalar(first_edge)
        d = boss.node_last_char_scalar(first_edge)
        first_bwd, single = _pick_single_incoming(boss, first_bwd, d, mask)
        if not single and first_bwd:
            return True

    # sink dead end (tip)
    if seq[-1] == 0 or not last_fwd or not boss.W[last_fwd]:
        return False
    # source dead end (tip)
    if seq[0] == 0 or not first_bwd:
        return False
    # ref get_minus_k_value(first_bwd, k-1).first: apply bwd k-1 times,
    # then read the node-last char
    e = first_bwd
    for _ in range(boss.k - 1):
        e = boss.bwd_scalar(e)
    if not boss.node_last_char_scalar(e):
        return False
    return True
