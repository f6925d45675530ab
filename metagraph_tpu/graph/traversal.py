"""BOSS path/contig/unitig extraction (ref boss.cpp:2044-3100 call_paths /
call_sequences / call_unitigs).

Emission semantics mirror the reference traversal exactly:

  phase 1 — start from the source-dummy edges (node $^k), last to first
  phase 2 — start from every unvisited out-edge of multi-out forks
            (forks ascending by node; each fork's out-edges in the
            descending-index order the reference's LIFO stack pops them)
  phase 3 — remaining cycles, each started at its minimum edge

Contig mode extends through forks (picking the first unvisited out-edge in
descending-index order, queueing the rest LIFO); unitig mode stops at forks
and multi-in nodes.  kmers_in_single_form marks the reverse complement of
every emitted k-mer as visited and cuts paths where the pair was already
emitted (primary contigs).

Unlike the reference's per-edge multithreaded walk
(boss.cpp:2126-2167, atomic visited bitmaps), the hot loop here is
*chain-compressed*: a vectorized precompute decomposes the graph into
unitig-grain chains (maximal runs where the continuation is deterministic:
unique outgoing edge at the target and single incoming occurrence), and the
walk consumes a whole chain slice per Python step — visited marking, path and
sequence extension are bulk numpy ops.  Only chain boundaries (forks,
multi-in nodes, sentinel edges) run the scalar reference logic, so the
Python-interpreted step count drops from O(edges) to O(branch points) while
every emitted path stays byte-identical to the sequential reference order.
"""

from __future__ import annotations

from collections import deque
from typing import List, Tuple

import numpy as np

from ..succinct.boss import BOSS


def _is_single_incoming(boss: BOSS, i: int, w: int) -> bool:
    """ref boss.cpp:802-815: edge i has W==w (non-minus); single incoming iff
    no (w+alph) edge before the next w edge.  Scalar helper for the
    per-node graph API (DBGSuccinct.has_single_incoming)."""
    if w > boss.alph_size:
        return False
    i += 1
    if i >= len(boss.W):
        return True
    n1 = boss._next_W(i, w)
    n2 = boss._next_W(i, w + boss.alph_size)
    return not (n2 and (not n1 or n2 < n1))


class _TravIndex:
    """Vectorized per-edge navigation tables + chain decomposition.

    All arrays are indexed by edge (0..M-1, edge 0 is the sentinel row):

      succ_last[e]   last edge of e's node
      block_begin[e] first edge of e's node
      fwd[e]         target node's last edge (ref boss.cpp:640-672)
      grp_cnt[e]     #masked edges in e's incoming group (the W==d edge plus
                     its W==d+alph run; ref masked_pick_single_incoming,
                     boss.cpp:1893-1935) — computed per symbol with merged
                     position scans instead of per-edge succ_W loops
      grp_first[e]   first masked edge of that group (0 if none)
      out_cnt_t[e]   #masked out-edges of e's target node
      unique_out[e]  the single masked out-edge when out_cnt_t == 1
      chain_*        unitig-grain chain decomposition via pointer doubling
    """

    def __init__(self, boss: BOSS, mask):
        M = len(boss.W)
        alph = boss.alph_size
        Wraw = boss.W
        self.Wmod = (Wraw % alph).astype(np.uint8)
        self.M = M

        ends = np.flatnonzero(boss.last).astype(np.int64)
        eidx = np.searchsorted(ends, np.arange(M), side="left")
        self.node_ends = ends
        self.succ_last = ends[np.minimum(eidx, len(ends) - 1)]
        prev_end = np.where(eidx > 0, ends[np.maximum(eidx - 1, 0)], 0)
        self.block_begin = prev_end + 1

        mask01 = (np.ones(M, np.uint8) if mask is None
                  else np.asarray(mask, dtype=bool).astype(np.uint8).copy())
        mask01[0] = 0
        self.mask01 = mask01
        cm = np.zeros(M + 1, np.int64)
        np.cumsum(mask01, out=cm[1:])
        self.cmask = cm
        self.masked_pos = np.flatnonzero(mask01).astype(np.int64)

        # batched fwd for every edge (one native rank/select pass)
        fwd = np.zeros(M, np.int64)
        if M > 1:
            fwd[1:] = boss.fwd(np.arange(1, M, dtype=np.int64))
        self.fwd = fwd

        # masked out-degree + unique out-edge at each edge's target
        tb = self.block_begin[fwd]
        out_cnt = np.where(fwd > 0, cm[fwd + 1] - cm[np.maximum(tb, 0)], 0)
        self.out_cnt_t = out_cnt
        uo = np.zeros(M, np.int64)
        one = out_cnt == 1
        if one.any():
            uo[one] = self.masked_pos[cm[fwd[one] + 1] - 1]
        self.unique_out = uo

        # incoming groups, per symbol (vectorized masked_pick_single_incoming)
        grp_cnt = np.zeros(M, np.int64)
        grp_first = np.zeros(M, np.int64)
        for d in range(alph):
            pd = np.flatnonzero(Wraw == d).astype(np.int64)
            if d == 0:
                pd = pd[pd > 0]
            if not len(pd):
                continue
            pm = (np.flatnonzero(Wraw == d + alph).astype(np.int64)
                  if d + alph < 256 else np.zeros(0, np.int64))
            nxt_d = np.concatenate([pd[1:], [M]])
            lo = np.searchsorted(pm, pd, side="right")
            hi = np.searchsorted(pm, nxt_d, side="left")
            cmm = np.zeros(len(pm) + 1, np.int64)
            if len(pm):
                np.cumsum(mask01[pm], out=cmm[1:])
            cnt = mask01[pd].astype(np.int64) + cmm[hi] - cmm[lo]
            mpos = pm[mask01[pm] > 0] if len(pm) else pm
            fm = np.zeros(len(pd), np.int64)
            hm = cmm[hi] > cmm[lo]
            if hm.any():
                fm[hm] = mpos[cmm[lo[hm]]]
            fm = np.where(mask01[pd] > 0, pd, fm)
            grp_cnt[pd] = cnt
            grp_first[pd] = fm
            if len(pm):
                gi = np.searchsorted(pd, pm, side="left") - 1
                ok = gi >= 0
                grp_cnt[pm[ok]] = cnt[gi[ok]]
                grp_first[pm[ok]] = fm[gi[ok]]
        self.grp_cnt = grp_cnt
        self.grp_first = grp_first

        # ---- chain decomposition: ch[e] = deterministic continuation ----
        # continuation exists iff the edge is non-sentinel, its target has
        # exactly one masked out-edge, AND the edge's incoming occurrence is
        # single (so chains have in-degree <= 1 and never merge)
        ch = np.where((self.Wmod != 0) & one & (grp_cnt == 1), uo, 0)
        ch[0] = 0
        idx = np.arange(M, dtype=np.int64)
        for _ in range(2):                      # second pass after cycle break
            pred = np.zeros(M, np.int64)
            has = ch > 0
            pred[ch[has]] = idx[has]
            heads = pred == 0
            pred[heads] = idx[heads]
            anc = pred.copy()
            dep = (anc != idx).astype(np.int64)
            steps = max(1, int(np.ceil(np.log2(max(M, 2)))) + 1)
            for _ in range(steps):
                dep = dep + dep[anc]
                anc = anc[anc]
            cyc = pred[anc] != anc
            if not cyc.any():
                break
            # break each ch-cycle right before its minimum edge so the chain
            # starts there (phase 3 emits cycles from their min edge)
            mnv = idx.copy()
            nx = np.where(ch > 0, ch, idx)
            for _ in range(steps):
                mnv = np.minimum(mnv, mnv[nx])
                nx = nx[nx]
            ch[cyc & (ch == mnv)] = 0
        self.head = anc
        order = np.lexsort((dep, anc))
        self.chain_arr = order.astype(np.int64)
        cp = np.empty(M, np.int64)
        cp[order] = np.arange(M)
        self.chain_pos = cp
        heads_in_order = anc[order]
        change = np.flatnonzero(np.diff(heads_in_order)) + 1
        starts = np.concatenate([[0], change])
        ends_ = np.concatenate([change, [M]])
        re_pos = np.repeat(ends_, ends_ - starts)
        self.run_end = re_pos[cp]

    # scalar helpers (chain-boundary only) --------------------------------
    def outgoing(self, t: int) -> List[int]:
        """Masked out-edges of the node whose last edge is t, descending
        (ref call_outgoing boss.hpp:779-784 + masked variant)."""
        b = int(self.block_begin[t])
        m = self.mask01
        return [x for x in range(t, b - 1, -1) if m[x]]

    def pick_single_outgoing(self, t: int) -> Tuple[int, bool]:
        """(edge, single) for the node whose last edge is t
        (ref masked_pick_single_outgoing)."""
        cnt = self.cmask[t + 1] - self.cmask[max(int(self.block_begin[t]), 0)]
        if cnt == 0:
            return 0, False
        if cnt == 1:
            return int(self.masked_pos[self.cmask[t + 1] - 1]), True
        return t, False

    def pick_single_incoming(self, j: int) -> Tuple[int, bool]:
        """(edge, single) for the incoming group whose member is edge j
        (ref masked_pick_single_incoming boss.cpp:1893-1935)."""
        cnt = int(self.grp_cnt[j])
        if cnt == 0:
            return 0, False
        if cnt == 1:
            return int(self.grp_first[j]), True
        return j, False


class _Traversal:
    def __init__(self, boss: BOSS, split_to_unitigs: bool,
                 kmers_in_single_form: bool, trim_sentinels: bool, mask):
        self.boss = boss
        self.split = split_to_unitigs
        self.single_form = kmers_in_single_form
        self.trim = trim_sentinels
        self.mask = mask
        self.ix = _TravIndex(boss, mask)
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
        ix = self.ix
        M = len(boss.W)
        if self.mask is None:
            # phase 1: source dummy edges, last to first
            start = int(boss.succ_last(np.array([1]))[0])
            for i in range(start, 0, -1):
                if not self.visited[i]:
                    self.walk(deque([(i, None)]))
        else:
            # nodes with no incoming edges in the subgraph (batched check)
            node_ends = np.unique(ix.succ_last[ix.masked_pos])
            if len(node_ends):
                j = boss.bwd(node_ends)
                no_in = ix.grp_cnt[j] == 0
                for last_e in node_ends[no_in]:
                    for e in ix.outgoing(int(last_e)):
                        if not self.single_form or not self.visited[e]:
                            self.walk(deque([(e, None)]))

        # phase 2: forks, ascending by node; out-edges descending
        ne = ix.node_ends
        out_cnt_node = ix.cmask[ne + 1] - ix.cmask[ix.block_begin[ne]]
        for last_i in ne[out_cnt_node >= 2]:
            block = ix.outgoing(int(last_i))
            for e in block:
                if not self.visited[e]:
                    self.walk(deque([(e, None)]))

        # phase 3: cycles
        for i in np.flatnonzero(~self.visited):
            if not self.visited[i]:
                self.process_cycle(int(i))

    def process_cycle(self, start: int):
        """Walk the remaining cycle through `start` chain-by-chain to find
        its minimum edge, then emit from there (ref boss.cpp:2243-2265)."""
        ix = self.ix
        mn = start
        e = start
        guard = 0
        while True:
            i0 = int(ix.chain_pos[e])
            i1 = int(ix.run_end[e])
            if (e != start and ix.head[e] == ix.head[start]
                    and i0 < ix.chain_pos[start] < i1):
                seg = ix.chain_arr[i0:int(ix.chain_pos[start])]
                if len(seg):
                    mn = min(mn, int(seg.min()))
                break
            seg = ix.chain_arr[i0:i1]
            mn = min(mn, int(seg.min()))
            tail = int(seg[-1])
            cnt = int(ix.out_cnt_t[tail])
            if cnt == 1:
                e = int(ix.unique_out[tail])
            elif cnt >= 2:
                e = int(ix.fwd[tail])          # ref pick returns node's last
            else:
                raise AssertionError("cycle walk lost its continuation")
            if e == start:
                break
            guard += len(seg) + 1
            if guard > ix.M + 1:
                raise AssertionError("cycle walk did not terminate")
        if not self.visited[mn]:
            self.walk(deque([(mn, None)]))

    def walk(self, queue: deque):
        boss = self.boss
        ix = self.ix
        alph = boss.alph_size
        Wraw = boss.W
        visited = self.visited
        chain_arr = ix.chain_arr
        chain_pos = ix.chain_pos
        run_end = ix.run_end
        Wmod = ix.Wmod
        while queue:
            edge, kmer = queue.pop()
            if visited[edge]:
                continue
            if kmer is not None:
                sequence = list(kmer)
            else:
                sequence = list(boss.get_node_seq(np.array([edge]))[0])
            path = []

            while not visited[edge]:
                # ---- fast path: consume the rest of the edge's chain ----
                i0 = int(chain_pos[edge])
                i1 = int(run_end[edge])
                if i1 - i0 > 1:
                    seg = chain_arr[i0:i1]
                    vis = visited[seg]
                    j = int(np.argmax(vis)) if vis.any() else len(seg)
                    if j > 1:
                        if j < len(seg):
                            consume = seg[:j]
                            nxt_edge = int(seg[j])     # visited -> loop exits
                        else:
                            consume = seg[:-1]
                            nxt_edge = int(seg[-1])    # tail: scalar step
                        visited[consume] = True
                        path.extend(consume.tolist())
                        sequence.extend(Wmod[consume].tolist())
                        edge = nxt_edge
                        continue

                # ---- scalar step (chain boundary; ref boss.cpp:2280-2350)
                visited[edge] = True
                w = int(Wraw[edge])
                d = w % alph
                sequence.append(d)
                path.append(edge)
                if not d:
                    break

                stop_even_if_single_outgoing = (
                    self.split and ix.grp_cnt[edge] != 1)

                t = int(ix.fwd[edge])
                out_edges = ix.outgoing(t)
                if not out_edges:
                    break
                edge = out_edges[0]
                if len(out_edges) == 1 and not stop_even_if_single_outgoing:
                    continue

                next_edge = 0
                for e in out_edges:
                    if not visited[e]:
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
        ix = self.ix
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
                    nxt, single = ix.pick_single_outgoing(int(ix.fwd[e]))
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
               trim_sentinels=False, subgraph_mask=None, return_index=False):
    t = _Traversal(boss, split_to_unitigs, kmers_in_single_form,
                   trim_sentinels, subgraph_mask)
    t.run()
    if return_index:
        return t.results, t.ix
    return t.results


def call_sequences(boss: BOSS, unitigs=False, kmers_in_single_form=False,
                   min_tip_size=1, subgraph_mask=None):
    """Contigs (or unitigs) as code arrays (ref call_sequences/call_unitigs)."""
    t = _Traversal(boss, unitigs, kmers_in_single_form, True, subgraph_mask)
    t.run()
    if not unitigs:
        return [np.array(seq, dtype=np.uint8) for _, seq in t.results]
    out = []
    for path, seq in t.results:
        if _keep_unitig(boss, t.ix, path, seq, min_tip_size):
            out.append(np.array(seq, dtype=np.uint8))
    return out


def _keep_unitig(boss: BOSS, ix: _TravIndex, path, seq, min_tip_size) -> bool:
    """Tip filtering (ref call_unitigs boss.cpp:3003-3098)."""
    if len(seq) >= boss.k + min_tip_size:
        return True
    first_edge, last_edge = path[0], path[-1]

    last_fwd = 0
    if seq[-1] != 0:
        last_fwd, single = ix.pick_single_outgoing(int(ix.fwd[last_edge]))
        if not single and last_fwd:
            return True

    first_bwd = 0
    if seq[0] != 0:
        first_bwd, single = ix.pick_single_incoming(boss.bwd_scalar(first_edge))
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
