"""Seed extension: best-first column DP over the graph
(ref src/graph/alignment/aligner_extender_methods.cpp — algorithm re-derived
from the reference; recurrence documented in SURVEY.md A.6).

Each DP-table column aligns a band of the query window against one graph node
(tree of nodes rooted at the seed).  Recurrence per column j (band [begin,end)):

    F[j] = max(S_prev[j] + gap_open, F_prev[j] + gap_extend) + node_score
    M[j] = S_prev[j-1] + profile[j] + node_score
    S[j] = max(M[j], F[j], E[j]),  E[j+1] = max(S[j] + gap_open, E[j] + gap_ext)

with x-drop banding, branch-and-bound via suffix partial sums, and a
per-node convergence filter.  numpy is used for the inner band updates.
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Optional, Tuple

import numpy as np

from .alignment import Alignment
from .cigar import (CLIPPED, DELETION, INSERTION, MATCH, MISMATCH,
                    NODE_INSERTION, Cigar)
from .config import NINF, AlignerConfig

class Column:
    __slots__ = ("S", "E", "F", "node", "parent", "c", "offset", "max_pos",
                 "trim", "score", "labels")

    def __init__(self, size, node, parent, c, offset, max_pos, trim, score):
        self.S = np.full(size, NINF, dtype=np.int64)
        self.E = np.full(size, NINF, dtype=np.int64)
        self.F = np.full(size, NINF, dtype=np.int64)
        self.node = node
        self.parent = parent
        self.c = c          # last char of node kmer (int byte)
        self.offset = offset
        self.max_pos = max_pos
        self.trim = trim
        self.score = score  # per-node added score


class DefaultColumnExtender:
    def __init__(self, graph, config: AlignerConfig, query: bytes):
        self.graph = graph
        self.config = config
        self.query = query
        q = np.frombuffer(query, dtype=np.uint8)
        diag = config.score_matrix[q, q].astype(np.int64)
        # partial_sums_[i] = exact-match score of query[i:]
        ps = np.zeros(len(query) + 1, dtype=np.int64)
        ps[:-1] = diag[::-1].cumsum()[::-1]
        self.partial_sums = ps
        # profile per char: score row indexed by query pos + 1 shift.
        # Chars come from the graph's alphabet (DNA default keeps the fixed
        # 6-row ACGT$N layout for stable device shapes; Protein profiles all
        # 26 letters, 'X' is the catch-all wildcard row)
        alpha = getattr(graph, "alphabet", None)
        if alpha is not None and alpha.name != "DNA":
            # full letter set, case preserved (DNA_CASE keeps lowercase
            # rows); wildcard = the alphabet's catch-all character
            self.profile_chars = alpha.letters.encode()
            self.wildcard = ord("X") if "X" in alpha.letters else ord("N")
        else:
            self.profile_chars = b"ACGT$N"
            self.wildcard = ord("N")
        self.profile: Dict[int, np.ndarray] = {}
        for c in self.profile_chars:
            row = config.score_matrix[c].astype(np.int64)
            prof = np.full(len(query) + 1, NINF, dtype=np.int64)
            prof[1:] = row[q]
            self.profile[c] = prof
        # per-char profile row index for the batched wave kernel (built once;
        # unknown chars take the wildcard row)
        self.char_idx = np.full(
            256, list(self.profile_chars).index(self.wildcard),
            dtype=np.int64)
        for _i, _c in enumerate(self.profile_chars):
            self.char_idx[_c] = _i
        self.conv_checker: Dict[int, Tuple[int, np.ndarray]] = {}
        self.seed: Optional[Alignment] = None
        self._explored_prev = 0

    # ------------------------------------------------------------ filtering
    def num_explored_nodes(self):
        return self._explored_prev + len(self.conv_checker)

    def clear_conv_checker(self):
        self._explored_prev += len(self.conv_checker)
        self.conv_checker.clear()

    def check_seed(self, seed: Alignment) -> bool:
        """ref SeedFilteringExtender::check_seed (:66-88)."""
        if seed.empty():
            return False
        node = seed.nodes[-1] + self._node_shift()
        ent = self.conv_checker.get(node)
        if ent is None:
            return True
        pos = len(seed.query_view()) + seed.get_clipping() - 1
        start, vec = ent
        return (pos < start or pos - start >= len(vec)
                or vec[pos - start] < seed.score)

    def _node_shift(self):
        return 0

    def filter_nodes(self, node: int, query_start: int, query_end: int) -> bool:
        """ref :158-207: mark positions fully explored (with +inf scores)."""
        mscore = -NINF
        size = query_end - query_start
        ent = self.conv_checker.get(node)
        if ent is None:
            self.conv_checker[node] = (query_start,
                                       np.full(size, mscore, dtype=np.int64))
            return True
        start, vec = ent
        new_start = min(start, query_start)
        new_end = max(start + len(vec), query_start + size)
        newvec = np.full(new_end - new_start, NINF, dtype=np.int64)
        newvec[start - new_start: start - new_start + len(vec)] = vec
        seg = slice(query_start - new_start, query_start - new_start + size)
        converged = bool((newvec[seg] >= mscore).all())
        newvec[seg] = np.maximum(newvec[seg], mscore)
        self.conv_checker[node] = (new_start, newvec)
        return not converged

    def update_seed_filter(self, node, query_start, scores: np.ndarray):
        """ref update_seed_filter (:100-156); returns max changed value or NINF."""
        if node == 0:
            return int(scores.max())
        node += self._node_shift()
        ent = self.conv_checker.get(node)
        size = len(scores)
        if ent is None:
            self.conv_checker[node] = (query_start, scores.copy())
            return int(scores.max())
        start, vec = ent
        if query_start + size <= start:
            newvec = np.concatenate(
                [scores, np.full(start - query_start - size, NINF, np.int64),
                 vec])
            self.conv_checker[node] = (query_start, newvec)
            return int(scores.max())
        if query_start >= start + len(vec):
            newvec = np.concatenate(
                [vec, np.full(query_start - start - len(vec), NINF, np.int64),
                 scores])
            self.conv_checker[node] = (start, newvec)
            return int(scores.max())
        new_start = min(start, query_start)
        new_end = max(start + len(vec), query_start + size)
        newvec = np.full(new_end - new_start, NINF, dtype=np.int64)
        newvec[start - new_start: start - new_start + len(vec)] = vec
        off = query_start - new_start
        max_changed = NINF
        seg = newvec[off: off + size]
        improved = scores > seg * self.config.rel_score_cutoff
        if improved.any():
            seg[improved] = np.maximum(seg[improved], scores[improved])
            max_changed = int(seg[improved].max())
        self.conv_checker[node] = (new_start, newvec)
        return max_changed

    # ------------------------------------------------------------- outgoing
    def call_outgoing(self, table_i: int, force_fixed_seed: bool):
        """ref DefaultColumnExtender::call_outgoing (:330-387)."""
        col = self.table[table_i]
        seed = self.seed
        next_offset = col.offset + 1
        seed_pos = next_offset - seed.offset
        in_seed = 0 <= seed_pos < len(seed.sequence)
        k = self.graph.k
        if in_seed and next_offset < k:
            return [(seed.nodes[0], seed.sequence[seed_pos], 0)]
        if in_seed and force_fixed_seed:
            node_i = next_offset - k + 1
            next_node = seed.nodes[node_i]
            next_c = seed.sequence[seed_pos]
            s = 0
            if not next_node:
                s = (self.config.gap_extension_penalty if not col.node
                     else self.config.gap_opening_penalty)
            return [(next_node, next_c, s)]
        out = []
        fold = getattr(getattr(self.graph, "alphabet", None), "name",
                       "DNA") != "DNA_CASE"
        for nxt, ch in self.graph.call_outgoing_kmers(col.node):
            if ch != "$":
                # case carries information only in the case-sensitive
                # alphabet (matches call_outgoing_batch's folding rule)
                out.append((nxt, ord(ch.upper() if fold else ch), 0))
        return out

    # ------------------------------------------------------------ extension
    def get_extensions(self, seed: Alignment, min_path_score: int,
                       force_fixed_seed: bool) -> List[Alignment]:
        if seed.empty():
            return []
        self.seed = seed
        self.clear_conv_checker()
        return self._extend(min_path_score, force_fixed_seed)

    def _extend(self, min_path_score: int, force_fixed_seed: bool
                ) -> List[Alignment]:
        cfg = self.config
        seed = self.seed
        query = self.query
        min_path_score = max(0, min_path_score)

        self.table: List[Column] = []
        self.prev_starts = set()

        xdrop = cfg.xdrop
        xdrop_cutoff = max(-xdrop, NINF + 1)

        start = seed.get_clipping()
        window = query[start:]
        wsize = len(window)
        partial_sum_offset = int(self.partial_sums[start + wsize])
        seed_offset = seed.offset - 1

        root = Column(1, seed.nodes[0], -1, 0, seed_offset, 0, 0, 0)
        root.S[0] = cfg.left_end_bonus if (cfg.left_end_bonus and not start) else 0
        self._extend_ins_end(root, wsize + 1, xdrop_cutoff)
        self.table.append(root)

        self.min_cell_score = 0
        best_score = 0
        # heap entries: (-converged_score, off_diag, -table_idx)
        queue = [(0, 0, 0)]
        tips = []

        while queue:
            item = heapq.heappop(queue)
            next_nodes = [item]
            while queue and queue[0][0] == next_nodes[-1][0]:
                next_nodes.append(heapq.heappop(queue))

            while next_nodes:
                i = -next_nodes.pop()[2]
                col = self.table[i]
                next_offset = col.offset + 1
                in_seed = 0 <= next_offset - seed.offset < len(seed.sequence)

                node_counter = len(self.table)
                if col.S[col.max_pos - col.trim] < best_score:
                    if node_counter / wsize >= cfg.max_nodes_per_seq_char:
                        queue = []
                        next_nodes = []
                        continue

                in_range = col.S >= xdrop_cutoff
                nz = np.flatnonzero(in_range)
                if len(nz) == 0:
                    continue
                begin = int(nz[0]) + col.trim
                prev_end = int(nz[-1]) + 1 + col.trim

                outgoing = self.call_outgoing(i, force_fixed_seed)
                if not outgoing:
                    tips.append(i)
                    continue

                end = min(prev_end, wsize) + 1

                for (nxt, c, node_score) in outgoing:
                    newcol = self._compute_column(
                        i, nxt, c, node_score, next_offset, begin, end,
                        prev_end, xdrop_cutoff, start, wsize)
                    diag_i = next_offset - seed_offset

                    # find max pos closest to diagonal; update min_cell_score
                    # (ref :643-650 comparison semantics)
                    S = newcol.S
                    finite = S[S != NINF]
                    if len(finite):
                        self.min_cell_score = min(self.min_cell_score,
                                                  int(finite.min()))
                    # argmax of (score, closeness to diagonal), first wins
                    dist = np.abs(np.arange(len(S)) + begin - diag_i)
                    cand = np.flatnonzero(S == S.max())
                    mp = int(cand[np.argmin(dist[cand])])
                    newcol.max_pos = mp + begin

                    max_val = int(S[mp])

                    # branch & bound: can any suffix still beat the cutoff?
                    has_extension = in_seed
                    if not has_extension:
                        pss = self.partial_sums[start + newcol.trim:
                                                start + newcol.trim + len(S)]
                        ext_cutoff = best_score * cfg.rel_score_cutoff \
                            + partial_sum_offset
                        if ((S + pss) >= ext_cutoff).any():
                            has_extension = True

                    if not in_seed and max_val < xdrop_cutoff:
                        continue
                    if not in_seed and not has_extension:
                        continue

                    self.table.append(newcol)

                    if max_val - xdrop_cutoff > xdrop:
                        xdrop_cutoff = max_val - xdrop
                    best_score = max(best_score, max_val)

                    # ref :721-728: vec_offset = start + begin - (begin != 0);
                    # skip the first cell when begin == 0 (pre-query position)
                    if newcol.trim:
                        v_off = start + newcol.trim - 1
                        s_scores = S
                    else:
                        v_off = start
                        s_scores = S[1:]
                    if len(s_scores) == 0:
                        continue

                    converged_score = self.update_seed_filter(
                        nxt, v_off, s_scores.astype(np.int64))
                    if converged_score != NINF:
                        entry = (-converged_score,
                                 abs(newcol.max_pos - diag_i),
                                 -(len(self.table) - 1))
                        if next_nodes and -converged_score == next_nodes[0][0]:
                            next_nodes.append(entry)
                        else:
                            heapq.heappush(queue, entry)

        if cfg.no_backtrack:
            return [seed]

        tips.sort()
        extensions = self._backtrack(min_path_score, window, start,
                                     cfg.right_end_bonus, tips, seed_offset)
        for ext in extensions:
            ext.trim_offset()
        return extensions

    def _compute_column(self, parent_i, node, c, node_score, offset,
                        begin, end, prev_end, xdrop_cutoff, start, wsize):
        cfg = self.config
        prev = self.table[parent_i]
        size = end - begin
        col = Column(size, node, parent_i, c, offset, begin, begin, node_score)
        prof = self.profile.get(c)
        if prof is None:
            prof = self.profile[self.wildcard] if self.wildcard \
                in self.profile \
                else np.full(len(self.query) + 1, NINF, dtype=np.int64)
        # previous column S/F aligned to this band
        Sp = np.full(size + 1, NINF, dtype=np.int64)   # Sp[j] = S_prev at begin+j-1
        Fp = np.full(size, NINF, dtype=np.int64)
        p_lo = prev.trim
        p_hi = prev.trim + len(prev.S)
        # S_prev for indices [begin-1, begin+size-1)
        lo = max(p_lo, begin - 1)
        hi = min(p_hi, begin + size)
        if hi > lo:
            Sp[lo - begin + 1: hi - begin + 1] = prev.S[lo - p_lo: hi - p_lo]
        lo = max(p_lo, begin)
        hi = min(p_hi, begin + size)
        if hi > lo:
            Fp[lo - begin: hi - begin] = prev.F[lo - p_lo: hi - p_lo]

        profile_seg = prof[start + begin: start + begin + size]

        ninf_mask_m = Sp[:-1] == NINF
        M = np.where(ninf_mask_m, NINF, Sp[:-1] + profile_seg + node_score)
        if begin == 0:
            M[0] = NINF

        if offset > 1:
            del_open = np.where(Sp[1:] == NINF, NINF, Sp[1:] + cfg.gap_opening_penalty)
            del_ext = np.where(Fp == NINF, NINF, Fp + cfg.gap_extension_penalty)
            F = np.maximum(del_open, del_ext)
            F = np.where(F == NINF, NINF, F + node_score)
        else:
            F = np.full(size, NINF, dtype=np.int64)
        col.F = F

        M = np.maximum(M, F)
        # E recurrence (ref update_column:263-275: E[j+1] opens from the
        # pre-E match value, extends from E[j]; S gets E before the x-drop
        # cut).  Closed form: E[j] = max_{i<j} M[i] + open + (j-1-i)*ext,
        # computed with a vectorized running max; NINF-derived candidates
        # always land <= NINF + open and are clamped back to exact NINF.
        E = np.full(size, NINF, dtype=np.int64)
        if size > 1:
            idx = np.arange(size, dtype=np.int64)
            B = M + cfg.gap_opening_penalty - (idx + 1) * cfg.gap_extension_penalty
            run = np.maximum.accumulate(B)
            Ev = run[:-1] + idx[1:] * cfg.gap_extension_penalty
            E[1:] = np.where(Ev <= NINF, NINF, Ev)
        S = np.maximum(M, E)
        S = np.where(S < xdrop_cutoff, NINF, S)
        col.E = E
        col.S = S
        self._extend_ins_end(col, wsize + 1 - col.trim, xdrop_cutoff)
        return col

    def _extend_ins_end(self, col, max_size, xdrop_cutoff):
        """ref extend_ins_end (:293-328)."""
        cfg = self.config
        S, E, F = list(col.S), list(col.E), list(col.F)
        if len(S) < max_size:
            back_s = S[-1] if S[-1] != NINF else NINF
            back_e = E[-1] if E[-1] != NINF else NINF
            cand = []
            if back_s != NINF:
                cand.append(back_s + cfg.gap_opening_penalty)
            if back_e != NINF:
                cand.append(back_e + cfg.gap_extension_penalty)
            ins_score = max(cand) if cand else NINF
            if ins_score >= xdrop_cutoff:
                S.append(ins_score)
                E.append(ins_score)
                F.append(NINF)
                while (E[-1] + cfg.gap_extension_penalty >= xdrop_cutoff
                       and len(E) < max_size):
                    E.append(E[-1] + cfg.gap_extension_penalty)
                    S.append(E[-1])
                    F.append(NINF)
        col.S = np.array(S, dtype=np.int64)
        col.E = np.array(E, dtype=np.int64)
        col.F = np.array(F, dtype=np.int64)

    # ----------------------------------------------------------- backtrack
    def _backtrack(self, min_path_score, window, start, right_end_bonus,
                   tips, seed_offset) -> List[Alignment]:
        cfg = self.config
        seed = self.seed
        k = self.graph.k
        k_minus_1 = k - 1
        last_pos = len(window)
        seed_dist = max(k, len(seed.sequence)) - 1
        min_start_score = min_path_score
        min_trace_length = k - seed.offset
        tips_set = set(tips)

        indices = []
        for i in range(1, len(self.table)):
            col = self.table[i]
            if col.offset < seed_dist:
                continue
            is_tip = i in tips_set

            def check_and_add(start_pos):
                prev = self.table[col.parent]
                if start_pos < prev.trim + 1:
                    return
                pos = start_pos - col.trim
                pos_p = start_pos - prev.trim - 1
                if pos < 0 or pos >= len(col.S):
                    return
                if pos_p < 0 or pos_p >= len(prev.S):
                    return
                if col.S[pos] == NINF or prev.S[pos_p] == NINF:
                    return
                end_bonus = right_end_bonus if start_pos == last_pos else 0
                if col.S[pos] + end_bonus >= min_start_score:
                    prof = self.profile.get(col.c)
                    sc = prof[start + start_pos] if prof is not None else NINF
                    is_match = (col.S[pos] == prev.S[pos_p] + col.score + sc
                                and start_pos >= 1
                                and window[start_pos - 1] == col.c)
                    if is_match or start_pos == last_pos or is_tip:
                        indices.append((int(col.S[pos]) + end_bonus,
                                        -abs(start_pos - col.offset + seed_offset),
                                        -i, start_pos))

            check_and_add(col.max_pos)
            if len(col.S) + col.trim == len(window) + 1 and col.max_pos != last_pos:
                check_and_add(last_pos)

        indices.sort(reverse=True)
        return self._backtrack_consume(indices, min_start_score, window,
                                       start, seed_offset)

    def _backtrack_consume(self, indices, min_start_score, window, start,
                           seed_offset) -> List[Alignment]:
        """Trace alignments from pre-collected candidate start cells
        (``indices`` sorted descending by (score, -off_diag, -idx, pos))."""
        cfg = self.config
        seed = self.seed
        k = self.graph.k
        k_minus_1 = k - 1
        min_trace_length = k - seed.offset
        extensions: List[Alignment] = []
        best_score = -(2 ** 62)

        for (start_score, neg_off_diag, neg_j, start_pos) in indices:
            if len(extensions) >= cfg.num_alternative_paths:
                break
            j = -neg_j
            if j in self.prev_starts:
                continue
            self.prev_starts.add(j)

            if start_score - self.min_cell_score < best_score:
                break

            path: List[int] = []
            ops = Cigar()
            seq = bytearray()
            score = start_score
            dummy_counter = 0
            extra_score = 0
            pos = start_pos
            end_pos = start_pos
            align_offset = seed.offset

            def append_node(node, c, offset, op):
                nonlocal dummy_counter, extra_score
                seq.append(c)
                ops.append(op)
                if offset >= k_minus_1:
                    path.append(node)
                    if not node:
                        dummy_counter += 1
                    elif dummy_counter:
                        ops.append(NODE_INSERTION, dummy_counter)
                        extra_score -= cfg.gap_opening_penalty \
                            + (dummy_counter - 1) * cfg.gap_extension_penalty
                        dummy_counter = 0

            trace_len = 0
            jj = j
            while jj:
                col = self.table[jj]
                prev = self.table[col.parent]
                align_offset = min(col.offset, k_minus_1)
                if pos == col.max_pos:
                    self.prev_starts.add(jj)
                S = col.S
                pt = pos - col.trim
                if pt < 0 or pt >= len(S) or S[pt] == NINF:
                    jj = 0
                    break
                prof = self.profile.get(col.c)
                sc = int(prof[start + pos]) if prof is not None else NINF

                took_ins = False
                if (pos and pt < len(col.E) and S[pt] == col.E[pt]
                        and (not ops or ops.ops[-1][0] != DELETION)):
                    # insertion run
                    last_op = INSERTION
                    while last_op == INSERTION:
                        ops.append(INSERTION)
                        e_here = col.E[pos - col.trim]
                        e_prev_idx = pos - col.trim - 1
                        ext = (e_prev_idx >= 0
                               and col.E[e_prev_idx] != NINF
                               and e_here == col.E[e_prev_idx]
                               + cfg.gap_extension_penalty)
                        last_op = INSERTION if ext else MATCH
                        pos -= 1
                    took_ins = True
                    continue

                pos_p = pos - prev.trim - 1
                if (pos and pos >= prev.trim + 1
                        and 0 <= pos_p < len(prev.S)
                        and S[pt] == prev.S[pos_p] + col.score + sc):
                    trace_len += 1
                    extra_score += col.score
                    op = MATCH if window[pos - 1] == col.c else MISMATCH
                    append_node(col.node, col.c, col.offset, op)
                    pos -= 1
                    jj = col.parent
                    continue

                if (pt < len(col.F) and S[pt] == col.F[pt]
                        and (not ops or ops.ops[-1][0] != INSERTION)):
                    last_op = DELETION
                    while last_op == DELETION and jj:
                        col = self.table[jj]
                        prev = self.table[col.parent]
                        align_offset = min(col.offset, k_minus_1)
                        pf = pos - prev.trim
                        ext = (0 <= pf < len(prev.F)
                               and prev.F[pf] != NINF
                               and col.F[pos - col.trim] == prev.F[pf]
                               + col.score + cfg.gap_extension_penalty)
                        last_op = DELETION if ext else MATCH
                        trace_len += 1
                        extra_score += col.score
                        append_node(col.node, col.c, col.offset, DELETION)
                        jj = col.parent
                    continue

                break

            if trace_len >= min_trace_length and path and path[-1]:
                cur_cell = int(self.table[jj].S[pos - self.table[jj].trim])
                best_score = max(best_score, score - cur_cell)
                if score - self.min_cell_score < best_score:
                    break
                root_S0 = int(self.table[0].S[0])
                if (score >= min_start_score
                        and (pos == 0 or cur_cell == 0)
                        and (pos != 0 or cur_cell == root_S0)
                        and (cfg.allow_left_trim or jj == 0)):
                    aln = self._construct_alignment(
                        ops, pos, window[pos:end_pos], path, bytes(seq),
                        score, align_offset, extra_score, start)
                    extensions.append(aln)

        return extensions

    def _construct_alignment(self, ops: Cigar, pos, window_sub, path, seq,
                             score, offset, extra_score, start) -> Alignment:
        """ref construct_alignment (:774-798): reverse the backtracked ops and
        wrap with full-query clipping."""
        rev_ops = [list(x) for x in ops.ops][::-1]
        clipping = start + pos
        c2 = Cigar(CLIPPED, clipping)
        for op, n in rev_ops:
            c2.append(op, n)
        c2.append(CLIPPED, len(self.query) - clipping - c2.num_query_chars())
        a = Alignment(query=self.query, nodes=path[::-1], sequence=bytes(seq[::-1]),
                      score=score, cigar=c2, orientation=self.seed.orientation,
                      offset=offset, extra_score=extra_score)
        return a
