"""Wave-parallel batched column extender.

The exact best-first extender (extender.py, ref
aligner_extender_methods.cpp:222-390) computes one DP column per graph node
per Python iteration.  This extender processes the column tree in *waves*:
every active column's children are computed together as full-width banded
arrays with one set of batched numpy ops per wave — the same recurrence, the
same x-drop/branch-and-bound/convergence filters, but O(depth) array passes
instead of O(columns) Python iterations.  The batched wave kernel
(`compute_wave`) is the unit that the device (TPU) batch aligner jits across
reads.

Column values are identical to the host extender's banded computation: a
full-width column with the parent hull masked to its in-range span and
post-masked by the x-drop cutoff reproduces the banded values plus the
ins-end extension (extender.py:386) in one shot.  Processing order inside a
wave follows the parent's queue priority, approximating the reference's
best-first pop order so that backtrack tie-breaking stays aligned.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .alignment import Alignment
from .config import NINF
from .extender import Column, DefaultColumnExtender

_BIG = np.int64(2 ** 62)


def _outgoing_batch(graph, nodes: np.ndarray):
    """(owner, child, char_code) for a node array; vectorized when the graph
    supports it, per-node fallback otherwise."""
    fn = getattr(graph, "call_outgoing_batch", None)
    if fn is not None:
        return fn(nodes)
    owner, child, code = [], [], []
    for i, n in enumerate(nodes):
        for nxt, ch in graph.call_outgoing_kmers(int(n)):
            c = ord(ch.upper())
            if ch != "$":
                owner.append(i)
                child.append(nxt)
                code.append(c)
    return (np.array(owner, dtype=np.int64), np.array(child, dtype=np.int64),
            np.array(code, dtype=np.int64))


def compute_wave(SpM: np.ndarray, SpF: np.ndarray, Fp: np.ndarray,
                 prof: np.ndarray, node_score: np.ndarray,
                 has_del: np.ndarray, band_lo: np.ndarray,
                 band_hi: np.ndarray, xdrop_cutoff, gap_open: int,
                 gap_ext: int):
    """Batched full-width column recurrence (extender.py:325-384 vectorized).

    SpM: (N, WS) parent S masked to the M read span [first-1, min(last,
    wsize-1)]; SpF/Fp: parent S/F masked to the F read span (the child band
    [band_lo, band_hi]); prof: (N, WS) profile rows; node_score: (N,);
    has_del: (N,) whether offset > 1; band_lo/band_hi: (N,) inclusive child
    band bounds (begin, end-1) — E values outside the band are masked unless
    the cell survives the cutoff (the host's ins-end appended region).
    Returns (S, E, F) each (N, WS) int64, identical to the host's banded
    columns embedded at full width.
    """
    N, WS = SpM.shape
    ns = node_score[:, None]
    # M[j] = Sp[j-1] + prof[j] + ns  (M[0] = NINF)
    M = np.full((N, WS), NINF, dtype=np.int64)
    M[:, 1:] = np.where(SpM[:, :-1] == NINF, NINF,
                        SpM[:, :-1] + prof[:, 1:] + ns)
    # F[j] = max(Sp[j] + open, Fp[j] + ext) + ns   (only when offset > 1)
    del_open = np.where(SpF == NINF, NINF, SpF + gap_open)
    del_ext = np.where(Fp == NINF, NINF, Fp + gap_ext)
    F = np.maximum(del_open, del_ext)
    F = np.where(F == NINF, NINF, F + ns)
    F = np.where(has_del[:, None], F, NINF)
    M = np.maximum(M, F)
    # E[j] = max_{i<j} M[i] + open + (j-1-i)*ext  via running max
    E = np.full((N, WS), NINF, dtype=np.int64)
    if WS > 1:
        idx = np.arange(WS, dtype=np.int64)
        B = M + gap_open - (idx + 1)[None, :] * gap_ext
        run = np.maximum.accumulate(B, axis=1)
        Ev = run[:, :-1] + (idx[1:] * gap_ext)[None, :]
        E[:, 1:] = np.where(Ev <= NINF, NINF, Ev)
    cut = np.asarray(xdrop_cutoff, dtype=np.int64)
    if cut.ndim:
        cut = cut[:, None]
    S = np.maximum(M, E)
    S = np.where(S < cut, NINF, S)
    # E presence: in-band cells keep raw E (host stores them unmasked); the
    # appended region beyond the band exists only while the chain clears the
    # cutoff (extender.py:386-410)
    jj = np.arange(WS)
    in_band = (jj[None, :] >= band_lo[:, None]) \
        & (jj[None, :] <= band_hi[:, None])
    E = np.where(in_band | (S != NINF), E, NINF)
    return S, E, F


class WaveExtender(DefaultColumnExtender):
    """Drop-in DefaultColumnExtender with wave-parallel column computation."""

    def _extend(self, min_path_score: int, force_fixed_seed: bool
                ) -> List[Alignment]:
        """Single-read path: drive the wave generator with local compute."""
        gen = self._extend_waves(min_path_score, force_fixed_seed)
        resp = None
        while True:
            try:
                tag, req = gen.send(resp)
            except StopIteration as st:
                return st.value
            resp = _outgoing_batch(self.graph, req) if tag == "out" \
                else compute_wave(*req)

    def get_extensions_waves(self, seed: Alignment, min_path_score: int,
                             force_fixed_seed: bool):
        """Generator variant of get_extensions: yields compute_wave argument
        tuples, receives (S, E, F), returns the extensions (used by the
        lockstep batch driver, align/batch.py)."""
        if seed.empty():
            return []
        self.seed = seed
        self.clear_conv_checker()
        return (yield from self._extend_waves(min_path_score,
                                              force_fixed_seed))

    def _extend_waves(self, min_path_score: int, force_fixed_seed: bool):
        cfg = self.config
        seed = self.seed
        query = self.query
        k = self.graph.k
        min_path_score = max(0, min_path_score)

        xdrop = cfg.xdrop
        xdrop_cutoff = max(-xdrop, NINF + 1)

        start = seed.get_clipping()
        window = query[start:]
        wsize = len(window)
        WS = wsize + 1
        partial_sum_offset = int(self.partial_sums[start + wsize])
        seed_offset = seed.offset - 1

        # profile matrix (C, WS): one row per alphabet char (ACGT$N for DNA,
        # the full letter set otherwise), sliced to the window
        P = np.stack([self.profile[c][start: start + WS]
                      for c in self.profile_chars])
        char_idx = self.char_idx
        pss = self.partial_sums[start: start + WS]

        # ---- root column (extender.py:207-209 + extend_ins_end, full width)
        rS = np.full(WS, NINF, dtype=np.int64)
        rE = np.full(WS, NINF, dtype=np.int64)
        rF = np.full(WS, NINF, dtype=np.int64)
        rS[0] = cfg.left_end_bonus if (cfg.left_end_bonus and not start) else 0
        if WS > 1:
            chain = rS[0] + cfg.gap_opening_penalty \
                + np.arange(WS - 1, dtype=np.int64) * cfg.gap_extension_penalty
            ok = chain >= xdrop_cutoff
            ok &= np.minimum.accumulate(ok)        # stop at first failure
            rE[1:] = np.where(ok, chain, NINF)
            rS[1:] = rE[1:]
        root = Column(1, seed.nodes[0], -1, 0, seed_offset, 0, 0, 0)
        root.S, root.E, root.F = rS, rE, rF
        self.table: List[Column] = [root]
        self.prev_starts = set()

        self.min_cell_score = 0
        best_score = 0
        tips: List[int] = []

        # active wave: table indices + their queue priority (converged
        # score), plus the wave's S/F rows carried as arrays (avoids
        # re-stacking per-column views every iteration)
        active = [0]
        priority = [0]
        wave_S = rS[None, :]
        wave_F = rF[None, :]

        while active:
            # best-first approximation: order the wave by priority desc
            order = sorted(range(len(active)),
                           key=lambda i: (-priority[i], active[i]))
            act = [active[i] for i in order]

            Sp_all = wave_S[order]
            Fp_all = wave_F[order]

            # per-parent in-range hull vs current cutoff (extender.py:237-242)
            inr = Sp_all >= xdrop_cutoff
            anyr = inr.any(axis=1)
            # node cap (extender.py:231-235): once over budget, below-best
            # columns stop (they pop last in the reference, triggering the
            # global kill before they would be processed)
            if len(self.table) / wsize >= cfg.max_nodes_per_seq_char:
                anyr &= Sp_all.max(axis=1) >= best_score
            if not anyr.any():
                break
            first = np.argmax(inr, axis=1)
            last = WS - 1 - np.argmax(inr[:, ::-1], axis=1)
            jj = np.arange(WS)
            # child band [begin, end) = [first, min(last+1, wsize) + 1)
            # (extender.py:241-249); M reads parent S on [first-1, end-2],
            # F reads parent S/F on [first, end-1]
            band_lo = first
            band_hi = np.minimum(last + 1, wsize)      # end - 1, inclusive
            hullM = (jj[None, :] >= np.maximum(first - 1, 0)[:, None]) \
                & (jj[None, :] <= (band_hi - 1)[:, None])
            hullF = (jj[None, :] >= first[:, None]) \
                & (jj[None, :] <= band_hi[:, None])
            SpM_all = np.where(hullM, Sp_all, NINF)
            SpF_all = np.where(hullF, Sp_all, NINF)
            Fp_eff = np.where(hullF, Fp_all, NINF)

            # ---- enumerate children (call_outgoing, extender.py:154-177)
            par_rows: List[int] = []
            ch_nodes: List[int] = []
            ch_chars: List[int] = []
            ch_score: List[int] = []
            graph_rows = []
            graph_nodes = []
            for r, ti in enumerate(act):
                if not anyr[r]:
                    continue
                col = self.table[ti]
                next_offset = col.offset + 1
                seed_pos = next_offset - seed.offset
                in_seed = 0 <= seed_pos < len(seed.sequence)
                if in_seed and next_offset < k:
                    par_rows.append(r)
                    ch_nodes.append(seed.nodes[0])
                    ch_chars.append(seed.sequence[seed_pos])
                    ch_score.append(0)
                elif in_seed and force_fixed_seed:
                    node_i = next_offset - k + 1
                    nxt = seed.nodes[node_i]
                    s = 0
                    if not nxt:
                        s = (cfg.gap_extension_penalty if not col.node
                             else cfg.gap_opening_penalty)
                    par_rows.append(r)
                    ch_nodes.append(nxt)
                    ch_chars.append(seed.sequence[seed_pos])
                    ch_score.append(s)
                else:
                    graph_rows.append(r)
                    graph_nodes.append(col.node)
            if graph_nodes:
                # traversal request served by the driver (batched across all
                # lockstep reads — one BOSS batch op per global wave)
                own, chd, cde = yield (
                    "out", np.array(graph_nodes, dtype=np.int64))
                gr = np.array(graph_rows, dtype=np.int64)
                has_child = np.zeros(len(graph_nodes), dtype=bool)
                has_child[own] = True
                for r in gr[~has_child]:
                    tips.append(act[int(r)])
                par_rows.extend(gr[own].tolist())
                ch_nodes.extend(chd.tolist())
                ch_chars.extend(cde.tolist())
                ch_score.extend([0] * len(chd))
            if not par_rows:
                break

            pr = np.array(par_rows, dtype=np.int64)
            nodes_arr = np.array(ch_nodes, dtype=np.int64)
            chars_arr = np.array(ch_chars, dtype=np.int64)
            score_arr = np.array(ch_score, dtype=np.int64)
            offs_arr = np.array([self.table[act[int(r)]].offset + 1
                                 for r in pr], dtype=np.int64)

            # ---- batched column recurrence (computed by the wave driver)
            S, E, F = yield ("wave", (
                SpM_all[pr], SpF_all[pr], Fp_eff[pr], P[char_idx[chars_arr]],
                score_arr, offs_arr > 1, band_lo[pr], band_hi[pr],
                np.full(len(pr), xdrop_cutoff, dtype=np.int64),
                cfg.gap_opening_penalty, cfg.gap_extension_penalty))

            # max pos closest to the diagonal (extender.py:261-268)
            diag = offs_arr - seed_offset
            Smax = S.max(axis=1)
            dist = np.abs(jj[None, :] - diag[:, None])
            mp = np.argmin(np.where(S == Smax[:, None], dist, _BIG), axis=1)

            fin = np.where(S == NINF, _BIG, S)
            wave_min = int(fin.min())
            if wave_min < self.min_cell_score and wave_min != _BIG:
                self.min_cell_score = wave_min

            # branch & bound (extender.py:272-284)
            seed_pos_c = offs_arr - seed.offset
            in_seed_c = (0 <= seed_pos_c) & (seed_pos_c < len(seed.sequence))
            ext_cutoff = best_score * cfg.rel_score_cutoff + partial_sum_offset
            has_ext = in_seed_c | ((S + pss[None, :]) >= ext_cutoff).any(axis=1)
            keep = in_seed_c | ((Smax >= xdrop_cutoff) & has_ext)

            # ---- append survivors, update filters (sequential, pop order)
            next_active: List[int] = []
            next_priority: List[int] = []
            next_rows: List[int] = []
            new_cutoff = xdrop_cutoff
            for i in range(len(pr)):
                if not keep[i]:
                    continue
                parent_ti = act[int(pr[i])]
                col = Column(WS, int(nodes_arr[i]), parent_ti,
                             int(chars_arr[i]), int(offs_arr[i]),
                             int(mp[i]), 0, int(score_arr[i]))
                col.S, col.E, col.F = S[i], E[i], F[i]
                self.table.append(col)
                max_val = int(Smax[i])
                if max_val - xdrop > new_cutoff:
                    new_cutoff = max_val - xdrop
                if max_val > best_score:
                    best_score = max_val
                s_scores = S[i][1:]
                if len(s_scores) == 0:
                    continue
                converged = self.update_seed_filter(
                    int(nodes_arr[i]), start, s_scores.astype(np.int64))
                if converged != NINF:
                    next_active.append(len(self.table) - 1)
                    next_priority.append(converged)
                    next_rows.append(i)
            xdrop_cutoff = new_cutoff
            active = next_active
            priority = next_priority
            if next_rows:
                wave_S = S[next_rows]
                wave_F = F[next_rows]

        if cfg.no_backtrack:
            return [seed]

        tips.sort()
        extensions = self._backtrack(min_path_score, window, start,
                                     cfg.right_end_bonus, tips, seed_offset)
        for ext in extensions:
            ext.trim_offset()
        return extensions
