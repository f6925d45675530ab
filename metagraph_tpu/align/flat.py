"""Flat multi-extension alignment engine.

Runs MANY seed extensions (across reads) concurrently: per global wave, every
active extension contributes its frontier columns; column scoring, x-drop
trimming, branch-and-bound, and the convergence filter are computed by ONE
set of stacked array ops over all extensions (ref per-read loop:
aligner_extender_methods.cpp:412-700 — semantics identical per extension,
see wave_extender.py for the single-extension reference implementation this
engine is tested against).

Per-extension state lives in vectors indexed by job id; per-job reductions
use segment ops over jid-sorted column stacks.  The per-extension outputs are
bit-identical to WaveExtender._extend / DefaultColumnExtender._extend: the
column tree (table), convergence-checker contents, and backtrack inputs are
reproduced exactly, wave by wave.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .alignment import Alignment
from .config import NINF
from .extender import Column, DefaultColumnExtender

_BIG = np.int64(2 ** 62)
_POS = np.int32(2 ** 31 - 1)


def _lite_column(node, parent, c, offset, max_pos, trim, score, S, E, F):
    col = Column.__new__(Column)
    col.S, col.E, col.F = S, E, F
    col.node = node
    col.parent = parent
    col.c = c
    col.offset = offset
    col.max_pos = max_pos
    col.trim = trim
    col.score = score
    return col


def _outgoing_batch(graph, nodes: np.ndarray):
    """(owner, child, char_code) for a node array (see wave_extender)."""
    fn = getattr(graph, "call_outgoing_batch", None)
    if fn is not None:
        return fn(nodes)
    owner, child, code = [], [], []
    for i, n in enumerate(nodes):
        for nxt, ch in graph.call_outgoing_kmers(int(n)):
            if ch != "$":
                owner.append(i)
                child.append(nxt)
                code.append(ord(ch.upper()))
    return (np.array(owner, dtype=np.int64), np.array(child, dtype=np.int64),
            np.array(code, dtype=np.int64))


class _Job:
    __slots__ = ("ext", "seed", "min_path_score", "ffs", "start", "window",
                 "wsize", "WS", "pso", "seed_offset", "tips", "best",
                 "cutoff", "conv_rows", "done", "result")

    def __init__(self, ext, seed, min_path_score, ffs):
        self.ext = ext
        self.seed = seed
        # extender entry clamp (wave_extender ref: _extend start)
        self.min_path_score = max(0, min_path_score)
        self.ffs = ffs
        self.tips: List[int] = []
        self.conv_rows = {}      # node -> row index into the CONV store
        self.done = False
        self.result = None


def extend_flat(jobs, backend: str = "numpy") -> List[List[Alignment]]:
    """Run extension jobs concurrently; returns per-job extension lists.

    jobs: list of (extender, seed, min_path_score, force_fixed_seed).
    Jobs are grouped by graph/profile compatibility; each group runs as one
    stacked wave loop.  Per-job results are identical to
    ``WaveExtender.get_extensions`` run sequentially.
    """
    results: List = [None] * len(jobs)
    groups = {}
    for i, (ext, seed, mps, ffs) in enumerate(jobs):
        if seed.empty():
            results[i] = []
            continue
        key = (id(ext.graph), ext.config.gap_opening_penalty,
               ext.config.gap_extension_penalty, bytes(ext.profile_chars))
        groups.setdefault(key, []).append(i)
    for idxs in groups.values():
        outs = _run_group([jobs[i] for i in idxs], backend)
        for i, out in zip(idxs, outs):
            results[i] = out
    return results


def _run_group(jobs_in, backend: str) -> List[List[Alignment]]:
    J = len(jobs_in)
    jobs = [_Job(*args) for args in jobs_in]
    ext0 = jobs[0].ext
    graph = ext0.graph
    cfg0 = ext0.config
    k = graph.k
    go = cfg0.gap_opening_penalty
    ge = cfg0.gap_extension_penalty
    C = len(ext0.profile_chars)
    char_idx = ext0.char_idx

    # ---------------------------------------------------------- job setup
    WSv = np.empty(J, dtype=np.int64)
    startv = np.empty(J, dtype=np.int64)
    wsizev = np.empty(J, dtype=np.int64)
    seed_off = np.empty(J, dtype=np.int64)       # seed.offset - 1
    seed_off0 = np.empty(J, dtype=np.int64)      # seed.offset
    seed_len = np.empty(J, dtype=np.int64)
    seed_node0 = np.empty(J, dtype=np.int64)
    ffs_v = np.zeros(J, dtype=bool)
    pso_v = np.empty(J, dtype=np.int64)
    max_nodes_cap = np.empty(J, dtype=np.float64)
    xdrop_v = np.empty(J, dtype=np.int32)
    rcut_v = np.empty(J, dtype=np.float64)

    for j, job in enumerate(jobs):
        ext, seed = job.ext, job.seed
        assert ext.graph is graph
        ext.seed = seed
        ext.clear_conv_checker()
        job.start = seed.get_clipping()
        job.window = ext.query[job.start:]
        job.wsize = len(job.window)
        job.WS = job.wsize + 1
        job.pso = int(ext.partial_sums[job.start + job.wsize])
        job.seed_offset = seed.offset - 1
        job.best = 0
        job.cutoff = max(-ext.config.xdrop, NINF + 1)
        WSv[j] = job.WS
        startv[j] = job.start
        wsizev[j] = job.wsize
        seed_off[j] = job.seed_offset
        seed_off0[j] = seed.offset
        seed_len[j] = len(seed.sequence)
        seed_node0[j] = seed.nodes[0]
        ffs_v[j] = job.ffs
        pso_v[j] = job.pso
        max_nodes_cap[j] = ext.config.max_nodes_per_seq_char
        xdrop_v[j] = ext.config.xdrop
        rcut_v[j] = ext.config.rel_score_cutoff

    W = int(WSv.max())
    jj = np.arange(W, dtype=np.int64)
    jj32 = jj.astype(np.int32)

    # padded per-job seed node/sequence tables
    Ln = max(len(job.seed.nodes) for job in jobs)
    Ls = max(len(job.seed.sequence) for job in jobs)
    seed_nodes = np.zeros((J, Ln), dtype=np.int64)
    seed_seq = np.zeros((J, max(Ls, 1)), dtype=np.int64)
    for j, job in enumerate(jobs):
        seed_nodes[j, : len(job.seed.nodes)] = job.seed.nodes
        seed_seq[j, : len(job.seed.sequence)] = np.frombuffer(
            job.seed.sequence, dtype=np.uint8)

    # profile stacks (J, C, W) and partial-sum rows (J, W)
    # value arrays are int32: NINF (= INT32_MIN + 100) fits exactly, all
    # score arithmetic stays within the +-100 headroom (see compute_wave's
    # wrap-safe E clamp), and halving the element size halves the memory
    # traffic of the wave loop — its dominant cost
    P = np.full((J, C, W), NINF, dtype=np.int32)
    pss = np.zeros((J, W), dtype=np.int32)
    for j, job in enumerate(jobs):
        ext = job.ext
        s, WS = job.start, job.WS
        for ci, c in enumerate(ext.profile_chars):
            P[j, ci, :WS] = ext.profile[c][s: s + WS]
        pss[j, :WS] = ext.partial_sums[s: s + WS]

    # per-job mutable vectors
    cutoff = np.array([job.cutoff for job in jobs], dtype=np.int32)
    best = np.zeros(J, dtype=np.int32)
    TL = np.ones(J, dtype=np.int64)              # len(ext.table)
    mcs = np.zeros(J, dtype=np.int32)            # min_cell_score

    # convergence-filter store: rows of width W-1; every row is fully
    # written at allocation time (scores are already NINF-padded), so the
    # backing store stays uninitialized — np.empty is a virtual allocation,
    # only rows actually written commit pages.  Sized so growth (which pays
    # a real copy) practically never happens: tables are ~bounded by
    # max_nodes_per_seq_char * window per job.
    conv_cap = max(4096, J * (int(max_nodes_cap.max() * W) + 64))
    CONV = np.empty((conv_cap, max(W - 1, 1)), dtype=np.int32)
    conv_n = 0

    def conv_alloc(n):
        nonlocal CONV, conv_cap, conv_n
        while conv_n + n > conv_cap:
            conv_cap *= 2
            newC = np.empty((conv_cap, CONV.shape[1]), dtype=np.int32)
            newC[:conv_n] = CONV[:conv_n]
            CONV = newC
        rows = np.arange(conv_n, conv_n + n)
        conv_n += n
        return rows

    # ------------------------------------------------------- root columns
    act_jid = np.arange(J, dtype=np.int64)
    act_tidx = np.zeros(J, dtype=np.int64)
    act_prio = np.zeros(J, dtype=np.int64)
    act_node = seed_node0.copy()
    act_offset = seed_off.copy()
    S_act = np.full((J, W), NINF, dtype=np.int32)
    F_act = np.full((J, W), NINF, dtype=np.int32)
    for j, job in enumerate(jobs):
        ext, WS = job.ext, job.WS
        cfgj = ext.config
        rS = np.full(WS, NINF, dtype=np.int32)
        rE = np.full(WS, NINF, dtype=np.int32)
        rF = np.full(WS, NINF, dtype=np.int32)
        rS[0] = cfgj.left_end_bonus \
            if (cfgj.left_end_bonus and not job.start) else 0
        if WS > 1:
            chain = rS[0] + go + np.arange(WS - 1, dtype=np.int64) * ge
            ok = chain >= job.cutoff
            ok &= np.minimum.accumulate(ok)
            rE[1:] = np.where(ok, chain, NINF)
            rS[1:] = rE[1:]
        root = _lite_column(job.seed.nodes[0], -1, 0, job.seed_offset, 0, 0,
                            0, rS, rE, rF)
        ext.table = [root]
        ext.prev_starts = set()
        ext.min_cell_score = 0
        S_act[j, :WS] = rS
        F_act[j, :WS] = rF

    from .wave_extender import compute_wave

    # --------------------------------------------------------- wave loop
    while len(act_jid):
        # per-job best-first order: (-priority, table idx) within each job.
        # Only the RANK is needed (children sort by their parent's rank);
        # the stacked rows themselves stay unsorted.
        order = np.lexsort((act_tidx, -act_prio, act_jid))
        prank = np.empty(len(order), dtype=np.int64)
        prank[order] = np.arange(len(order))

        cutc = cutoff[act_jid]
        inr = S_act >= cutc[:, None]
        anyr = inr.any(axis=1)
        # node cap (wave_extender.py:200): applies per job as a whole wave
        capped = (TL[act_jid].astype(np.float64)
                  / wsizev[act_jid]) >= max_nodes_cap[act_jid]
        if capped.any():
            anyr &= ~capped | (S_act.max(axis=1) >= best[act_jid])

        first = np.argmax(inr, axis=1)
        last = W - 1 - np.argmax(inr[:, ::-1], axis=1)
        band_lo = first
        band_hi = np.minimum(last + 1, wsizev[act_jid])
        hullM = (jj[None, :] >= np.maximum(first - 1, 0)[:, None]) \
            & (jj[None, :] <= (band_hi - 1)[:, None])
        hullF = (jj[None, :] >= first[:, None]) \
            & (jj[None, :] <= band_hi[:, None])

        # ---- enumerate children for every in-range column
        next_off = act_offset + 1
        seed_pos = next_off - seed_off0[act_jid]
        in_seed = anyr & (seed_pos >= 0) & (seed_pos < seed_len[act_jid])
        cls_a = in_seed & (next_off < k)
        cls_b = in_seed & ~cls_a & ffs_v[act_jid]
        cls_c = anyr & ~cls_a & ~cls_b

        rows_c = np.flatnonzero(cls_c)

        # a/b children in act-row order (per-job enumeration order)
        ab_rows = np.flatnonzero(cls_a | cls_b)
        a_of = cls_a[ab_rows]
        node_i = np.maximum(next_off[ab_rows] - k + 1, 0)
        ab_nodes = np.where(a_of, seed_node0[act_jid[ab_rows]],
                            seed_nodes[act_jid[ab_rows], node_i])
        ab_chars = seed_seq[act_jid[ab_rows], seed_pos[ab_rows]]
        ab_score = np.where(
            ~a_of & (ab_nodes == 0),
            np.where(act_node[ab_rows] == 0, ge, go), 0).astype(np.int32)

        if len(rows_c):
            own, chd, cde = _outgoing_batch(graph, act_node[rows_c])
            has_child = np.zeros(len(rows_c), dtype=bool)
            has_child[own] = True
            for r in rows_c[~has_child]:
                jobs[int(act_jid[r])].tips.append(int(act_tidx[r]))
            c_rows = rows_c[own]
            c_nodes = chd
            c_chars = cde
            # emission index within each parent (own is ascending)
            c_emi = np.arange(len(own), dtype=np.int64) \
                - np.searchsorted(own, own, side="left")
        else:
            c_rows = np.empty(0, dtype=np.int64)
            c_nodes = np.empty(0, dtype=np.int64)
            c_chars = np.empty(0, dtype=np.int64)
            c_emi = np.empty(0, dtype=np.int64)

        # per-job child order: [a/b children in parent-rank order] then
        # [graph children in parent-rank, emission order] (matches
        # wave_extender.py:221-266)
        ch_rows = np.concatenate([ab_rows, c_rows])
        if len(ch_rows) == 0:
            break
        ch_nodes = np.concatenate([ab_nodes, c_nodes])
        ch_chars = np.concatenate([ab_chars, c_chars])
        ch_score = np.concatenate(
            [ab_score, np.zeros(len(c_rows), dtype=np.int32)])
        ch_class = np.concatenate([np.zeros(len(ab_rows), dtype=np.int64),
                                   np.ones(len(c_rows), dtype=np.int64)])
        seqi = np.concatenate([np.zeros(len(ab_rows), dtype=np.int64),
                               c_emi])
        ch_jid = act_jid[ch_rows]
        corder = np.lexsort((seqi, prank[ch_rows], ch_class, ch_jid))
        ch_rows = ch_rows[corder]
        ch_nodes = ch_nodes[corder]
        ch_chars = ch_chars[corder]
        ch_score = ch_score[corder]
        ch_jid = ch_jid[corder]
        ch_off = next_off[ch_rows]

        # ---- stacked column recurrence
        SpM = np.where(hullM[ch_rows], S_act[ch_rows], NINF)
        SpF = np.where(hullF[ch_rows], S_act[ch_rows], NINF)
        Fp = np.where(hullF[ch_rows], F_act[ch_rows], NINF)
        prof = P[ch_jid, char_idx[ch_chars]]
        blo = band_lo[ch_rows]
        bhi = band_hi[ch_rows]
        ccut = cutoff[ch_jid]
        if backend == "device" and len(ch_rows) >= 64:
            from .batch import _compute_wave_device
            S, E, F = _compute_wave_device(SpM, SpF, Fp, prof, ch_score,
                                           ch_off > 1, blo, bhi, ccut, go, ge)
            S = S.astype(np.int32)
            E = E.astype(np.int32)
            F = F.astype(np.int32)
        else:
            S, E, F = compute_wave(SpM, SpF, Fp, prof, ch_score, ch_off > 1,
                                   blo, bhi, ccut, go, ge)
        # mask the pad region beyond each job's window width
        if WSv.min() < W:
            pad = jj[None, :] >= WSv[ch_jid][:, None]
            S = np.where(pad, NINF, S)
            E = np.where(pad, NINF, E)
            F = np.where(pad, NINF, F)
        else:
            pad = None

        # max pos closest to the diagonal (wave_extender.py:284-288)
        diag = (ch_off - seed_off[ch_jid]).astype(np.int32)
        Smax = S.max(axis=1)
        dist = np.abs(jj32[None, :] - diag[:, None])
        if pad is not None:
            dist = np.where(pad, _POS, dist)
        mp = np.argmin(np.where(S == Smax[:, None], dist, _POS), axis=1)

        # per-job min cell score
        fin = np.where(S == NINF, _POS, S)
        col_min = fin.min(axis=1)
        np.minimum.at(mcs, ch_jid, col_min)

        # branch & bound (pre-wave best/cutoff, wave_extender.py:295-300)
        spos_c = ch_off - seed_off0[ch_jid]
        in_seed_c = (spos_c >= 0) & (spos_c < seed_len[ch_jid])
        ext_cut = (best[ch_jid] * rcut_v[ch_jid] + pso_v[ch_jid])
        has_ext = in_seed_c | ((S + pss[ch_jid]) >= ext_cut[:, None]).any(axis=1)
        keep = in_seed_c | ((Smax >= ccut) & has_ext)

        kept = np.flatnonzero(keep)
        if len(kept) == 0:
            # no job appended anything: all actives die this wave
            break

        kj = ch_jid[kept]
        # per-job cutoff/best update = max over kept children (post-wave)
        kmax = Smax[kept]
        np.maximum.at(best, kj, kmax)
        np.maximum.at(cutoff, kj, kmax - xdrop_v[kj])

        # ---- convergence filter, batched over kept children.  Columns of
        # empty windows (wsize == 0) skip the filter and go inactive
        # (wave_extender.py:321-329); dummy nodes (0) skip the store but
        # return their raw max (extender.py:131-133).
        scores_k = S[kept, 1:]                       # (Nk, W-1), pad NINF
        nodes_k = ch_nodes[kept]
        ret = np.full(len(kept), NINF, dtype=np.int32)
        nonempty = wsizev[kj] > 0

        zero_node = nonempty & (nodes_k == 0)
        if zero_node.any():
            ret[zero_node] = scores_k[zero_node].max(axis=1)

        # group kept children by (job, node); duplicates within one wave are
        # processed in order via repeated vector passes (rare)
        nz = np.flatnonzero(nonempty & (nodes_k != 0))
        if len(nz):
            remaining = nz
            rem_keys = kj[nz] * (1 << 44) + nodes_k[nz]
            while len(remaining):
                _, first_idx = np.unique(rem_keys, return_index=True)
                sel = remaining[first_idx]
                # split new vs existing rows
                rows = np.empty(len(sel), dtype=np.int64)
                is_new = np.zeros(len(sel), dtype=bool)
                for t, ci in enumerate(sel):
                    r = jobs[int(kj[ci])].conv_rows.get(int(nodes_k[ci]))
                    if r is None:
                        is_new[t] = True
                    else:
                        rows[t] = r
                newi = np.flatnonzero(is_new)
                if len(newi):
                    newrows = conv_alloc(len(newi))
                    CONV[newrows] = scores_k[sel[newi]]
                    for t, r in zip(newi, newrows):
                        ci = sel[t]
                        jobs[int(kj[ci])].conv_rows[int(nodes_k[ci])] = int(r)
                    ret[sel[newi]] = scores_k[sel[newi]].max(axis=1)
                oldi = np.flatnonzero(~is_new)
                if len(oldi):
                    orow = rows[oldi]
                    seg = CONV[orow]
                    sc = scores_k[sel[oldi]]
                    improved = sc > seg * rcut_v[kj[sel[oldi]]][:, None]
                    upd = np.where(improved, np.maximum(seg, sc), seg)
                    CONV[orow] = upd
                    chg = np.where(improved, upd, NINF).max(axis=1)
                    ret[sel[oldi]] = np.where(improved.any(axis=1), chg, NINF)
                # drop processed, keep later duplicates for the next pass
                mask = np.ones(len(remaining), dtype=bool)
                mask[first_idx] = False
                remaining = remaining[mask]
                rem_keys = rem_keys[mask]

        # ---- append kept columns to their tables (per-job order preserved)
        new_jid = []
        new_tidx = []
        new_prio = []
        new_rows = []
        for t in range(len(kept)):
            i = int(kept[t])
            jid_i = int(ch_jid[i])
            job = jobs[jid_i]
            WSj = job.WS
            col = _lite_column(int(ch_nodes[i]), int(act_tidx[ch_rows[i]]),
                               int(ch_chars[i]), int(ch_off[i]), int(mp[i]),
                               0, int(ch_score[i]), S[i, :WSj], E[i, :WSj],
                               F[i, :WSj])
            job.ext.table.append(col)
            if ret[t] != NINF:
                new_jid.append(jid_i)
                new_tidx.append(len(job.ext.table) - 1)
                new_prio.append(int(ret[t]))
                new_rows.append(i)
        np.add.at(TL, kj, 1)

        if new_rows:
            nr = np.array(new_rows, dtype=np.int64)
            act_jid = np.array(new_jid, dtype=np.int64)
            act_tidx = np.array(new_tidx, dtype=np.int64)
            act_prio = np.array(new_prio, dtype=np.int64)
            act_node = ch_nodes[nr]
            act_offset = ch_off[nr]
            S_act = S[nr]
            F_act = F[nr]
        else:
            act_jid = np.empty(0, dtype=np.int64)

    # -------------------------------------------------------- finalize
    out = []
    for j, job in enumerate(jobs):
        ext = job.ext
        ext.min_cell_score = int(mcs[j])
        # persist the convergence filter for check_seed across seeds: one
        # fancy-index gather per job, then per-node views into the block
        startj = job.start
        WSj = job.WS
        if job.conv_rows:
            items = list(job.conv_rows.items())
            block = CONV[np.fromiter((r for _, r in items), dtype=np.int64,
                                     count=len(items)), : WSj - 1]
            cc = ext.conv_checker
            for t, (node, _row) in enumerate(items):
                cc[node] = (startj, block[t])
        if ext.config.no_backtrack:
            out.append([job.seed])
            continue
        job.tips.sort()
        exts = ext._backtrack(job.min_path_score, job.window, startj,
                              ext.config.right_end_bonus, job.tips,
                              job.seed_offset)
        for e in exts:
            e.trim_offset()
        out.append(exts)
    return out
