"""Flat multi-extension alignment engine with continuous job admission.

Runs MANY seed extensions (across reads) concurrently: per global wave, every
active extension contributes its frontier columns; column scoring, x-drop
trimming, branch-and-bound, and the convergence filter are computed by ONE
set of stacked array ops over all extensions (ref per-read loop:
aligner_extender_methods.cpp:412-700 — semantics identical per extension,
see wave_extender.py for the single-extension reference implementation this
engine is tested against).

The engine admits new extension jobs while others are mid-flight (continuous
batching): when a read finishes one extension, its next seed's extension
joins the running wave pool immediately, so the pool stays dense instead of
draining round by round.  Per-extension state lives in vectors indexed by a
job slot; per-job reductions use ufunc.at over the column stacks.  Value
arrays are int32 — NINF (= INT32_MIN + 100) fits exactly and all score
arithmetic stays within the +-100 headroom (see compute_wave's wrap-safe E
clamp) — which halves the memory traffic of the wave loop, its dominant
cost.  Per-extension outputs are bit-identical to WaveExtender /
DefaultColumnExtender run sequentially.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .alignment import Alignment
from .config import NINF
from .extender import Column

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
    """(owner, child, char_code) for a node array."""
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


def _group_key(ext):
    return (id(ext.graph), ext.config.gap_opening_penalty,
            ext.config.gap_extension_penalty, bytes(ext.profile_chars))


class _Job:
    __slots__ = ("ext", "seed", "min_path_score", "ffs", "start", "window",
                 "wsize", "WS", "seed_offset", "tips", "conv_rows", "cand",
                 "done")

    def __init__(self, ext, seed, min_path_score, ffs):
        self.ext = ext
        self.seed = seed
        # extender entry clamp (wave_extender ref: _extend start)
        self.min_path_score = max(0, min_path_score)
        self.ffs = ffs
        self.tips: List[int] = []
        self.conv_rows = {}      # node -> row index into the CONV store
        self.cand: List[tuple] = []   # per-wave backtrack candidate arrays
        self.done = False


def _grow1(a, cap, fill=None):
    out = np.empty(cap, dtype=a.dtype) if fill is None \
        else np.full(cap, fill, dtype=a.dtype)
    out[: len(a)] = a
    return out


class FlatEngine:
    """Stacked wave loop over a dynamic pool of extension jobs.

    ``add_job`` may be called between ``step`` calls; each ``step`` advances
    every active extension by one DP column tree level and returns the job
    slots that completed.  ``finalize`` backtracks a completed job and
    returns its extensions.
    """

    def __init__(self, graph, config, profile_chars, char_idx, W,
                 backend: str = "numpy"):
        self.graph = graph
        self.k = graph.k
        self.go = config.gap_opening_penalty
        self.ge = config.gap_extension_penalty
        self.backend = backend
        self.W = int(W)
        self.C = len(profile_chars)
        self.profile_chars = profile_chars
        self.char_idx = char_idx
        W = self.W
        self.jj = np.arange(W, dtype=np.int64)
        self.jj32 = self.jj.astype(np.int32)

        self.jobs: List[_Job] = []
        cap = self.jcap = 64
        self.WSv = np.empty(cap, dtype=np.int64)
        self.wsizev = np.empty(cap, dtype=np.int64)
        self.seed_off = np.empty(cap, dtype=np.int64)    # seed.offset - 1
        self.seed_off0 = np.empty(cap, dtype=np.int64)   # seed.offset
        self.seed_len = np.empty(cap, dtype=np.int64)
        self.seed_node0 = np.empty(cap, dtype=np.int64)
        self.ffs_v = np.zeros(cap, dtype=bool)
        self.pso_v = np.empty(cap, dtype=np.int64)
        self.max_nodes_cap = np.empty(cap, dtype=np.float64)
        self.xdrop_v = np.empty(cap, dtype=np.int32)
        self.rcut_v = np.empty(cap, dtype=np.float64)
        self.cutoff = np.empty(cap, dtype=np.int32)
        self.best = np.zeros(cap, dtype=np.int32)
        self.TL = np.ones(cap, dtype=np.int64)
        self.mcs = np.zeros(cap, dtype=np.int32)
        self.msc_v = np.empty(cap, dtype=np.int64)      # min start score
        self.reb_v = np.empty(cap, dtype=np.int64)      # right end bonus
        self.sdist_v = np.empty(cap, dtype=np.int64)    # seed_dist
        self.Ln = 8
        self.Ls = 8
        self.seed_nodes = np.zeros((cap, self.Ln), dtype=np.int64)
        self.seed_seq = np.zeros((cap, self.Ls), dtype=np.int64)
        self.P = np.full((cap, self.C, W), NINF, dtype=np.int32)
        self.pss = np.zeros((cap, W), dtype=np.int32)
        self.winb = np.zeros((cap, W), dtype=np.int64)  # window bytes

        # active column stacks: S/F rows live in capacity buffers so both
        # wave-end rebuilds and admissions write rows in place instead of
        # copying the whole stack
        self._pending: List[tuple] = []
        self._acap = 256
        self._Sbuf = np.empty((self._acap, W), dtype=np.int32)
        self._Fbuf = np.empty((self._acap, W), dtype=np.int32)
        self.act_jid = np.empty(0, dtype=np.int64)
        self.act_tidx = np.empty(0, dtype=np.int64)
        self.act_prio = np.empty(0, dtype=np.int64)
        self.act_node = np.empty(0, dtype=np.int64)
        self.act_offset = np.empty(0, dtype=np.int64)
        self.S_act = self._Sbuf[:0]
        self.F_act = self._Fbuf[:0]

        # convergence-filter store: rows of width W-1; rows are fully
        # written at allocation (np.empty = a virtual allocation — pages
        # commit only on write, so a generous cap costs nothing; growth
        # pays a real copy on this host's slow memory, so avoid it)
        self.conv_cap = 1 << 18
        self.CONV = np.empty((self.conv_cap, max(W - 1, 1)), dtype=np.int32)
        self.conv_n = 0

    # ------------------------------------------------------------- admission
    def _grow_jobs(self, need):
        cap = self.jcap
        while cap < need:
            cap *= 2
        if cap == self.jcap:
            return
        self.jcap = cap
        for name in ("WSv", "wsizev", "seed_off", "seed_off0", "seed_len",
                     "seed_node0", "pso_v", "max_nodes_cap", "xdrop_v",
                     "rcut_v", "cutoff", "msc_v", "reb_v", "sdist_v"):
            setattr(self, name, _grow1(getattr(self, name), cap))
        self.ffs_v = _grow1(self.ffs_v, cap, fill=False)
        self.best = _grow1(self.best, cap, fill=0)
        self.TL = _grow1(self.TL, cap, fill=1)
        self.mcs = _grow1(self.mcs, cap, fill=0)
        for name, width in (("seed_nodes", self.Ln), ("seed_seq", self.Ls)):
            old = getattr(self, name)
            new = np.zeros((cap, width), dtype=np.int64)
            new[: len(old)] = old
            setattr(self, name, new)
        newP = np.full((cap, self.C, self.W), NINF, dtype=np.int32)
        newP[: len(self.P)] = self.P
        self.P = newP
        newpss = np.zeros((cap, self.W), dtype=np.int32)
        newpss[: len(self.pss)] = self.pss
        self.pss = newpss
        newwin = np.zeros((cap, self.W), dtype=np.int64)
        newwin[: len(self.winb)] = self.winb
        self.winb = newwin

    def _grow_seed_tables(self, ln, ls):
        if ln > self.Ln:
            while self.Ln < ln:
                self.Ln *= 2
            new = np.zeros((self.jcap, self.Ln), dtype=np.int64)
            new[:, : self.seed_nodes.shape[1]] = self.seed_nodes
            self.seed_nodes = new
        if ls > self.Ls:
            while self.Ls < ls:
                self.Ls *= 2
            new = np.zeros((self.jcap, self.Ls), dtype=np.int64)
            new[:, : self.seed_seq.shape[1]] = self.seed_seq
            self.seed_seq = new

    def add_job(self, ext, seed, min_path_score, force_fixed_seed) -> int:
        """Admit one extension; returns its job slot.  The job joins the
        wave pool at the next step()."""
        assert ext.graph is self.graph
        job = _Job(ext, seed, min_path_score, force_fixed_seed)
        j = len(self.jobs)
        self.jobs.append(job)
        self._grow_jobs(j + 1)
        self._grow_seed_tables(len(seed.nodes), len(seed.sequence))

        ext.seed = seed
        ext.clear_conv_checker()
        job.start = seed.get_clipping()
        job.window = ext.query[job.start:]
        job.wsize = len(job.window)
        job.WS = job.wsize + 1
        assert job.WS <= self.W, (job.WS, self.W)
        job.seed_offset = seed.offset - 1
        cfgj = ext.config
        cut0 = max(-cfgj.xdrop, NINF + 1)

        WS = job.WS
        self.WSv[j] = WS
        self.wsizev[j] = job.wsize
        self.seed_off[j] = job.seed_offset
        self.seed_off0[j] = seed.offset
        self.seed_len[j] = len(seed.sequence)
        self.seed_node0[j] = seed.nodes[0]
        self.ffs_v[j] = job.ffs
        self.pso_v[j] = int(ext.partial_sums[job.start + job.wsize])
        self.max_nodes_cap[j] = cfgj.max_nodes_per_seq_char
        self.xdrop_v[j] = cfgj.xdrop
        self.rcut_v[j] = cfgj.rel_score_cutoff
        self.cutoff[j] = cut0
        self.best[j] = 0
        self.TL[j] = 1
        self.mcs[j] = 0
        self.seed_nodes[j, : len(seed.nodes)] = seed.nodes
        self.seed_nodes[j, len(seed.nodes):] = 0
        self.seed_seq[j, : len(seed.sequence)] = np.frombuffer(
            seed.sequence, dtype=np.uint8)
        self.seed_seq[j, len(seed.sequence):] = 0
        self.msc_v[j] = job.min_path_score
        self.reb_v[j] = cfgj.right_end_bonus
        self.sdist_v[j] = max(self.k, len(seed.sequence)) - 1
        s = job.start
        self.P[j, :, WS:] = NINF
        for ci, c in enumerate(ext.profile_chars):
            self.P[j, ci, :WS] = ext.profile[c][s: s + WS]
        self.pss[j, :WS] = ext.partial_sums[s: s + WS]
        self.pss[j, WS:] = 0
        self.winb[j, : job.wsize] = np.frombuffer(job.window, dtype=np.uint8)
        self.winb[j, job.wsize:] = 0

        # root column (extender.py:219-231 + full-width ins-end chain)
        rS = np.full(WS, NINF, dtype=np.int32)
        rE = np.full(WS, NINF, dtype=np.int32)
        rF = np.full(WS, NINF, dtype=np.int32)
        rS[0] = cfgj.left_end_bonus \
            if (cfgj.left_end_bonus and not job.start) else 0
        if WS > 1:
            chain = rS[0] + self.go \
                + np.arange(WS - 1, dtype=np.int64) * self.ge
            ok = chain >= cut0
            ok &= np.minimum.accumulate(ok)
            rE[1:] = np.where(ok, chain, NINF)
            rS[1:] = rE[1:]
        root = _lite_column(seed.nodes[0], -1, 0, job.seed_offset, 0, 0, 0,
                            rS, rE, rF)
        ext.table = [root]
        ext.prev_starts = set()
        ext.min_cell_score = 0

        # queue the root; roots merge into the active stack in one
        # concatenate at the next step() (per-admission concats would copy
        # the whole stack once per job)
        self._pending.append((j, int(seed.nodes[0]), job.seed_offset,
                              rS, rF, WS))
        return j

    def _ensure_acap(self, n, keep):
        """Grow the act buffers to hold n rows, preserving the first
        ``keep`` rows."""
        if n <= self._acap:
            return
        while self._acap < n:
            self._acap *= 2
        newS = np.empty((self._acap, self.W), dtype=np.int32)
        newF = np.empty((self._acap, self.W), dtype=np.int32)
        newS[:keep] = self._Sbuf[:keep]
        newF[:keep] = self._Fbuf[:keep]
        self._Sbuf = newS
        self._Fbuf = newF

    def _admit_pending(self):
        """Append queued roots to the active stack in place."""
        if not self._pending:
            return
        n = len(self._pending)
        n0 = len(self.act_jid)
        self._ensure_acap(n0 + n, n0)
        jid = np.empty(n, dtype=np.int64)
        node = np.empty(n, dtype=np.int64)
        off = np.empty(n, dtype=np.int64)
        for t, (j, nd, so, rS, rF, WS) in enumerate(self._pending):
            jid[t] = j
            node[t] = nd
            off[t] = so
            row = n0 + t
            self._Sbuf[row, :WS] = rS
            self._Sbuf[row, WS:] = NINF
            self._Fbuf[row, :WS] = rF
            self._Fbuf[row, WS:] = NINF
        z = np.zeros(n, dtype=np.int64)
        self.act_jid = np.concatenate([self.act_jid, jid])
        self.act_tidx = np.concatenate([self.act_tidx, z])
        self.act_prio = np.concatenate([self.act_prio, z])
        self.act_node = np.concatenate([self.act_node, node])
        self.act_offset = np.concatenate([self.act_offset, off])
        self.S_act = self._Sbuf[: n0 + n]
        self.F_act = self._Fbuf[: n0 + n]
        self._pending.clear()

    @property
    def active(self) -> bool:
        return len(self.act_jid) > 0 or bool(self._pending)

    def _conv_alloc(self, n):
        while self.conv_n + n > self.conv_cap:
            self.conv_cap *= 4
            newC = np.empty((self.conv_cap, self.CONV.shape[1]),
                            dtype=np.int32)
            newC[: self.conv_n] = self.CONV[: self.conv_n]
            self.CONV = newC
        rows = np.arange(self.conv_n, self.conv_n + n)
        self.conv_n += n
        return rows

    # ------------------------------------------------------------- one wave
    def step(self) -> List[int]:
        """Advance every active extension one wave; returns newly finished
        job slots."""
        self._admit_pending()
        if not len(self.act_jid):
            return []
        pre_jobs = np.unique(self.act_jid)
        self._wave()
        post = set(np.unique(self.act_jid).tolist())
        done = [int(j) for j in pre_jobs if int(j) not in post]
        for j in done:
            self.jobs[j].done = True
        return done

    def _wave(self):
        jobs = self.jobs
        graph = self.graph
        k = self.k
        go, ge = self.go, self.ge
        W = self.W
        jj, jj32 = self.jj, self.jj32
        act_jid, act_tidx = self.act_jid, self.act_tidx
        act_node, act_offset = self.act_node, self.act_offset
        S_act, F_act = self.S_act, self.F_act
        from .wave_extender import compute_wave

        # per-job best-first order: (-priority, table idx) within each job;
        # only the RANK is needed (children sort by their parent's rank)
        order = np.lexsort((act_tidx, -self.act_prio, act_jid))
        prank = np.empty(len(order), dtype=np.int64)
        prank[order] = np.arange(len(order))

        cutc = self.cutoff[act_jid]
        inr = S_act >= cutc[:, None]
        anyr = inr.any(axis=1)
        # node cap (wave_extender ref): applies per job per wave
        capped = (self.TL[act_jid].astype(np.float64)
                  / self.wsizev[act_jid]) >= self.max_nodes_cap[act_jid]
        if capped.any():
            anyr &= ~capped | (S_act.max(axis=1) >= self.best[act_jid])

        first = np.argmax(inr, axis=1)
        last = W - 1 - np.argmax(inr[:, ::-1], axis=1)
        band_lo = first
        band_hi = np.minimum(last + 1, self.wsizev[act_jid])
        hullM = (jj[None, :] >= np.maximum(first - 1, 0)[:, None]) \
            & (jj[None, :] <= (band_hi - 1)[:, None])
        hullF = (jj[None, :] >= first[:, None]) \
            & (jj[None, :] <= band_hi[:, None])

        # ---- enumerate children for every in-range column
        next_off = act_offset + 1
        seed_pos = next_off - self.seed_off0[act_jid]
        in_seed = anyr & (seed_pos >= 0) \
            & (seed_pos < self.seed_len[act_jid])
        cls_a = in_seed & (next_off < k)
        cls_b = in_seed & ~cls_a & self.ffs_v[act_jid]
        cls_c = anyr & ~cls_a & ~cls_b

        rows_c = np.flatnonzero(cls_c)

        # a/b children in act-row order (per-job enumeration order)
        ab_rows = np.flatnonzero(cls_a | cls_b)
        a_of = cls_a[ab_rows]
        node_i = np.maximum(next_off[ab_rows] - k + 1, 0)
        ab_nodes = np.where(a_of, self.seed_node0[act_jid[ab_rows]],
                            self.seed_nodes[act_jid[ab_rows], node_i])
        ab_chars = self.seed_seq[act_jid[ab_rows], seed_pos[ab_rows]]
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
        # [graph children in parent-rank, emission order]
        ch_rows = np.concatenate([ab_rows, c_rows])
        if len(ch_rows) == 0:
            self.act_jid = np.empty(0, dtype=np.int64)
            return
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
        prof = self.P[ch_jid, self.char_idx[ch_chars]]
        blo = band_lo[ch_rows]
        bhi = band_hi[ch_rows]
        ccut = self.cutoff[ch_jid]
        if self.backend == "device" and len(ch_rows) >= 64:
            from .batch import _compute_wave_device
            S, E, F = _compute_wave_device(SpM, SpF, Fp, prof, ch_score,
                                           ch_off > 1, blo, bhi, ccut,
                                           go, ge)
            S = S.astype(np.int32)
            E = E.astype(np.int32)
            F = F.astype(np.int32)
        else:
            S, E, F = compute_wave(SpM, SpF, Fp, prof, ch_score, ch_off > 1,
                                   blo, bhi, ccut, go, ge)
        # mask the pad region beyond each job's window width
        if self.WSv[ch_jid].min() < W:
            pad = jj[None, :] >= self.WSv[ch_jid][:, None]
            S = np.where(pad, NINF, S)
            E = np.where(pad, NINF, E)
            F = np.where(pad, NINF, F)
        else:
            pad = None

        # max pos closest to the diagonal
        diag = (ch_off - self.seed_off[ch_jid]).astype(np.int32)
        Smax = S.max(axis=1)
        dist = np.abs(jj32[None, :] - diag[:, None])
        if pad is not None:
            dist = np.where(pad, _POS, dist)
        mp = np.argmin(np.where(S == Smax[:, None], dist, _POS), axis=1)

        # per-job min cell score
        fin = np.where(S == NINF, _POS, S)
        np.minimum.at(self.mcs, ch_jid, fin.min(axis=1))

        # branch & bound (pre-wave best/cutoff)
        spos_c = ch_off - self.seed_off0[ch_jid]
        in_seed_c = (spos_c >= 0) & (spos_c < self.seed_len[ch_jid])
        ext_cut = (self.best[ch_jid] * self.rcut_v[ch_jid]
                   + self.pso_v[ch_jid])
        has_ext = in_seed_c \
            | ((S + self.pss[ch_jid]) >= ext_cut[:, None]).any(axis=1)
        keep = in_seed_c | ((Smax >= ccut) & has_ext)

        kept = np.flatnonzero(keep)
        if len(kept) == 0:
            self.act_jid = np.empty(0, dtype=np.int64)
            return

        kj = ch_jid[kept]
        # per-job cutoff/best update = max over kept children (post-wave)
        kmax = Smax[kept]
        np.maximum.at(self.best, kj, kmax)
        np.maximum.at(self.cutoff, kj, kmax - self.xdrop_v[kj])

        # ---- convergence filter, batched over kept children.  Columns of
        # empty windows (wsize == 0) skip the filter and go inactive;
        # dummy nodes (0) skip the store but return their raw max
        # (extender.py:131-133).
        scores_k = S[kept, 1:]                       # (Nk, W-1), pad NINF
        nodes_k = ch_nodes[kept]
        ret = np.full(len(kept), NINF, dtype=np.int32)
        nonempty = self.wsizev[kj] > 0

        zero_node = nonempty & (nodes_k == 0)
        if zero_node.any():
            ret[zero_node] = scores_k[zero_node].max(axis=1)

        # group kept children by (job, node); duplicates within one wave
        # are processed in order via repeated vector passes (rare)
        nz = np.flatnonzero(nonempty & (nodes_k != 0))
        if len(nz):
            CONV = self.CONV
            remaining = nz
            rem_keys = kj[nz] * (1 << 44) + nodes_k[nz]
            while len(remaining):
                _, first_idx = np.unique(rem_keys, return_index=True)
                sel = remaining[first_idx]
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
                    newrows = self._conv_alloc(len(newi))
                    CONV = self.CONV
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
                    improved = sc > seg * self.rcut_v[kj[sel[oldi]]][:, None]
                    upd = np.where(improved, np.maximum(seg, sc), seg)
                    CONV[orow] = upd
                    chg = np.where(improved, upd, NINF).max(axis=1)
                    ret[sel[oldi]] = np.where(improved.any(axis=1), chg,
                                              NINF)
                mask = np.ones(len(remaining), dtype=bool)
                mask[first_idx] = False
                remaining = remaining[mask]
                rem_keys = rem_keys[mask]

        # ---- backtrack candidate collection (extender.py:445-478
        # check_and_add, vectorized over the wave's kept columns; tip-gated
        # candidates are resolved against job.tips at finalize)
        kws = self.wsizev[kj]                  # last_pos per kept column
        cond0 = ch_off[kept] >= self.sdist_v[kj]
        if cond0.any():
            # table index each kept column will get in the append loop below
            grp_first = np.searchsorted(kj, kj, side="left")
            tidx_all = self.TL[kj] + np.arange(len(kj)) - grp_first
            rows_par = ch_rows[kept]
            mpk = mp[kept]
            diagk = diag[kept].astype(np.int64)
            sc_mp = prof[kept, mpk].astype(np.int64)
            p_mp = S_act[rows_par, np.maximum(mpk - 1, 0)]
            s_lp = S[kept, kws]
            p_lp = S_act[rows_par, np.maximum(kws - 1, 0)]
            sc_lp = prof[kept, kws].astype(np.int64)
            winc_mp = self.winb[kj, np.maximum(mpk - 1, 0)]
            winc_lp = self.winb[kj, np.maximum(kws - 1, 0)]
            scorek = ch_score[kept].astype(np.int64)
            ck = ch_chars[kept]
            s_sp = kmax.astype(np.int64)
            mscj = self.msc_v[kj]
            rebj = self.reb_v[kj]

            bonus1 = np.where(mpk == kws, rebj, 0)
            valid1 = cond0 & (mpk >= 1) & (kmax != NINF) & (p_mp != NINF) \
                & (s_sp + bonus1 >= mscj)
            is_m1 = valid1 \
                & (s_sp == p_mp.astype(np.int64) + scorek + sc_mp) \
                & (winc_mp == ck)
            take1 = valid1 & (is_m1 | (mpk == kws))
            tip1 = valid1 & ~is_m1 & (mpk != kws)

            valid2 = cond0 & (mpk != kws) & (kws >= 1) & (s_lp != NINF) \
                & (p_lp != NINF) & (s_lp.astype(np.int64) + rebj >= mscj)
            # start_pos == last_pos accepts unconditionally once valid

            m1 = np.flatnonzero(take1 | tip1)
            m2 = np.flatnonzero(valid2)
            if len(m1) or len(m2):
                e_jid = np.concatenate([kj[m1], kj[m2]])
                e_tidx = np.concatenate([tidx_all[m1], tidx_all[m2]])
                e_score = np.concatenate([(s_sp + bonus1)[m1],
                                          (s_lp.astype(np.int64) + rebj)[m2]])
                e_offd = np.concatenate([np.abs(mpk - diagk)[m1],
                                         np.abs(kws - diagk)[m2]])
                e_pos = np.concatenate([mpk[m1], kws[m2]])
                e_tip = np.concatenate([tip1[m1],
                                        np.zeros(len(m2), dtype=bool)])
                sidx = np.argsort(e_jid, kind="stable")
                e_jid = e_jid[sidx]
                uj, bounds = np.unique(e_jid, return_index=True)
                bounds = np.concatenate([bounds, [len(e_jid)]])
                e_tidx = e_tidx[sidx]
                e_score = e_score[sidx]
                e_offd = e_offd[sidx]
                e_pos = e_pos[sidx]
                e_tip = e_tip[sidx]
                for t in range(len(uj)):
                    a, b = bounds[t], bounds[t + 1]
                    jobs[int(uj[t])].cand.append(
                        (e_tidx[a:b], e_score[a:b], e_offd[a:b],
                         e_pos[a:b], e_tip[a:b]))

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
        np.add.at(self.TL, kj, 1)

        # rebuild the active stack from surviving children, in place in the
        # capacity buffers (one gather; no whole-stack copies)
        nr = np.array(new_rows, dtype=np.int64)
        n1 = len(nr)
        if n1 == 0:
            self.act_jid = np.empty(0, dtype=np.int64)
            self.S_act = self._Sbuf[:0]
            self.F_act = self._Fbuf[:0]
            return
        self._ensure_acap(n1, 0)
        np.take(S, nr, axis=0, out=self._Sbuf[:n1])
        np.take(F, nr, axis=0, out=self._Fbuf[:n1])
        self.act_jid = np.array(new_jid, dtype=np.int64)
        self.act_tidx = np.array(new_tidx, dtype=np.int64)
        self.act_prio = np.array(new_prio, dtype=np.int64)
        self.act_node = ch_nodes[nr]
        self.act_offset = ch_off[nr]
        self.S_act = self._Sbuf[:n1]
        self.F_act = self._Fbuf[:n1]

    # ------------------------------------------------------------- finalize
    def finalize(self, j: int) -> List[Alignment]:
        """Backtrack a finished job slot; returns its extensions."""
        job = self.jobs[j]
        ext = job.ext
        ext.min_cell_score = int(self.mcs[j])
        # persist the convergence filter for check_seed across seeds: one
        # fancy-index gather per job, then per-node views into the block
        startj = job.start
        WSj = job.WS
        if job.conv_rows:
            items = list(job.conv_rows.items())
            block = self.CONV[np.fromiter(
                (r for _, r in items), dtype=np.int64,
                count=len(items)), : WSj - 1]
            cc = ext.conv_checker
            for t, (node, _row) in enumerate(items):
                cc[node] = (startj, block[t])
        if ext.config.no_backtrack:
            return [job.seed]
        # resolve tip-gated candidates and order exactly like the
        # reference's indices.sort(reverse=True) on
        # (score, -off_diag, -idx, pos)
        indices = []
        if job.cand:
            tidx = np.concatenate([c[0] for c in job.cand])
            score = np.concatenate([c[1] for c in job.cand])
            offd = np.concatenate([c[2] for c in job.cand])
            pos = np.concatenate([c[3] for c in job.cand])
            tipf = np.concatenate([c[4] for c in job.cand])
            if tipf.any():
                istip = np.isin(tidx, np.array(job.tips, dtype=np.int64))
                keep = ~tipf | istip
                tidx, score, offd, pos = (tidx[keep], score[keep],
                                          offd[keep], pos[keep])
            order = np.lexsort((-pos, tidx, offd, -score))
            indices = list(zip(score[order].tolist(),
                               (-offd[order]).tolist(),
                               (-tidx[order]).tolist(),
                               pos[order].tolist()))
        exts = ext._backtrack_consume(indices, job.min_path_score,
                                      job.window, startj, job.seed_offset)
        for e in exts:
            e.trim_offset()
        return exts


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
        groups.setdefault(_group_key(ext), []).append(i)
    for idxs in groups.values():
        ext0 = jobs[idxs[0]][0]
        W = max(len(jobs[i][0].query) - jobs[i][1].get_clipping() + 1
                for i in idxs)
        eng = FlatEngine(ext0.graph, ext0.config, ext0.profile_chars,
                         ext0.char_idx, W, backend)
        slots = {}
        for i in idxs:
            slots[eng.add_job(*jobs[i])] = i
        pending = set(slots)
        while eng.active:
            for s in eng.step():
                results[slots[s]] = eng.finalize(s)
                pending.discard(s)
        for s in pending:       # jobs that never produced active columns
            results[slots[s]] = eng.finalize(s)
    return results
