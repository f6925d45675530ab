"""ctypes front-end for the native flat alignment engine.

``NativeFlatEngine`` is interface-compatible with ``flat.FlatEngine``
(add_job / step / finalize / active) but runs the whole wave loop —
best-first pops, banded column DP, cutoff bookkeeping, convergence filter,
candidate collection — inside native/align_engine.cpp.  Python keeps the
two pieces that need the object graph: batched outgoing-edge enumeration
(any graph type) and backtracking (extender._backtrack_consume).  Outputs
are bit-identical to FlatEngine and to the sequential extender
(ref aligner_extender_methods.cpp:412-700).
"""

from __future__ import annotations

import ctypes
from typing import List

import numpy as np

from .alignment import Alignment
from .config import NINF
from .extender import Column
from .flat import _outgoing_batch

_i64 = ctypes.c_int64
_p = ctypes.c_void_p
_bound = set()


def _bind(lib):
    if id(lib) in _bound:
        return
    lib.aeng_create.restype = _p
    lib.aeng_create.argtypes = [_i64, _i64, _i64, _i64, _i64, _i64, _p]
    lib.aeng_destroy.restype = None
    lib.aeng_destroy.argtypes = [_p]
    lib.aeng_add_job.restype = _i64
    lib.aeng_add_job.argtypes = [
        _p, _i64, _i64, _i64, _i64, _i64, _i64, _i64, _i64,
        ctypes.c_double, _i64, ctypes.c_double, _i64, _i64, _i64, _i64,
        _p, _i64, _p, _i64, _p, _p, _p, _p, _p, _p, _i64, _i64]
    lib.aeng_nactive.restype = _i64
    lib.aeng_nactive.argtypes = [_p]
    lib.aeng_step_pop.restype = _i64
    lib.aeng_step_pop.argtypes = [_p, _p, _p, _p]
    lib.aeng_step_children.restype = None
    lib.aeng_step_children.argtypes = [_p, _p, _p, _p, _i64]
    lib.aeng_job_sizes.restype = None
    lib.aeng_job_sizes.argtypes = [_p, _i64, _p]
    lib.aeng_job_cols.restype = None
    lib.aeng_job_cols.argtypes = [_p, _i64, _p, _p, _p, _p, _p, _p, _p]
    lib.aeng_job_cands.restype = None
    lib.aeng_job_cands.argtypes = [_p, _i64, _p]
    lib.aeng_job_conv.restype = None
    lib.aeng_job_conv.argtypes = [_p, _i64, _p, _p]
    lib.aeng_job_tips.restype = None
    lib.aeng_job_tips.argtypes = [_p, _i64, _p]
    lib.aeng_store_ptrs.restype = None
    lib.aeng_store_ptrs.argtypes = [_p, _p]
    lib.aeng_release_job.restype = None
    lib.aeng_release_job.argtypes = [_p, _i64]
    _bound.add(id(lib))


class _JobRec:
    __slots__ = ("ext", "seed", "min_path_score", "start", "window",
                 "wsize", "WS", "seed_offset")


class _LazyTable:
    """Indexable view of a job's columns in the native store; Column
    objects materialize on first access (backtracking touches only the
    cells along accepted traces, a tiny fraction of the table)."""

    __slots__ = ("gS", "gE", "gF", "gcols", "nodes", "parents", "cs",
                 "offs", "mps", "scores", "WS", "_cache")

    def __init__(self, gS, gE, gF, gcols, nodes, parents, cs, offs, mps,
                 scores, WS):
        self.gS, self.gE, self.gF = gS, gE, gF
        self.gcols = gcols
        self.nodes, self.parents, self.cs = nodes, parents, cs
        self.offs, self.mps, self.scores = offs, mps, scores
        self.WS = WS
        self._cache = {}

    def __len__(self):
        return len(self.gcols)

    def __getitem__(self, i):
        col = self._cache.get(i)
        if col is None:
            g = self.gcols[i]
            WS = self.WS
            col = Column.__new__(Column)
            col.S = self.gS[g, :WS]
            col.E = self.gE[g, :WS]
            col.F = self.gF[g, :WS]
            col.node = int(self.nodes[i])
            col.parent = int(self.parents[i])
            col.c = int(self.cs[i])
            col.offset = int(self.offs[i])
            col.max_pos = int(self.mps[i])
            col.trim = 0
            col.score = int(self.scores[i])
            self._cache[i] = col
        return col


class NativeFlatEngine:
    """Drop-in FlatEngine whose wave loop runs in C++."""

    def __init__(self, graph, config, profile_chars, char_idx, W,
                 backend: str = "numpy"):
        from ..native import get_lib
        lib = get_lib()
        _bind(lib)
        self.lib = lib
        self.graph = graph
        self.k = graph.k
        self.go = config.gap_opening_penalty
        self.ge = config.gap_extension_penalty
        self.W = int(W)
        self.C = len(profile_chars)
        self.profile_chars = profile_chars
        self._ci = np.ascontiguousarray(char_idx, dtype=np.int64)
        self.h = lib.aeng_create(self.W, self.C, self.k, self.go, self.ge,
                                 int(NINF), self._ci.ctypes.data)
        self.jobs: List[_JobRec] = []

    def __del__(self):
        h = getattr(self, "h", None)
        if h:
            self.lib.aeng_destroy(h)
            self.h = None

    # ------------------------------------------------------------ admission
    def add_job(self, ext, seed, min_path_score, force_fixed_seed) -> int:
        assert ext.graph is self.graph
        W, C = self.W, self.C
        rec = _JobRec()
        rec.ext = ext
        rec.seed = seed
        rec.min_path_score = max(0, min_path_score)
        ext.seed = seed
        ext.clear_conv_checker()
        rec.start = seed.get_clipping()
        rec.window = ext.query[rec.start:]
        rec.wsize = len(rec.window)
        rec.WS = rec.wsize + 1
        assert rec.WS <= W, (rec.WS, W)
        rec.seed_offset = seed.offset - 1
        cfg = ext.config
        cut0 = max(-cfg.xdrop, NINF + 1)
        s = rec.start
        WS = rec.WS

        P = np.full((C, W), NINF, dtype=np.int32)
        for ci, c in enumerate(ext.profile_chars):
            P[ci, :WS] = ext.profile[c][s: s + WS]
        pss = np.zeros(W, dtype=np.int32)
        pss[:WS] = ext.partial_sums[s: s + WS]
        winb = np.zeros(W, dtype=np.uint8)
        winb[: rec.wsize] = np.frombuffer(rec.window, dtype=np.uint8)
        seed_nodes = np.ascontiguousarray(seed.nodes, dtype=np.int64)
        seed_seq = np.frombuffer(seed.sequence, dtype=np.uint8)

        # root column (extender.py:219-231 / flat.py add_job)
        rS = np.full(W, NINF, dtype=np.int32)
        rE = np.full(W, NINF, dtype=np.int32)
        rF = np.full(W, NINF, dtype=np.int32)
        rS[0] = cfg.left_end_bonus \
            if (cfg.left_end_bonus and not rec.start) else 0
        if WS > 1:
            chain = rS[0] + self.go \
                + np.arange(WS - 1, dtype=np.int64) * self.ge
            ok = chain >= cut0
            ok &= np.minimum.accumulate(ok)
            rE[1:WS] = np.where(ok, chain, NINF)
            rS[1:WS] = rE[1:WS]
        ext.prev_starts = set()
        ext.min_cell_score = 0

        j = self.lib.aeng_add_job(
            self.h, WS, rec.wsize, rec.seed_offset, seed.offset,
            len(seed.sequence), int(seed.nodes[0]),
            1 if force_fixed_seed else 0,
            int(ext.partial_sums[rec.start + rec.wsize]),
            float(cfg.max_nodes_per_seq_char), int(cfg.xdrop),
            float(cfg.rel_score_cutoff), int(cut0), rec.min_path_score,
            int(cfg.right_end_bonus),
            max(self.k, len(seed.sequence)) - 1,
            seed_nodes.ctypes.data, len(seed_nodes),
            seed_seq.ctypes.data, len(seed_seq),
            P.ctypes.data, pss.ctypes.data, winb.ctypes.data,
            rS.ctypes.data, rE.ctypes.data, rF.ctypes.data,
            int(seed.nodes[0]), int(rS[:WS].max()))
        assert j == len(self.jobs)
        self.jobs.append(rec)
        return j

    @property
    def active(self) -> bool:
        return self.lib.aeng_nactive(self.h) > 0

    # -------------------------------------------------------------- stepping
    def step(self) -> List[int]:
        lib = self.lib
        nact = lib.aeng_nactive(self.h)
        if not nact:
            return []
        done = np.empty(nact, dtype=np.int64)
        pend_nodes = np.empty(nact, dtype=np.int64)
        npend = _i64(0)
        ndone = lib.aeng_step_pop(self.h, done.ctypes.data,
                                  pend_nodes.ctypes.data,
                                  ctypes.byref(npend))
        npd = npend.value
        if npd:
            own, child, code = _outgoing_batch(self.graph, pend_nodes[:npd])
            order = np.argsort(own, kind="stable")
            own = np.ascontiguousarray(own[order], dtype=np.int64)
            child = np.ascontiguousarray(child[order], dtype=np.int64)
            code = np.ascontiguousarray(code[order], dtype=np.int64)
            lib.aeng_step_children(self.h, own.ctypes.data,
                                   child.ctypes.data, code.ctypes.data,
                                   len(own))
        return done[:ndone].tolist()

    # ------------------------------------------------------------- finalize
    def finalize(self, j: int) -> List[Alignment]:
        lib = self.lib
        rec = self.jobs[j]
        ext = rec.ext
        W, WS = self.W, rec.WS
        sizes = np.empty(7, dtype=np.int64)
        lib.aeng_job_sizes(self.h, j, sizes.ctypes.data)
        ncols, ncand, nconv, ntips, mcs, g_n, conv_n = sizes.tolist()
        ext.min_cell_score = int(mcs)
        ptrs = np.empty(4, dtype=np.int64)
        lib.aeng_store_ptrs(self.h, ptrs.ctypes.data)

        def _view(ptr, rows, width, dtype=np.int32):
            if rows == 0:
                return np.empty((0, width), dtype=dtype)
            buf = ctypes.cast(int(ptr),
                              ctypes.POINTER(ctypes.c_int32 * (rows * width)))
            return np.frombuffer(buf.contents, dtype=dtype).reshape(
                rows, width)

        # persist the convergence filter for check_seed across seeds
        if nconv:
            CONV = _view(ptrs[3], conv_n, max(W - 1, 1))
            cnodes = np.empty(nconv, dtype=np.int64)
            crows = np.empty(nconv, dtype=np.int64)
            lib.aeng_job_conv(self.h, j, cnodes.ctypes.data,
                              crows.ctypes.data)
            block = CONV[crows][:, : WS - 1]
            cc = ext.conv_checker
            startj = rec.start
            for t, node in enumerate(cnodes.tolist()):
                cc[node] = (startj, block[t])
        if ext.config.no_backtrack:
            lib.aeng_release_job(self.h, j)
            return [rec.seed]

        gS = _view(ptrs[0], g_n, W)
        gE = _view(ptrs[1], g_n, W)
        gF = _view(ptrs[2], g_n, W)
        gcols = np.empty(ncols, dtype=np.int64)
        nodes = np.empty(ncols, dtype=np.int64)
        parents = np.empty(ncols, dtype=np.int64)
        cs = np.empty(ncols, dtype=np.int64)
        offs = np.empty(ncols, dtype=np.int64)
        mps = np.empty(ncols, dtype=np.int64)
        scores = np.empty(ncols, dtype=np.int64)
        lib.aeng_job_cols(self.h, j, gcols.ctypes.data, nodes.ctypes.data,
                          parents.ctypes.data, cs.ctypes.data,
                          offs.ctypes.data, mps.ctypes.data,
                          scores.ctypes.data)
        ext.table = _LazyTable(gS, gE, gF, gcols, nodes, parents, cs,
                               offs, mps, scores, WS)

        indices = []
        if ncand:
            arr = np.empty((ncand, 5), dtype=np.int64)
            lib.aeng_job_cands(self.h, j, arr.ctypes.data)
            tidx, score, offd, pos, tipf = (arr[:, 0], arr[:, 1], arr[:, 2],
                                            arr[:, 3], arr[:, 4] != 0)
            if tipf.any():
                tips = np.empty(ntips, dtype=np.int64)
                if ntips:
                    lib.aeng_job_tips(self.h, j, tips.ctypes.data)
                istip = np.isin(tidx, tips)
                keep = ~tipf | istip
                tidx, score, offd, pos = (tidx[keep], score[keep],
                                          offd[keep], pos[keep])
            order = np.lexsort((-pos, tidx, offd, -score))
            indices = list(zip(score[order].tolist(),
                               (-offd[order]).tolist(),
                               (-tidx[order]).tolist(),
                               pos[order].tolist()))
        exts = ext._backtrack_consume(indices, rec.min_path_score,
                                      rec.window, rec.start,
                                      rec.seed_offset)
        for e in exts:
            e.trim_offset()
        ext.table = None
        lib.aeng_release_job(self.h, j)
        return exts
