"""The BOSS succinct de Bruijn graph — dense-array, batch-first implementation.

Ref: src/graph/representation/succinct/boss.{hpp,cpp} (navigation formulas
verified against boss.cpp:437-718 and recorded in SURVEY.md A.2).

The reference stores W in a wavelet tree and last/F with rank-select
dictionaries and navigates one edge at a time.  Here the table is a set of
dense arrays plus cumulative-count indexes, and *every* navigation primitive is
a vectorized batch operation over arrays of edge indices — the same access
pattern the TPU kernels use (gather + prefix-sum), so the numpy implementation
doubles as the executable specification of the device path
(metagraph_tpu/succinct/ops.py).

Indexing conventions (same as reference):
  * rows 0..num_edges; row 0 is the sentinel zero row; edge indices are 1-based
  * node index = rank of the node's last edge in `last`
  * W values in [0, 2*alph): c + alph marks a non-first incoming edge ("minus")
"""

from __future__ import annotations

import io
import os
from typing import Iterable, Tuple

import numpy as np

from ..kmer import packing
from .bitrank import BitRank, packed_eq
from .construct import BossArrays, build_boss_arrays


class BOSS:
    """Succinct de Bruijn graph over a sentinel-included alphabet."""

    def __init__(self, arrays: BossArrays):
        self.k = arrays.k                  # node length; edges are (k+1)-mers
        self.alph_size = arrays.alph_size
        self.W = np.asarray(arrays.W, dtype=np.uint8)
        self.last = np.asarray(arrays.last, dtype=np.uint8)
        self.F = np.asarray(arrays.F, dtype=np.int64)
        self.valid = np.asarray(arrays.valid, dtype=np.uint8)
        self.weights = arrays.weights
        # Representation state tag (ref boss.hpp:325 State SMALL/DYN/STAT/FAST).
        # In this batch-array engine the four states collapse to one in-memory
        # layout (dense arrays + bit-rank directories); the tag selects the
        # on-disk layout: 'fast' -> raw mmap-able .npy files, others ->
        # compressed npz.  'dynamic' is a tag only (edits go through the
        # sorted-table merge path, see DBGSuccinct.merge).
        self.state = "stat"
        # bits per stored count (weights saturate at 2^width - 1); persisted
        # so merge/extend keep the source width (ref NodeWeights int_vector)
        self.count_width = 8
        # suffix-range index (ref boss.hpp:288): empty until
        # index_suffix_ranges(L) precomputes the length-L prefix ranges
        self.suffix_L = 0
        self.suf_rl = self.suf_ru = self.suf_ok = None
        self._build_indexes()

    # ------------------------------------------------------------------ setup
    def _build_indexes(self):
        """Succinct rank/select directories: one BitRank per W symbol plane
        plus one for `last` — ~0.2 B/edge/plane instead of the round-1 full
        int64 cumulative tables (~100 B/edge); plays the reference's
        wavelet-tree + bit_vector role (boss.hpp:474-509)."""
        a = self.alph_size
        self._rk_last = packed_eq(self.last, 1)
        self._planes = [packed_eq(self.W, c) for c in range(2 * a)]
        # NF[c] = rank_last(F[c])  (ref boss.hpp:509)
        self.NF = self._rk_last.rank(self.F)
        self._num_valid = int(np.count_nonzero(self.valid))
        self._build_ptr_tables()

    def _build_ptr_tables(self):
        """ctypes pointer tables for the mixed-symbol native kernels
        (NOT picklable — dropped by __getstate__, rebuilt on unpickle)."""
        import ctypes as ct
        np_ = len(self._planes)
        self._pl_words = (ct.c_void_p * np_)(
            *[p.words.ctypes.data for p in self._planes])
        self._pl_sup = (ct.c_void_p * np_)(
            *[p._sup.ctypes.data for p in self._planes])
        self._pl_sub = (ct.c_void_p * np_)(
            *[p._sub.ctypes.data for p in self._planes])
        self._pl_nbits = np.array([p.n for p in self._planes], np.int64)
        self._pl_nw = np.array([p._nw for p in self._planes], np.int64)
        self._pl_nsup = np.array([len(p._sup) for p in self._planes],
                                 np.int64)
        self._pl_total = np.array([p.total for p in self._planes], np.int64)

    def __getstate__(self):
        state = self.__dict__.copy()
        for key in ("_pl_words", "_pl_sup", "_pl_sub"):
            state.pop(key, None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._build_ptr_tables()

    @property
    def num_valid(self) -> int:
        return self._num_valid

    # ------------------------------------------------------- basic primitives
    @property
    def num_edges(self) -> int:
        return len(self.W) - 1

    def num_nodes(self) -> int:
        return self._rk_last.total

    def rank_last(self, i):
        """#set bits in last[1..i] (ref boss.cpp:577-581)."""
        return self._rk_last.rank(i)

    def select_last(self, r):
        """position of the r-th set bit of last; select_last(0)=0 (ref :588-592)."""
        r = np.asarray(r, dtype=np.int64)
        return np.where(r > 0, self._rk_last.select(r), 0)

    def rank_W(self, i, c):
        """#occurrences of raw value c in W[1..i] (ref boss.cpp:437-441).

        Vectorized over mixed symbols by grouping queries per W plane."""
        i, c = np.broadcast_arrays(np.asarray(i, dtype=np.int64),
                                   np.asarray(c, dtype=np.int64))
        scalar = i.ndim == 0
        i = np.atleast_1d(i)
        c = np.atleast_1d(c)
        from .bitrank import _native
        lib = _native()
        if lib is not None and i.size > 4:
            import ctypes
            iq = np.ascontiguousarray(i.reshape(-1))
            cq = np.ascontiguousarray(c.reshape(-1), dtype=np.int32)
            out = np.empty(iq.shape, dtype=np.int64)
            lib.bitrank_rank_multi(
                self._pl_words, self._pl_sup, self._pl_sub,
                self._pl_nbits.ctypes.data, iq.ctypes.data,
                cq.ctypes.data, iq.size, out.ctypes.data)
            out = out.reshape(i.shape)
        else:
            out = np.zeros(i.shape, dtype=np.int64)
            for sym in np.unique(c):
                m = c == sym
                out[m] = self._planes[sym].rank(i[m])
        out = out - (c == 0).astype(np.int64)  # W[0] sentinel is value 0
        return out[0] if scalar else out

    def select_W(self, c, r):
        """position of the r-th occurrence of raw value c in W[1..] (1-based).

        For c == 0, rank 0 refers to the sentinel at position 0.
        """
        c, r = np.broadcast_arrays(np.asarray(c, dtype=np.int64),
                                   np.asarray(r, dtype=np.int64))
        scalar = c.ndim == 0
        c = np.atleast_1d(c)
        r = np.atleast_1d(r) + (c == 0)    # skip sentinel W[0]=0
        from .bitrank import _native
        lib = _native()
        if lib is not None and c.size > 4:
            import ctypes
            rq = np.ascontiguousarray(r.reshape(-1), dtype=np.int64)
            cq = np.ascontiguousarray(c.reshape(-1), dtype=np.int32)
            out = np.empty(rq.shape, dtype=np.int64)
            lib.bitrank_select_multi(
                self._pl_words, self._pl_sup, self._pl_sub,
                self._pl_nw.ctypes.data_as(ctypes.c_void_p),
                self._pl_nsup.ctypes.data_as(ctypes.c_void_p),
                self._pl_total.ctypes.data_as(ctypes.c_void_p),
                rq.ctypes.data_as(ctypes.c_void_p),
                cq.ctypes.data_as(ctypes.c_void_p), rq.size,
                out.ctypes.data_as(ctypes.c_void_p))
            out = out.reshape(c.shape)
            return out[0] if scalar else out
        out = np.zeros(c.shape, dtype=np.int64)
        for sym in np.unique(c):
            m = c == sym
            out[m] = self._planes[sym].select(r[m])
        return out[0] if scalar else out

    def _next_W(self, i: int, c: int) -> int:
        """succ_W: first position >= i with raw W value c, or 0 (ref :433)."""
        pos = self._planes[c].succ_scalar(i)
        return pos if pos >= 0 else 0

    def _prev_W(self, i: int, c: int) -> int:
        """pred_W: last position <= i with raw W value c, or 0 (ref :422)."""
        pos = self._planes[c].pred_scalar(i)
        return pos if pos >= 0 else 0

    def succ_last(self, i):
        """position of the first set bit of last in [i..] (node's last edge)."""
        i = np.asarray(i, dtype=np.int64)
        r = self._rk_last.rank(np.maximum(i, 1) - 1) + 1
        return self.select_last(r)

    def pred_last(self, i):
        i = np.asarray(i, dtype=np.int64)
        r = self._rk_last.rank(i)
        return self.select_last(r)

    # ----------------------------------------------------------- fwd and bwd
    def node_last_char(self, i):
        """last character of the source node of edge i (F scan; ref :674-686)."""
        i = np.asarray(i, dtype=np.int64)
        idx = np.searchsorted(self.F, i, side="left")  # first c with F[c] >= i
        return np.where(idx < self.alph_size, idx - 1, self.alph_size - 1)

    def fwd(self, i, c=None):
        """target node's last edge for edge(s) i (ref boss.cpp:640-672).

        If c is given it must equal W[i] % alph (used when streaming).
        """
        i = np.asarray(i, dtype=np.int64)
        w = self.W[i].astype(np.int64)
        cc = w % self.alph_size if c is None else np.asarray(c, dtype=np.int64)
        # rank of exact value cc in W[1..i]; for $ the sentinel adjustment
        # cancels the reference's inverse_select/-1 dance: rank = rank_W(i, 0)
        rank = self.rank_W(i, cc)
        target = self.NF[cc] + rank
        return self.select_last(target)

    # -------------------------------------------------- scalar fast paths
    # Pure-int variants of the hot navigation ops for the sequential
    # traversal loops (no numpy array wrapping; ~20x faster per call).
    def rank_W_scalar(self, i: int, c: int) -> int:
        return self._planes[c].rank_scalar(i) - (1 if c == 0 else 0)

    def select_W_scalar(self, c: int, r: int) -> int:
        r += 1 if c == 0 else 0
        return self._planes[c].select_scalar(r)

    def select_last_scalar(self, r: int) -> int:
        if r <= 0:
            return 0
        return self._rk_last.select_scalar(r)

    def rank_last_scalar(self, i: int) -> int:
        return self._rk_last.rank_scalar(i)

    def succ_last_scalar(self, i: int) -> int:
        return self.select_last_scalar(
            self._rk_last.rank_scalar(max(i, 1) - 1) + 1)

    def pred_last_scalar(self, i: int) -> int:
        return self.select_last_scalar(self._rk_last.rank_scalar(i))

    def fwd_scalar(self, i: int, c: int | None = None) -> int:
        if c is None:
            c = int(self.W[i]) % self.alph_size
        return self.select_last_scalar(
            int(self.NF[c]) + self.rank_W_scalar(i, c))

    def node_last_char_scalar(self, i: int) -> int:
        idx = int(np.searchsorted(self.F, i, side="left"))
        return idx - 1 if idx < self.alph_size else self.alph_size - 1

    def bwd_scalar(self, i: int) -> int:
        target = self._rk_last.rank_scalar(i - 1) + 1
        if target == 1:
            return 1
        c = self.node_last_char_scalar(i)
        return self.select_W_scalar(c, target - int(self.NF[c]))

    def pick_edge_scalar(self, edge: int, c: int) -> int:
        """edge labeled c out of the node ending at `edge`, or 0."""
        begin = self.pred_last_scalar(max(edge - 1, 0)) + 1
        lo = self.rank_W_scalar(max(begin - 1, 0), c)
        hi = self.rank_W_scalar(edge, c)
        if hi > lo:
            return self.select_W_scalar(c, lo + 1)
        lo = self.rank_W_scalar(max(begin - 1, 0), c + self.alph_size)
        hi = self.rank_W_scalar(edge, c + self.alph_size)
        if hi > lo:
            return self.select_W_scalar(c + self.alph_size, lo + 1)
        return 0

    def bwd(self, i):
        """last incoming edge of the source node of edge i (ref boss.cpp:623-637)."""
        i = np.asarray(i, dtype=np.int64)
        scalar = i.ndim == 0
        i = np.atleast_1d(i)
        target = self._rk_last.rank(i - 1) + 1
        c = self.node_last_char(i)
        res = self.select_W(c, target - self.NF[c])
        res = np.where(target == 1, 1, res)
        return res[0] if scalar else res

    # ------------------------------------------------------------ edge ranges
    def node_range(self, i):
        """[begin, end] edge range of the source node of edge(s) i (inclusive)."""
        i = np.asarray(i, dtype=np.int64)
        end = self.succ_last(i)
        begin = self.pred_last(np.maximum(i - 1, 0)) + 1
        return begin, end

    def pick_edge(self, edge, c):
        """edge with label c out of the node whose last edge is `edge`, or 0.

        (ref boss.cpp:710-722; vectorized via rank/select instead of scanning)
        """
        edge = np.asarray(edge, dtype=np.int64)
        c = np.asarray(c, dtype=np.int64)
        begin = self.pred_last(np.maximum(edge - 1, 0)) + 1
        res = np.zeros(edge.shape, dtype=np.int64)
        for cand_base in (0, self.alph_size):
            cand = c + cand_base
            lo = self.rank_W(np.maximum(begin - 1, 0), cand)
            hi = self.rank_W(edge, cand)
            found = hi > lo
            pos = self.select_W(cand, lo + 1)
            res = np.where(found & (res == 0), pos, res)
        return res

    # ------------------------------------------------------------ node lookup
    def tighten_range(self, rl, ru, s, alive):
        """One step of the range-tightening node search (ref boss.hpp:682-693)."""
        rk_rl = self.rank_W(np.maximum(rl - 1, 0), s) + 1
        rk_ru = self.rank_W(ru, s)
        ok = alive & (rk_rl <= rk_ru)
        nf = self.NF[s]
        new_rl = self.select_last(nf + rk_rl - 1) + 1
        new_ru = self.select_last(nf + rk_ru)
        rl = np.where(ok, new_rl, rl)
        ru = np.where(ok, new_ru, ru)
        return rl, ru, ok

    def initial_range(self, s):
        """F-based initial range for first node character s (ref boss.hpp:665-677)."""
        M = len(self.W)
        s = np.asarray(s, dtype=np.int64)
        rl = np.where(self.F[s] + 1 < M, self.F[s] + 1, M)
        F_ext = np.concatenate([self.F, [M - 1]])
        ru = F_ext[s + 1]
        return rl, ru

    def index_suffix_ranges(self, L: int):
        """Precompute node ranges for ALL (alph_size-1)^L sentinel-free
        length-L prefixes of the tightening order, cutting node lookups from
        k-1 to k-1-L tighten rounds (ref boss.hpp:288 index_suffix_ranges,
        get_initial_range boss.hpp:636-680; the reference calls these
        "suffixes" because BOSS searches co-lex).

        Construction is L rounds of vectorized cross-product tightening
        (total work = table size, no per-combo loop).  Combo id layout
        matches the reference exactly: id = sum_t (c_t - 1) * (A-1)^t
        (boss.hpp:654-657 — position 0 least significant)."""
        A = self.alph_size
        if L <= 0:
            self.suffix_L = 0
            self.suf_rl = self.suf_ru = self.suf_ok = None
            return
        assert L < self.k, (L, self.k)
        chars = np.arange(1, A, dtype=np.int64)
        rl, ru = self.initial_range(chars)
        alive = rl <= ru
        for _t in range(1, L):
            n = len(rl)
            # new char c_t becomes the NEXT more-significant digit:
            # id_new = (c_t - 1) * (A-1)^t + id_old
            rl = np.tile(rl, A - 1)
            ru = np.tile(ru, A - 1)
            al = np.tile(alive, A - 1)
            s = np.repeat(chars, n)
            rl, ru, alive = self.tighten_range(rl, ru, s, al)
        self.suffix_L = int(L)
        self.suf_rl = np.where(alive, rl, 1).astype(np.int64)
        self.suf_ru = np.where(alive, ru, 0).astype(np.int64)
        self.suf_ok = alive.astype(np.uint8)

    def _suffix_combo(self, codes2d: np.ndarray):
        """(Q, >=L) int codes -> (combo id, sentinel-free mask) for the
        suffix-range tables (id valid only where the mask holds)."""
        L, A = self.suffix_L, self.alph_size
        c = codes2d[:, :L].astype(np.int64)
        nosent = np.all((c >= 1) & (c < A), axis=1)
        cc = np.clip(c - 1, 0, A - 2)
        idx = np.zeros(len(c), dtype=np.int64)
        for t in range(L):
            idx += cc[:, t] * (A - 1) ** t
        return idx, nosent

    def index_batch(self, nodes: np.ndarray) -> np.ndarray:
        """Batched node lookup: (Q, k) node code matrices -> last-edge index or 0.

        Vectorized equivalent of BOSS::index (ref boss.hpp:696-718): the k-1
        tighten iterations run in lockstep over the whole batch — on device this
        is a lax.fori_loop of gathers.  With a suffix-range index, lookups
        start L levels deep (ref get_initial_range; sentinel-containing
        prefixes fall back to the F-based range, dead combos are npos)."""
        Q, k = nodes.shape
        assert k == self.k
        res = self._map_native(nodes, with_edge=False)
        if res is not None:
            return res
        alive = np.all(nodes < self.alph_size, axis=1)
        L = self.suffix_L
        if L and k > L:
            idx, nosent = self._suffix_combo(nodes)
            use = alive & nosent
            s0 = np.where(alive, nodes[:, 0].astype(np.int64), 0)
            frl, fru = self.initial_range(s0)
            rl = np.where(use, self.suf_rl[idx], frl)
            ru = np.where(use, self.suf_ru[idx], fru)
            off = np.where(use, L, 1)
            alive = alive & (rl <= ru)
            for pos in range(1, k):
                act = alive & (pos >= off)
                if not act.any():
                    continue          # every live row starts deeper (index)
                s = np.where(act, nodes[:, pos].astype(np.int64), 0)
                nrl, nru, ok = self.tighten_range(rl, ru, s, act)
                rl = np.where(act, nrl, rl)
                ru = np.where(act, nru, ru)
                alive = alive & (ok | ~act)
            return np.where(alive, ru, 0)
        s0 = np.where(alive, nodes[:, 0].astype(np.int64), 0)
        rl, ru = self.initial_range(s0)
        alive = alive & (rl <= ru)
        for pos in range(1, k):
            s = np.where(alive, nodes[:, pos].astype(np.int64), 0)
            rl, ru, alive = self.tighten_range(rl, ru, s, alive)
        return np.where(alive, ru, 0)

    def index_range_batch(self, codes: np.ndarray, starts: np.ndarray,
                          lens: np.ndarray):
        """Batched longest-prefix node-range match: for each i, match the
        longest prefix of ``codes[starts[i] : starts[i] + lens[i]]``
        (ref boss.hpp:720-764 index_range, run in lockstep over all query
        positions).  A window containing an invalid character rejects the
        whole position (matching index_range_host).  Returns
        (first, last, matched) arrays; (0, 0, 0) where nothing matched."""
        codes = np.asarray(codes, dtype=np.int64)
        starts = np.asarray(starts, dtype=np.int64)
        lens = np.asarray(lens, dtype=np.int64)
        n = len(starts)
        if not n:
            z = np.zeros(0, dtype=np.int64)
            return z, z, z
        # reject windows containing invalid codes
        bad = np.concatenate([[0], np.cumsum(codes >= self.alph_size)])
        ends = np.minimum(starts + lens, len(codes))
        valid0 = (lens > 0) & (bad[ends] - bad[starts] == 0)
        s0 = np.where(valid0, codes[np.minimum(starts, len(codes) - 1)], 0)
        rl, ru = self.initial_range(s0)
        alive = valid0 & (rl <= ru)
        matched = alive.astype(np.int64)
        off = np.ones(n, dtype=np.int64)
        L = self.suffix_L
        if L:
            # windows long enough, sentinel-free in the first L chars, with
            # a live precomputed combo start L levels deep (ref index_range
            # boss.hpp:738-755: an EMPTY indexed range restarts from
            # scratch, so shorter prefixes still match identically)
            gidx = np.minimum(starts[:, None]
                              + np.arange(L, dtype=np.int64)[None, :],
                              len(codes) - 1)
            idx, nosent = self._suffix_combo(codes[gidx])
            use = valid0 & (lens >= L) & nosent \
                & (self.suf_ok[idx].astype(bool))
            rl = np.where(use, self.suf_rl[idx], rl)
            ru = np.where(use, self.suf_ru[idx], ru)
            alive = np.where(use, True, alive)
            matched = np.where(use, L, matched)
            off = np.where(use, L, off)
        for t in range(1, int(lens.max())):
            act = alive & (t < lens) & (t >= off)
            if not (alive & (t < lens)).any():
                break
            if not act.any():
                continue              # every live row starts deeper (index)
            s = np.where(act, codes[np.minimum(starts + t, len(codes) - 1)], 0)
            nrl, nru, ok = self.tighten_range(rl, ru, s, act)
            rl = np.where(act, nrl, rl)
            ru = np.where(act, nru, ru)
            matched += ok.astype(np.int64)
            alive = alive & ~(act & ~ok)
        first = np.where(matched > 0, self.succ_last(rl), 0)
        last = np.where(matched > 0, ru, 0)
        return first, last, matched

    def index_range_host(self, encoded: np.ndarray):
        """Match a node-string prefix; returns (first, last, matched_len)
        (ref boss.hpp:720-764 index_range)."""
        encoded = np.asarray(encoded, dtype=np.int64)
        if len(encoded) == 0:
            return 1, 1, 0
        if (encoded >= self.alph_size).any():
            return 0, 0, 0
        rl, ru = self.initial_range(np.array([encoded[0]]))
        rl, ru = int(rl[0]), int(ru[0])
        if rl > ru:
            return 0, 0, 0
        matched = 1
        for pos in range(1, len(encoded)):
            rl_a, ru_a, ok = self.tighten_range(
                np.array([rl]), np.array([ru]),
                np.array([encoded[pos]]), np.array([True]))
            if not ok[0]:
                break
            rl, ru = int(rl_a[0]), int(ru_a[0])
            matched += 1
        return int(self.succ_last(np.array([rl]))[0]), ru, matched

    def call_incoming_to_target(self, edge: int, d: int):
        """All edges incoming to the target node of `edge`'s node
        (ref boss.cpp call_incoming_to_target): edge must be the first
        incoming edge (W == d)."""
        out = [edge]
        e = edge
        M = len(self.W)
        while True:
            nxt = self._next_W(e + 1, d + self.alph_size) if e + 1 < M else 0
            stop = self._next_W(e + 1, d) if e + 1 < M else 0
            if not nxt or (stop and stop < nxt):
                break
            out.append(nxt)
            e = nxt
        return out

    def _map_native(self, kmers: np.ndarray, with_edge: bool):
        """Native full-loop lookup (fastio.cpp boss_map_edges_batch)."""
        from .bitrank import _native
        lib = _native()
        if lib is None or len(kmers) == 0:
            return None
        import ctypes
        km = np.ascontiguousarray(kmers, dtype=np.uint8)
        out = np.empty(len(km), dtype=np.int64)
        rl = self._rk_last
        lib.boss_map_edges_batch(
            self._pl_words, self._pl_sup, self._pl_sub,
            self._pl_nbits.ctypes.data_as(ctypes.c_void_p),
            self._pl_nw.ctypes.data_as(ctypes.c_void_p),
            self._pl_nsup.ctypes.data_as(ctypes.c_void_p),
            self._pl_total.ctypes.data_as(ctypes.c_void_p),
            rl.words.ctypes.data_as(ctypes.c_void_p),
            rl._sup.ctypes.data_as(ctypes.c_void_p),
            rl._sub.ctypes.data_as(ctypes.c_void_p),
            rl.n, rl._nw, len(rl._sup), rl.total,
            self.F.ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(self.NF, dtype=np.int64)
            .ctypes.data_as(ctypes.c_void_p),
            self.alph_size,
            km.ctypes.data_as(ctypes.c_void_p), len(km), self.k,
            1 if with_edge else 0,
            out.ctypes.data_as(ctypes.c_void_p),
            self.suf_rl.ctypes.data_as(ctypes.c_void_p)
            if self.suffix_L else None,
            self.suf_ru.ctypes.data_as(ctypes.c_void_p)
            if self.suffix_L else None,
            self.suf_ok.ctypes.data_as(ctypes.c_void_p)
            if self.suffix_L else None,
            self.suffix_L)
        return out

    def map_to_edges_batch(self, kmers: np.ndarray) -> np.ndarray:
        """Batched edge lookup for (Q, k+1) edge strings (BOSS::map_to_edge)."""
        res = self._map_native(kmers, with_edge=True)
        if res is not None:
            return res
        node_edge = self.index_batch(kmers[:, :-1])
        label = kmers[:, -1].astype(np.int64)
        ok = (node_edge > 0) & (label < self.alph_size)
        res = np.zeros(len(kmers), dtype=np.int64)
        if ok.any():
            res[ok] = self.pick_edge(node_edge[ok], label[ok])
        return res

    def map_sequence(self, codes: np.ndarray) -> np.ndarray:
        """Map all (k+1)-windows of an encoded sequence to edges (0 = miss).

        Matches BOSS::map_to_edges (ref boss.cpp:996-1045) output per window;
        implemented as one batched lookup instead of the fwd/pick streaming.
        """
        K = self.k + 1
        n = len(codes)
        if n < K:
            return np.zeros(0, dtype=np.int64)
        windows = np.lib.stride_tricks.sliding_window_view(codes, K)
        bad = np.concatenate([[0], np.cumsum(codes >= self.alph_size)])
        invalid = (bad[K:] - bad[:-K]) > 0
        res = np.zeros(n - K + 1, dtype=np.int64)
        good = ~invalid
        if good.any():
            res[good] = self.map_to_edges_batch(windows[good])
        return res

    # -------------------------------------------------------- decoding edges
    def get_node_seq(self, i) -> np.ndarray:
        """source-node code strings for edge(s) i: (Q, k) (ref boss.cpp:758-800)."""
        i = np.atleast_1d(np.asarray(i, dtype=np.int64))
        Q = len(i)
        out = np.zeros((Q, self.k), dtype=np.uint8)
        cur = i.copy()
        for pos in range(self.k - 1, -1, -1):
            out[:, pos] = self.node_last_char(cur).astype(np.uint8)
            if pos:
                cur = self.bwd(cur)
        return out

    def get_edge_seq(self, i) -> np.ndarray:
        """(Q, k+1) full edge strings (node + label without minus flag)."""
        i = np.atleast_1d(np.asarray(i, dtype=np.int64))
        node = self.get_node_seq(i)
        lab = (self.W[i].astype(np.uint8) % self.alph_size)[:, None]
        return np.concatenate([node, lab], axis=1)

    # ---------------------------------------------------------- degree info
    def outdegree_nodes(self):
        """#valid (non-$) out-edges per node (indexed by node id 1..num_nodes)."""
        ends = np.flatnonzero(self.last).astype(np.int64)   # transient
        begins = np.concatenate([[0], ends[:-1]]) + 1
        nonsink = (self.W % self.alph_size) != 0
        cum = np.concatenate([[0], np.cumsum(nonsink, dtype=np.int64)])
        return cum[ends + 1] - cum[begins]

    # ------------------------------------------------------------- serialize
    def save(self, path: str, **extra):
        extra.setdefault("state", self.state)
        extra.setdefault("count_width", self.count_width)
        if self.suffix_L:
            # persist the suffix-range index (ref boss.cpp:399 serialize)
            extra.setdefault("suffix_L", self.suffix_L)
            extra.setdefault("suf_rl", self.suf_rl)
            extra.setdefault("suf_ru", self.suf_ru)
            extra.setdefault("suf_ok", self.suf_ok)
        np.savez_compressed(
            path, k=self.k, alph_size=self.alph_size, W=self.W, last=self.last,
            F=self.F, valid=self.valid,
            weights=self.weights if self.weights is not None else np.zeros(0),
            **extra)

    def save_mmap(self, path: str, **extra):
        """Write the mmap on-disk layout: one raw .npy per array next to a
        small .meta.npz — load(mmap=True) then maps W/last/valid/weights
        without reading them (the role of the reference's --mmap,
        src/cli/config/config.cpp:122)."""
        base = path[:-4] if path.endswith(".npz") else path
        for name in ("W", "last", "valid"):
            np.save(base + f".{name}.npy", getattr(self, name))
        if self.weights is not None:
            np.save(base + ".weights.npy", self.weights)
        extra.setdefault("state", self.state)
        extra.setdefault("count_width", self.count_width)
        if self.suffix_L:
            # the suffix-range index persists in this layout too (it once
            # silently dropped, making --index-ranges + --mmap a no-op)
            extra.setdefault("suffix_L", self.suffix_L)
            extra.setdefault("suf_rl", self.suf_rl)
            extra.setdefault("suf_ru", self.suf_ru)
            extra.setdefault("suf_ok", self.suf_ok)
        np.savez(base + ".meta.npz", k=self.k, alph_size=self.alph_size,
                 F=self.F, **extra)

    @classmethod
    def load(cls, path: str, mmap: bool = False) -> "BOSS":
        base = path[:-4] if path.endswith(".npz") else path
        if os.path.exists(base + ".meta.npz") and (
                mmap or not os.path.exists(base + ".npz")
                and not os.path.exists(path)):
            meta = np.load(base + ".meta.npz")
            mode = "r" if mmap else None
            wpath = base + ".weights.npy"
            arrays = BossArrays(
                k=int(meta["k"]), alph_size=int(meta["alph_size"]),
                W=np.load(base + ".W.npy", mmap_mode=mode),
                last=np.load(base + ".last.npy", mmap_mode=mode),
                F=meta["F"],
                valid=np.load(base + ".valid.npy", mmap_mode=mode),
                weights=np.load(wpath, mmap_mode=mode)
                if os.path.exists(wpath) else None)
            boss = cls(arrays)
            boss.state = str(meta["state"]) if "state" in meta else "fast"
            if "count_width" in meta:
                boss.count_width = int(meta["count_width"])
            if "suffix_L" in meta and int(meta["suffix_L"]):
                boss.suffix_L = int(meta["suffix_L"])
                boss.suf_rl = meta["suf_rl"].astype(np.int64)
                boss.suf_ru = meta["suf_ru"].astype(np.int64)
                boss.suf_ok = meta["suf_ok"].astype(np.uint8)
            return boss
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        w = z["weights"]
        arrays = BossArrays(
            k=int(z["k"]), alph_size=int(z["alph_size"]), W=z["W"], last=z["last"],
            F=z["F"], valid=z["valid"], weights=w if len(w) else None)
        boss = cls(arrays)
        if "state" in z.files:
            boss.state = str(z["state"])
        if "count_width" in z.files:
            boss.count_width = int(z["count_width"])
        if "suffix_L" in z.files and int(z["suffix_L"]):
            boss.suffix_L = int(z["suffix_L"])
            boss.suf_rl = z["suf_rl"].astype(np.int64)
            boss.suf_ru = z["suf_ru"].astype(np.int64)
            boss.suf_ok = z["suf_ok"].astype(np.uint8)
        return boss
