"""DBGSuccinct — the de Bruijn graph facade over the BOSS table.

Ref: src/graph/representation/succinct/dbg_succinct.{hpp,cpp}.
Node index == BOSS edge index (npos = 0); `valid` masks out dummy edges, and
num_nodes counts valid edges only (ref dbg_succinct.cpp:680-684).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..kmer.alphabets import DNA, Alphabet
from ..kmer.extractor import KmerExtractor
from ..succinct.boss import BOSS
from ..succinct.construct import build_boss_arrays

BASIC = "basic"
CANONICAL = "canonical"
PRIMARY = "primary"

# process-wide default for memory-mapped graph loading (CLI --mmap)
DEFAULT_MMAP = False


class DBGSuccinct:
    def __init__(self, boss: BOSS, k: int, mode: str = BASIC,
                 alphabet: Alphabet = DNA, mask_dummy: bool = True):
        self.boss = boss
        self.k = k                      # dbg k (= boss.k + 1)
        self.mode = mode
        self.alphabet = alphabet
        self.extractor = KmerExtractor(alphabet)
        self.masked = mask_dummy

    # ---------------------------------------------------------------- build
    @classmethod
    def build(cls, sequences: Sequence[bytes | str], k: int, mode: str = BASIC,
              alphabet: Alphabet = DNA, with_counts: bool = False,
              bits_per_count: int = 8, mask_dummy: bool = True,
              window_weights=None, disk_swap: str | None = None,
              mem_cap_bytes: int | None = None,
              device: bool = False) -> "DBGSuccinct":
        """Build from raw sequences (ref cli/build.cpp:53 pipeline).

        ``window_weights``: per-sequence per-window k-mer counts (from extended
        FASTA sidecars) used instead of occurrence counting.
        ``disk_swap``: spill directory for the bounded-RAM external-memory
        k-mer sort (the reference's --disk-swap, sorted_set_disk_base.hpp:34);
        ``mem_cap_bytes`` bounds the in-RAM k-mer buffer.
        """
        ex = KmerExtractor(alphabet)
        collector_mode = {"basic": "basic", "canonical": "both",
                          "primary": "basic"}[mode]
        if device and mode == "basic" and not with_counts \
                and window_weights is None and disk_swap is None \
                and mem_cap_bytes is None and alphabet.sigma == 5:
            # full TPU-side construction (device_build.py r5): window
            # extraction, BOSS sort, dedupe, dummy discovery and emission
            # all on device; ~2.25 bits/bp up, ~1 byte/edge down.  Arrays
            # bit-identical to the host pipeline (measured 5-14x faster on
            # the 591,997-node anchor).  Falls back silently when the
            # native packer is missing or k > 21.
            from ..succinct.device_build import device_build_boss_arrays
            seqs_b = [s if isinstance(s, bytes) else s.encode()
                      for s in sequences]
            arrays = device_build_boss_arrays(seqs_b, k,
                                              alph_size=alphabet.sigma)
            if arrays is not None:
                boss = BOSS(arrays)
                boss.count_width = bits_per_count
                return cls(boss, k, mode, alphabet, mask_dummy)
        if disk_swap is not None or mem_cap_bytes is not None:
            kmers, counts = ex.extract_disk(
                sequences, k, mode=collector_mode, with_counts=with_counts,
                window_weights=window_weights,
                ram_cap_bytes=mem_cap_bytes or (1 << 28),
                tmp_dir=disk_swap or None)
        else:
            kmers, counts = ex.extract(sequences, k, mode=collector_mode,
                                       with_counts=with_counts,
                                       window_weights=window_weights)
        arrays = build_boss_arrays(kmers, alph_size=alphabet.sigma,
                                   counts=counts if with_counts else None,
                                   bits_per_count=bits_per_count)
        boss = BOSS(arrays)
        boss.count_width = bits_per_count
        return cls(boss, k, mode, alphabet, mask_dummy)

    @classmethod
    def merge(cls, graphs: Sequence["DBGSuccinct"]) -> "DBGSuccinct":
        """Sorted-table merge (ref succinct/boss_merge.cpp merge()): the
        inputs' valid-edge strings are already in BOSS order, so the union
        is a linear multiway merge + one BOSS emission — no contig
        re-extraction and no global re-sort of all input k-mers."""
        from ..succinct.construct import (build_boss_arrays,
                                          merge_sorted_edge_sets)
        g0 = graphs[0]
        for g in graphs[1:]:
            if g.k != g0.k or g.mode != g0.mode \
                    or g.alphabet is not g0.alphabet:
                raise ValueError("merge requires equal k/mode/alphabet")
        sets, wsets, have_w = [], [], True
        for g in graphs:
            ve = np.flatnonzero(g.boss.valid).astype(np.int64)
            sets.append(g.boss.get_edge_seq(ve))
            if g.boss.weights is None:
                have_w = False
            else:
                wsets.append(np.asarray(g.boss.weights)[ve])
        from ..kmer import packing
        merged, counts = merge_sorted_edge_sets(
            sets, wsets if have_w and len(wsets) == len(sets) else None,
            bits=packing.bits_for_alphabet(g0.alphabet.sigma))
        # keep the widest source count width so merged weights don't
        # saturate below the inputs' storage bound
        width = max(getattr(g.boss, "count_width", 8) for g in graphs)
        arrays = build_boss_arrays(merged, alph_size=g0.alphabet.sigma,
                                   counts=counts, bits_per_count=width)
        boss = BOSS(arrays)
        boss.count_width = width
        return cls(boss, g0.k, g0.mode, g0.alphabet, g0.masked)

    # ---------------------------------------------------------------- stats
    def num_nodes(self) -> int:
        if self.masked:
            return self.boss.num_valid
        return self.boss.num_edges

    def max_index(self) -> int:
        return self.boss.num_edges

    # ------------------------------------------------------------- mapping
    def map_to_nodes_sequentially(self, sequence: bytes | str) -> np.ndarray:
        """Node per k-mer window, no canonicalization (ref sequence_graph.hpp:49)."""
        codes = self.extractor.encode(sequence)
        edges = self.boss.map_sequence(codes)
        if self.masked:
            edges = np.where(self.boss.valid[edges] > 0, edges, 0)
        return edges

    def map_to_nodes_sequentially_batch(self, sequences) -> list:
        """map_to_nodes_sequentially over many sequences with ONE native
        lookup: sequences are joined with a sentinel code (>= alph_size), so
        windows crossing a boundary are invalid and drop out exactly like
        per-sequence misses (ref sequence_graph.hpp:49, batched)."""
        ex = self.extractor
        K = self.boss.k + 1
        parts = [ex.encode(s) for s in sequences]
        if not parts:
            return []
        sent = np.array([self.boss.alph_size], dtype=parts[0].dtype)
        glue = []
        offs = []
        off = 0
        for i, p in enumerate(parts):
            if i:
                glue.append(sent)
                off += 1
            offs.append(off)
            glue.append(p)
            off += len(p)
        res = self.boss.map_sequence(np.concatenate(glue))
        if self.masked:
            res = np.where(self.boss.valid[res] > 0, res, 0)
        out = []
        for p, o in zip(parts, offs):
            n = len(p) - K + 1
            out.append(res[o: o + n] if n > 0
                       else np.zeros(0, dtype=np.int64))
        return out

    def map_to_nodes(self, sequence: bytes | str) -> np.ndarray:
        if self.mode == CANONICAL:
            # map the canonical form of every k-mer (ref sequence_graph.hpp:49,
            # canonical = min of fwd/rc in packed order)
            from ..kmer import packing
            from ..kmer.extractor import _rows_greater
            ex = self.extractor
            codes = ex.encode(sequence)
            k = self.k
            if len(codes) < k:
                return np.zeros(0, dtype=np.int64)
            wins = np.lib.stride_tricks.sliding_window_view(codes, k)
            comp = ex.extended_complement_table()
            rc = comp[codes[::-1]]
            rcw = np.lib.stride_tricks.sliding_window_view(rc, k)[::-1]
            order = packing.boss_priority_order(k)
            bits = packing.bits_for_alphabet(self.alphabet.sigma)
            kf = packing.pack_codes(wins, order, bits=bits)
            kr = packing.pack_codes(rcw, order, bits=bits)
            take_rc = _rows_greater(kf, kr)
            canon = np.where(take_rc[:, None], rcw, wins)
            return self.map_kmers_batch(np.ascontiguousarray(canon))
        return self.map_to_nodes_sequentially(sequence)

    # ----------------------------------------------------------- traversal
    _host_index = None

    def _build_host_index(self):
        from ..kmer import packing
        if self._host_index is None:
            boss = self.boss
            valid_edges = np.flatnonzero(boss.valid).astype(np.int64)
            kchars = boss.get_edge_seq(valid_edges)
            order = packing.boss_priority_order(self.k)
            bits = packing.bits_for_alphabet(self.alphabet.sigma)
            self._host_index = (packing.pack_codes(kchars, order, bits=bits),
                                valid_edges, kchars)
        return self._host_index

    def map_kmers_batch(self, chars: np.ndarray) -> np.ndarray:
        """(N, k) code matrices -> node ids via a cached sorted-key index
        (much faster than the BOSS walk for small batches)."""
        from ..kmer import packing
        keys, ids, _ = self._build_host_index()
        if not len(keys):
            return np.zeros(len(chars), dtype=np.int64)
        invalid = (chars >= self.alphabet.sigma).any(axis=1) \
            | (chars == 0).any(axis=1)
        q = packing.pack_codes(
            np.where(invalid[:, None], 1, chars),
            packing.boss_priority_order(self.k),
            bits=packing.bits_for_alphabet(self.alphabet.sigma))
        pos = packing.searchsorted_rows(keys, q)
        pos_c = np.minimum(pos, len(keys) - 1)
        hit = (pos < len(keys)) & np.all(keys[pos_c] == q, axis=1) & ~invalid
        return np.where(hit, ids[pos_c], 0)

    def _valid_node(self, e: int) -> int:
        if e and (not self.masked or self.boss.valid[e]):
            return e
        return 0

    def call_outgoing_kmers(self, node: int):
        """[(next_node, char)] (ref dbg_succinct.cpp:110-140, ascending)."""
        boss = self.boss
        w = int(boss.W[node])
        if node > 1 and not w:
            return []
        last = boss.fwd_scalar(node, w % boss.alph_size)
        first = boss.pred_last_scalar(last - 1) + 1
        out = []
        table = self.alphabet.decode_table
        for i in range(max(2, first), last + 1):
            if self._valid_node(i):
                c = int(boss.W[i]) % boss.alph_size
                out.append((i, chr(table[c])))
        return out

    def _succ_table(self):
        """Per-edge successor ranges, built once with batched BOSS ops.

        The successors of edge e are the contiguous BOSS edge range
        [first, last] of the target node, so the whole adjacency is two
        int64 arrays (8 B/edge) and traversal becomes a pure gather — the
        total-coverage analog of the reference's NodeFirstCache
        (graph_extensions/node_first_cache.hpp:17).  Built lazily on the
        first batch traversal (alignment, unitig extraction drive this).
        """
        tbl = getattr(self, "_succ_ranges", None)
        if tbl is not None:
            return tbl
        boss = self.boss
        e = np.arange(len(boss.W), dtype=np.int64)
        w = boss.W.astype(np.int64)
        has_out = (e <= 1) | (w != 0)
        safe = np.where(has_out, e, 1)
        last = boss.fwd(safe, w % boss.alph_size)
        first = np.maximum(boss.pred_last(np.maximum(last - 1, 0)) + 1, 2)
        ok = has_out & (last >= first)
        first = np.where(ok, first, 1)
        last = np.where(ok, last, 0)
        self._succ_ranges = (first, last)
        return self._succ_ranges

    def call_outgoing_batch(self, nodes: np.ndarray):
        """Vectorized call_outgoing_kmers over an edge-index array.

        Returns (owner, child, char_code): flat parallel arrays where
        owner[i] indexes into ``nodes``, child[i] is the successor edge and
        char_code[i] its ASCII last character — the same (node, char) pairs
        call_outgoing_kmers yields per node, in the same ascending order
        (ref dbg_succinct.cpp:110-140, batched).
        """
        boss = self.boss
        nodes = np.asarray(nodes, dtype=np.int64)
        sf, sl = self._succ_table()
        first = sf[nodes]
        last = sl[nodes]
        cnt = np.maximum(last - first + 1, 0)
        owner = np.repeat(np.arange(len(nodes)), cnt)
        offs = np.concatenate([[0], np.cumsum(cnt)])
        child = first[owner] + (np.arange(len(owner)) - offs[owner])
        ch = boss.W[child].astype(np.int64) % boss.alph_size
        keep = ch != 0                      # skip $ edges
        if self.masked:
            keep &= boss.valid[child] > 0
        owner, child, ch = owner[keep], child[keep], ch[keep]
        char_code = self.alphabet.decode_table[ch].astype(np.int64)
        if self.alphabet.name != "DNA_CASE":
            # fold to uppercase ASCII (case carries information only in the
            # case-sensitive alphabet)
            lower = (char_code >= 97) & (char_code <= 122)
            char_code = np.where(lower, char_code - 32, char_code)
        return owner, child, char_code

    def call_incoming_kmers(self, node: int):
        """[(prev_node, char)] (ref dbg_succinct.cpp:141-164)."""
        boss = self.boss
        x = boss.bwd_scalar(node)
        d = boss.node_last_char_scalar(node)
        out = []
        table = self.alphabet.decode_table
        e = x
        M = len(boss.W)
        while e:
            if self._valid_node(e):
                # first char of the source node of e = bwd^(k-2) last char
                ee = e
                for _ in range(self.k - 2):
                    ee = boss.bwd_scalar(ee)
                c = boss.node_last_char_scalar(ee)
                out.append((e, chr(table[c])))
            nxt = boss._next_W(e + 1, d + boss.alph_size) if e + 1 < M else 0
            stop = boss._next_W(e + 1, d) if e + 1 < M else 0
            if not nxt or (stop and stop < nxt):
                break
            e = nxt
        return out

    def traverse(self, node: int, c: str) -> int:
        boss = self.boss
        code = int(self.extractor.encode(c)[0])
        if code >= boss.alph_size:
            return 0
        w = int(boss.W[node])
        if node > 1 and not w:
            return 0
        last = boss.fwd_scalar(node, w % boss.alph_size)
        e = boss.pick_edge_scalar(last, code)
        return self._valid_node(e)

    def has_multiple_outgoing_batch(self, nodes: np.ndarray) -> np.ndarray:
        """Vectorized has_multiple_outgoing (ref dbg_succinct.cpp:609-625)."""
        boss = self.boss
        nodes = np.asarray(nodes, dtype=np.int64)
        d = boss.W[nodes].astype(np.int64) % boss.alph_size
        last = boss.fwd(nodes, d)
        mult = (last - boss.pred_last(np.maximum(last - 1, 0))) > 1
        mult = np.where(d == 0, False, mult)
        if (nodes == 1).any():
            mult = np.where(nodes == 1,
                            int(boss.succ_last(np.array([1]))[0]) > 2, mult)
        return mult

    def has_single_incoming_batch(self, nodes: np.ndarray) -> np.ndarray:
        """Vectorized has_single_incoming (ref dbg_succinct.cpp:658-677):
        counts W==w+alph edges between bwd(node) and the next W==w edge via
        the rank/select directories instead of a scalar walk."""
        boss = self.boss
        nodes = np.asarray(nodes, dtype=np.int64)
        M = len(boss.W)
        x = boss.bwd(nodes)
        w = boss.node_last_char(nodes)
        first_valid = (boss.valid[x] > 0) if self.masked \
            else np.ones(len(nodes), dtype=bool)
        rk = boss.rank_W(x, w)
        total_w = boss.rank_W(np.full(len(nodes), M - 1, dtype=np.int64), w)
        n1 = boss.select_W(w, rk + 1)
        hi = np.where(total_w > rk, n1 - 1, M - 1)
        walph = w + boss.alph_size
        cnt = boss.rank_W(hi, walph) - boss.rank_W(x, walph)
        single = np.where(first_valid, cnt == 0, cnt == 1)
        single = np.where(x + 1 >= M, first_valid, single)
        return np.where(nodes == 1, False, single)

    def has_multiple_outgoing(self, node: int) -> bool:
        """ref dbg_succinct.cpp:609-625."""
        boss = self.boss
        if node == 1:
            return boss.succ_last_scalar(1) > 2
        d = int(boss.W[node]) % boss.alph_size
        if not d:
            return False
        last = boss.fwd_scalar(node, d)
        first = boss.pred_last_scalar(last - 1) + 1
        return last - first + 1 > 1

    def has_single_incoming(self, node: int) -> bool:
        """ref dbg_succinct.cpp:658-677."""
        from . import traversal as _t
        boss = self.boss
        if node == 1:
            return False
        x = boss.bwd_scalar(node)
        w = boss.node_last_char_scalar(node)
        first_valid = (not self.masked) or bool(boss.valid[x])
        if x + 1 == len(boss.W):
            return first_valid
        if first_valid:
            return _t._is_single_incoming(boss, x, w)
        # count incoming
        cnt = 0
        e = x
        M = len(boss.W)
        while True:
            cnt += 1
            nxt = boss._next_W(e + 1, w + boss.alph_size) if e + 1 < M else 0
            stop = boss._next_W(e + 1, w) if e + 1 < M else 0
            if not nxt or (stop and stop < nxt):
                break
            e = nxt
        return cnt == 2

    def call_nodes_with_suffix_matching_longest_prefix(
            self, s: bytes, min_match_length: int,
            max_num_allowed_matches: int = 2 ** 63):
        """Nodes whose k-mer suffix matches the longest prefix of `s`
        (ref dbg_succinct.cpp:308-380).  Returns (nodes, match_length)."""
        boss = self.boss
        if not max_num_allowed_matches or len(s) < min_match_length:
            return [], 0
        encoded = self.extractor.encode(s)
        if (encoded >= boss.alph_size).any():
            return [], 0
        first, last, match_size = boss.index_range_host(
            encoded[: min(self.k - 1, len(encoded))])
        if len(s) == self.k and match_size + 1 == self.k:
            edge = int(boss.pick_edge(np.array([last]),
                                      np.array([int(encoded[-1])]))[0])
            if edge and self._valid_node(edge):
                return [edge], self.k
        if match_size < min_match_length or not first:
            return [], 0
        nodes = self.nodes_in_suffix_range(first, last,
                                           max_num_allowed_matches)
        return nodes, (match_size if nodes else 0)

    def nodes_in_suffix_range(self, first: int, last: int,
                              max_num_allowed_matches: int = 2 ** 63):
        """Enumerate valid edges incoming to each node in the BOSS range
        [first, last] (ref dbg_succinct.cpp:344-378); [] on overflow.

        Vectorized: one batched select/bwd per range plus one batched
        rank/select sweep over the minus-flagged incoming groups (the
        reference walks each group edge by edge)."""
        boss = self.boss
        rf = int(boss.rank_last(np.array([first]))[0])
        rl = int(boss.rank_last(np.array([last]))[0])
        if rl < rf:
            return []
        if not self.masked and rl - rf + 1 > max_num_allowed_matches:
            # every group contributes >= 1 node, so the cap is already blown
            return []
        if rl - rf + 1 > max(4 * max_num_allowed_matches, 1 << 14):
            # masked graphs: enumerate a prefix big enough that the valid
            # count must exceed the cap unless most candidates are dummies —
            # then fall through to the full sweep only if it didn't
            head = self._nodes_in_rank_range(
                rf, rf + max(4 * max_num_allowed_matches, 1 << 14) - 1)
            if len(head) > max_num_allowed_matches:
                return []
        return self._nodes_in_rank_range(rf, rl, max_num_allowed_matches)

    def nodes_in_suffix_ranges_batch(self, firsts, lasts,
                                     max_num_allowed_matches: int = 2 ** 63):
        """nodes_in_suffix_range over many [first, last] ranges at once;
        returns a list of per-range node lists ([] on overflow).  All ranges
        share one batched select/bwd/rank sweep (the per-range path pays
        ~15 small native calls each; this pays them once for the batch)."""
        firsts = np.asarray(firsts, dtype=np.int64)
        lasts = np.asarray(lasts, dtype=np.int64)
        L = len(firsts)
        results: list = [[] for _ in range(L)]
        if L == 0:
            return results
        boss = self.boss
        rf = boss.rank_last(firsts)
        rl = boss.rank_last(lasts)
        group_counts = rl - rf + 1
        if self.masked:
            # masked graphs can't pre-cap on group count (groups may be all
            # dummies); enumerate fully unless the range is huge, in which
            # case the per-range prefix heuristic bounds the work
            big = max(4 * max_num_allowed_matches, 1 << 14)
            huge = group_counts > big
            for i in np.flatnonzero(huge):
                results[int(i)] = self.nodes_in_suffix_range(
                    int(firsts[i]), int(lasts[i]), max_num_allowed_matches)
            en = (group_counts > 0) & ~huge
        else:
            # every group contributes >= 1 node, so ranges past the cap are
            # already overflowed
            en = (group_counts > 0) \
                & (group_counts <= max_num_allowed_matches)
        idx = np.flatnonzero(en)
        if len(idx) == 0:
            return results
        cnts = group_counts[idx]
        total_groups = int(cnts.sum())
        owner_grp = np.repeat(np.arange(len(idx)), cnts)
        rs = np.repeat(rf[idx], cnts) + (
            np.arange(total_groups, dtype=np.int64)
            - np.repeat(np.cumsum(cnts) - cnts, cnts))
        e = boss.select_last(rs)
        x = boss.bwd(e)                       # first incoming edge (W == d)
        d = boss.node_last_char(e)
        M = len(boss.W)
        rk_d = boss.rank_W(x, d)
        tot_d = boss.rank_W(np.full(len(x), M - 1, dtype=np.int64), d)
        stop = np.where(tot_d > rk_d, boss.select_W(d, rk_d + 1), M)
        hi = stop - 1
        dm = d + boss.alph_size
        base = boss.rank_W(x, dm)
        cnt = boss.rank_W(hi, dm) - base
        gs = cnt + 1                          # per-group emission count
        total = int(gs.sum())
        offs = np.concatenate([[0], np.cumsum(gs)])
        out = np.empty(total, dtype=np.int64)
        out[offs[:-1]] = x
        if total > len(x):
            minus_owner = np.repeat(np.arange(len(x)), cnt)
            ranks = base[minus_owner] + (np.arange(len(minus_owner))
                                         - np.repeat(np.cumsum(cnt) - cnt,
                                                     cnt)) + 1
            minus = boss.select_W(dm[minus_owner], ranks)
            mask = np.ones(total, dtype=bool)
            mask[offs[:-1]] = False
            out[mask] = minus
        # split per range: element counts = sum of gs over each range's groups
        range_sizes = np.zeros(len(idx), dtype=np.int64)
        np.add.at(range_sizes, owner_grp, gs)
        if self.masked:
            rid = np.repeat(np.arange(len(idx)), range_sizes)
            vmask = boss.valid[out] > 0
            out = out[vmask]
            rid = rid[vmask]
            range_sizes = np.zeros(len(idx), dtype=np.int64)
            np.add.at(range_sizes, rid, 1)
        bounds = np.concatenate([[0], np.cumsum(range_sizes)])
        for t, i in enumerate(idx):
            seg = out[bounds[t]: bounds[t + 1]]
            if len(seg) <= max_num_allowed_matches:
                results[int(i)] = seg.tolist()
        return results

    def _nodes_in_rank_range(self, rf: int, rl: int,
                             max_num_allowed_matches: int = 2 ** 63):
        boss = self.boss
        rs = np.arange(rf, rl + 1, dtype=np.int64)
        e = boss.select_last(rs)
        x = boss.bwd(e)                       # first incoming edge (W == d)
        d = boss.node_last_char(e)
        M = len(boss.W)
        # end of each incoming group: the next W == d edge after x (exclusive)
        rk_d = boss.rank_W(x, d)
        tot_d = boss.rank_W(np.full(len(x), M - 1, dtype=np.int64), d)
        stop = np.where(tot_d > rk_d, boss.select_W(d, rk_d + 1), M)
        hi = stop - 1
        # minus-flagged members (W == d + alph) inside (x, hi]
        dm = d + boss.alph_size
        base = boss.rank_W(x, dm)
        cnt = boss.rank_W(hi, dm) - base
        total = len(x) + int(cnt.sum())
        # emit in reference order: per group ascending — x, then its
        # minus-flagged edges (select_W is monotone in the rank)
        offs = np.concatenate([[0], np.cumsum(cnt + 1)])
        out = np.empty(total, dtype=np.int64)
        out[offs[:-1]] = x
        if total > len(x):
            owner = np.repeat(np.arange(len(x)), cnt)
            ranks = base[owner] + (np.arange(len(owner))
                                   - np.repeat(np.cumsum(cnt) - cnt, cnt)) + 1
            minus = boss.select_W(dm[owner], ranks)
            mask = np.ones(total, dtype=bool)
            mask[offs[:-1]] = False
            out[mask] = minus
        if self.masked:
            out = out[boss.valid[out] > 0]
        if len(out) > max_num_allowed_matches:
            return []
        return out.tolist()

    def get_node_sequence(self, node: int) -> bytes:
        if self._host_index is not None:
            _, ids, kchars = self._host_index
            pos = int(np.searchsorted(ids, node))
            if pos < len(ids) and ids[pos] == node:
                return self.alphabet.decode_table[kchars[pos]].tobytes()
        chars = self.boss.get_edge_seq(np.array([node]))[0]
        return self.alphabet.decode_table[chars].tobytes()

    # ------------------------------------------------------------ sequences
    def get_node_kmers(self, nodes: np.ndarray) -> list[str]:
        chars = self.boss.get_edge_seq(np.asarray(nodes, dtype=np.int64))
        table = self.alphabet.decode_table
        return [table[row].tobytes().decode() for row in chars]

    # ------------------------------------------------------------- storage
    def save(self, path: str, mmap_layout: bool = False):
        out = path if path.endswith(".npz") else path + ".dbg.npz"
        if mmap_layout:
            self.boss.save_mmap(out, mode=self.mode, masked=self.masked,
                                alphabet=self.alphabet.name)
        else:
            self.boss.save(out, mode=self.mode, masked=self.masked,
                           alphabet=self.alphabet.name)

    @classmethod
    def load(cls, path: str, mode: str | None = None,
             mmap: bool | None = None) -> "DBGSuccinct":
        import os
        if mmap is None:
            mmap = DEFAULT_MMAP
        if path.endswith(".dbg") and os.path.exists(path):
            with open(path, "rb") as f:
                if f.read(2) != b"PK":       # not an npz: reference format
                    from ..seq_io.refformat import load_reference_boss
                    return load_reference_boss(path)
        base = path[:-4] if path.endswith(".npz") else path
        if os.path.exists(base + ".meta.npz") and (
                mmap or not os.path.exists(base + ".npz")):
            boss = BOSS.load(path, mmap=mmap)
            meta = np.load(base + ".meta.npz")
            m = str(meta["mode"]) if "mode" in meta else BASIC
            msk = bool(meta["masked"]) if "masked" in meta else True
            return cls(boss, boss.k + 1, mode or m,
                       alphabet=_alphabet_of(meta, boss), mask_dummy=msk)
        # non-succinct representations carry a graph_type tag
        probe = np.load(path if path.endswith(".npz") else path + ".npz")
        if "graph_type" in probe and str(probe["graph_type"]) != "succinct":
            from .hash_graph import _KmerGraphBase
            return _KmerGraphBase.load_generic(probe)
        boss = BOSS.load(path)
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        if mode is None:
            mode = str(z["mode"]) if "mode" in z else BASIC
        msk = bool(z["masked"]) if "masked" in z.files else True
        return cls(boss, boss.k + 1, mode,
                   alphabet=_alphabet_of(z, boss), mask_dummy=msk)


def _alphabet_of(meta, boss) -> Alphabet:
    """Alphabet recorded in the artifact; legacy artifacts resolve by sigma."""
    from ..kmer.alphabets import ALPHABETS
    files = getattr(meta, "files", meta)
    if "alphabet" in files:
        return ALPHABETS[str(meta["alphabet"])]
    for a in ALPHABETS.values():
        if a.sigma == boss.alph_size:
            return a
    return DNA


def _revcomp_bytes(seq: bytes) -> bytes:
    table = bytes.maketrans(b"ACGTacgtUu", b"TGCATGCAAA")
    return seq.translate(table)[::-1]
