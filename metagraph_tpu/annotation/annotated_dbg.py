"""AnnotatedDBG — the annotated graph join (ref src/graph/annotated_dbg.{hpp,cpp}).

Exact query semantics verified against the reference (SURVEY.md A.3,
annotated_dbg.cpp:235-560):

  * annotation row = node index - 1
  * counting is per k-mer *occurrence* (duplicate k-mers count multiply)
  * min_count = num_kmers+1 if num_present < max(1, ceil(presence_fraction *
    num_kmers)), else max(1, ceil(discovery_fraction * num_kmers))
  * LABELS: labels with count >= min_count, in label-code order
  * top labels: sorted by (count desc, code asc), truncated to num_top_labels
  * COUNTS / SIGNATURE / COORDS: per-position abundance / presence-bit /
    coordinate-tuple vectors of length num_kmers for the top labels
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

from .column import ColumnMajorAnnotation


def get_min_count(discovery_fraction: float, presence_fraction: float,
                  num_kmers: int, num_present: int) -> int:
    if num_present < max(1.0, math.ceil(presence_fraction * num_kmers)):
        return num_kmers + 1
    return int(max(1.0, math.ceil(discovery_fraction * num_kmers)))


def _top_n_sorted_keyed(items, n):
    """top-n by count desc, first-seen order on ties (VectorMap semantics)."""
    idx = {id(it): i for i, it in enumerate(items)}
    items.sort(key=lambda t: (-t[1], idx[id(t)]))
    if len(items) > n:
        del items[n:]


def _top_n_sorted(code_counts: List[Tuple[int, int]], n: int):
    code_counts.sort(key=lambda p: (-p[1], p[0]))
    del code_counts[n:]


class AnnotatedDBG:
    def __init__(self, graph, annotator: ColumnMajorAnnotation,
                 coord_to_header=None):
        self.graph = graph
        self.annotator = annotator
        # optional .seqs index: per-file columns split into per-sequence
        # results at query time (ref annotated_dbg.cpp:254,357,528,620)
        self.coord_to_header = coord_to_header

    # ---------------------------------------------------------- annotation
    def graph_to_anno_index(self, node: int | np.ndarray):
        """row = base node - 1; canonical wrappers fold rc ids to the base
        graph (ref annotated_dbg.hpp:50-56, canonical_dbg.hpp:38-41)."""
        if hasattr(self.graph, "get_base_node"):
            node = np.asarray(node)
            off = self.graph.offset
            node = np.where(node > off, node - off, node)
        return node - 1

    def annotate_sequence(self, sequence: bytes | str, labels: Sequence[str]):
        nodes = self.graph.map_to_nodes(sequence)
        rows = self.graph_to_anno_index(nodes[nodes > 0])
        if not len(rows):
            # no k-mers mapped: the label's column is not created
            # (ref ColumnCompressed lazy column creation)
            return
        self.annotator.add_labels(rows, labels)

    def annotate_kmer_counts(self, sequence: bytes | str, labels: Sequence[str],
                             abundance: int = 1):
        """Count k-mer multiplicities within the labeled source sequence,
        scaled by the sequence abundance (ref cli/annotate.cpp:122-137,
        Logan ka:f headers)."""
        nodes = self.graph.map_to_nodes(sequence)
        hit = nodes[nodes > 0]
        if not len(hit):
            # ref annotated_dbg.cpp:142: no indices -> no column is created
            return
        rows = self.graph_to_anno_index(hit)
        uniq, counts = np.unique(rows, return_counts=True)
        self.annotator.add_label_counts(uniq, counts * int(abundance), labels)

    def annotate_kmer_coords(self, sequence: bytes | str, labels: Sequence[str],
                             start_coord: int = 0):
        nodes = self.graph.map_to_nodes(sequence)
        pos = np.flatnonzero(nodes > 0)
        if not len(pos):
            return
        rows = self.graph_to_anno_index(nodes[pos])
        self.annotator.add_label_coords(rows, start_coord + pos, labels)
        self.annotator.add_labels(rows, labels)

    # -------------------------------------------------------------- lookup
    def _index_counts(self, sequence):
        """map sequence -> (num_kmers, present rows (with dups), positions).

        ``sequence`` may be raw bytes/str, or a precomputed node array (one
        node id per k-mer window, 0 = miss) from the batched query pipeline.
        """
        if isinstance(sequence, np.ndarray):
            nodes = sequence
        else:
            k = self.graph.k
            if isinstance(sequence, str):
                sequence = sequence.encode()
            if len(sequence) < k:
                return 0, np.zeros(0, np.int64), np.zeros(0, np.int64)
            nodes = self.graph.map_to_nodes(sequence)
        num_kmers = len(nodes)
        pos = np.flatnonzero(nodes > 0)
        rows = self.graph_to_anno_index(nodes[pos])
        return num_kmers, rows, pos

    def _row_multiset(self, rows):
        """[(row, multiplicity)] in first-seen order (VectorMap semantics)."""
        uniq, first, counts = np.unique(rows, return_index=True,
                                        return_counts=True)
        order = np.argsort(first, kind="stable")
        return list(zip(uniq[order].tolist(), counts[order].tolist()))

    def _cth_aggregate(self, sequence, num_top_labels, discovery_fraction,
                       presence_fraction, kind):
        """Split per-file columns into per-sequence results via the
        CoordToHeader index (ref annotated_dbg.cpp:620-695): each k-mer's
        coordinates map to (column, seq_id, local coord); counting,
        thresholds, and top-n run per sequence."""
        cth = self.coord_to_header
        num_kmers, rows, pos = self._index_counts(sequence)
        if num_kmers == 0:
            return []
        min_count = get_min_count(discovery_fraction, presence_fraction,
                                  num_kmers, len(rows))
        if len(rows) < min_count:
            return []
        tuples = self.annotator.get_row_tuples(rows)
        # per-row mapped coords: {(col, seq): [local...]}
        mapped = []
        order = []                       # first-seen header order
        match_counts = {}
        for row_t in tuples:
            here = {}
            for col, coords in row_t:
                for coord in coords:
                    seq_id, local = cth.map_single_coord(col, int(coord))
                    here.setdefault((col, seq_id), []).append(local)
            for h in here:
                if h not in match_counts:
                    match_counts[h] = 0
                    order.append(h)
                match_counts[h] += 1
            mapped.append(here)
        selected = [(h, match_counts[h]) for h in order
                    if match_counts[h] >= min_count]
        # ref: sorted only when the top-n cap actually filters
        if kind != "labels" and len(selected) > num_top_labels:
            _top_n_sorted_keyed(selected, num_top_labels)
        result = []
        for h, n in selected:
            col, seq_id = h
            header = cth.get_headers(col)[seq_id]
            if kind == "labels":
                result.append(header)
                continue
            if kind in ("matches", "counts-sum"):
                if kind == "counts-sum":
                    n = sum(len(m.get(h, ())) for m in mapped)
                result.append((header, n))
                continue
            if kind == "signature":
                bits = np.zeros(num_kmers, dtype=bool)
                for i, m in enumerate(mapped):
                    if h in m:
                        bits[pos[i]] = True
                result.append((header, n, bits))
            elif kind == "counts":
                ab = np.zeros(num_kmers, dtype=np.int64)
                for i, m in enumerate(mapped):
                    ab[pos[i]] = len(m.get(h, ()))
                result.append((header, n, ab))
            elif kind == "coords":
                coords = [[] for _ in range(num_kmers)]
                for i, m in enumerate(mapped):
                    if h in m:
                        coords[pos[i]] = sorted(m[h])
                result.append((header, n, coords))
        return result

    def get_labels(self, sequence, discovery_fraction: float = 0.7,
                   presence_fraction: float = 0.0) -> List[str]:
        if self.coord_to_header is not None:
            return self._cth_aggregate(sequence, 2 ** 63, discovery_fraction,
                                       presence_fraction, "labels")
        num_kmers, rows, _ = self._index_counts(sequence)
        if num_kmers == 0:
            return []
        min_count = get_min_count(discovery_fraction, presence_fraction,
                                  num_kmers, len(rows))
        if len(rows) < min_count:
            return []
        code_counts = self.annotator.sum_rows(self._row_multiset(rows), min_count)
        enc = self.annotator.encoder
        return [enc.decode(c) for c, _ in code_counts]

    def get_top_labels(self, sequence, num_top_labels: int = 2 ** 63,
                       discovery_fraction: float = 0.7,
                       presence_fraction: float = 0.0,
                       with_kmer_counts: bool = False
                       ) -> List[Tuple[str, int]]:
        if self.coord_to_header is not None:
            return self._cth_aggregate(
                sequence, num_top_labels, discovery_fraction,
                presence_fraction,
                "counts-sum" if with_kmer_counts else "matches")
        num_kmers, rows, _ = self._index_counts(sequence)
        if num_kmers == 0:
            return []
        min_count = get_min_count(discovery_fraction, presence_fraction,
                                  num_kmers, len(rows))
        if len(rows) < min_count:
            return []
        pairs = self._row_multiset(rows)
        if with_kmer_counts:
            code_counts = self._sum_row_values(pairs, min_count)
        else:
            code_counts = self.annotator.sum_rows(pairs, min_count)
        code_counts = list(code_counts)
        _top_n_sorted(code_counts, num_top_labels)
        enc = self.annotator.encoder
        return [(enc.decode(c), n) for c, n in code_counts]

    def _sum_row_values(self, pairs, min_count):
        """IntMatrix::sum_row_values: sum of values weighted by multiplicity,
        filtered by *presence* count >= min_count (ref int_matrix.cpp)."""
        rows = np.array([r for r, _ in pairs], dtype=np.int64)
        mult = np.array([m for _, m in pairs], dtype=np.int64)
        mask = self.annotator.get_rows_mask(rows)
        presence = mask.astype(np.int64).T @ mult
        vals = self.annotator.get_row_values(rows)
        sums = np.zeros(self.annotator.num_labels, dtype=np.int64)
        for i, row_vals in enumerate(vals):
            for c, v in row_vals:
                sums[c] += v * mult[i]
        return [(c, int(sums[c])) for c in range(self.annotator.num_labels)
                if presence[c] >= min_count]

    def _filter_and_aggregate(self, sequence, num_top_labels,
                              discovery_fraction, presence_fraction, kind):
        """Common path of COUNTS / SIGNATURE / COORDS
        (ref annotated_dbg.cpp:414-470 filter_and_aggregate)."""
        if self.coord_to_header is not None:
            return self._cth_aggregate(sequence, num_top_labels,
                                       discovery_fraction, presence_fraction,
                                       kind)
        num_kmers, rows, pos = self._index_counts(sequence)
        if num_kmers == 0:
            return []
        min_count = get_min_count(discovery_fraction, presence_fraction,
                                  num_kmers, len(rows))
        if len(rows) < min_count:
            return []
        mask = self.annotator.get_rows_mask(rows)        # (Q, L) presence
        counts = mask.sum(axis=0).astype(np.int64)       # per-occurrence count
        selected = [(c, int(counts[c])) for c in range(self.annotator.num_labels)
                    if counts[c] >= min_count]
        _top_n_sorted(selected, num_top_labels)
        if not selected:
            return []
        enc = self.annotator.encoder
        result = []
        if kind == "signature":
            for c, n in selected:
                bits = np.zeros(num_kmers, dtype=bool)
                bits[pos[mask[:, c]]] = True
                result.append((enc.decode(c), n, bits))
        elif kind == "counts":
            # one pass over rows, dispatching values into per-label slots
            # (instead of re-scanning every row per selected label)
            vals = self.annotator.get_row_values(rows)
            ab_by_c = {c: np.zeros(num_kmers, dtype=np.int64)
                       for c, _ in selected}
            for i, row_vals in enumerate(vals):
                p = pos[i]
                for cc, v in row_vals:
                    ab = ab_by_c.get(cc)
                    if ab is not None:
                        ab[p] = v
            for c, n in selected:
                result.append((enc.decode(c), n, ab_by_c[c]))
        elif kind == "coords":
            tups = self.annotator.get_row_tuples(rows)
            co_by_c = {c: [[] for _ in range(num_kmers)]
                       for c, _ in selected}
            for i, row_tups in enumerate(tups):
                p = pos[i]
                for cc, t in row_tups:
                    co = co_by_c.get(cc)
                    if co is not None:
                        co[p] = t
            for c, n in selected:
                result.append((enc.decode(c), n, co_by_c[c]))
        return result

    def get_top_label_signatures(self, sequence, num_top_labels=2 ** 63,
                                 discovery_fraction=0.7, presence_fraction=0.0):
        return self._filter_and_aggregate(sequence, num_top_labels,
                                          discovery_fraction, presence_fraction,
                                          "signature")

    def get_kmer_counts(self, sequence, num_top_labels=2 ** 63,
                        discovery_fraction=0.7, presence_fraction=0.0):
        return self._filter_and_aggregate(sequence, num_top_labels,
                                          discovery_fraction, presence_fraction,
                                          "counts")

    def get_kmer_coordinates(self, sequence, num_top_labels=2 ** 63,
                             discovery_fraction=0.7, presence_fraction=0.0):
        return self._filter_and_aggregate(sequence, num_top_labels,
                                          discovery_fraction, presence_fraction,
                                          "coords")
