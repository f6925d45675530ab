"""Annotation-consistent alignment (ref aligner_labeled.{hpp,cpp},
annotation_buffer.{hpp,cpp}).

``AnnotationBuffer`` caches node -> label-set lookups (as python int
bitmasks) with batched annotation row fetches (ref annotation_buffer.hpp:19
fetch_queued_annotations).  ``LabeledExtender`` propagates the running label
intersection down the DP table and prunes branches whose intersection with
the seed's labels becomes empty (ref aligner_labeled.cpp:81-137 flush /
:160-210 call_outgoing) — extensions never cross label boundaries.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .alignment import Alignment
from .config import AlignerConfig
from .extender import DefaultColumnExtender


class AnnotationBuffer:
    def __init__(self, anno_graph):
        self.anno_graph = anno_graph
        self.annotator = anno_graph.annotator
        self._cache: Dict[int, int] = {}

    def get_labels_masks(self, nodes) -> List[int]:
        """Label bitmask per node (0 for npos/unannotated); batched fetch."""
        missing = [n for n in set(nodes) if n and n not in self._cache]
        if missing:
            arr = np.array(missing, dtype=np.int64)
            rows = self.anno_graph.graph_to_anno_index(arr)
            mask = self.annotator.get_rows_mask(rows)
            for n, row in zip(missing, np.asarray(mask)):
                bits = 0
                for c in np.flatnonzero(row):
                    bits |= 1 << int(c)
                self._cache[n] = bits
        return [self._cache.get(n, 0) if n else 0 for n in nodes]

    def get_labels_mask(self, node: int) -> int:
        return self.get_labels_masks([node])[0]

    def intersect_path(self, nodes) -> int:
        """Intersection of label sets along a path (npos nodes skipped)."""
        mask = -1
        for m, n in zip(self.get_labels_masks(list(nodes)), nodes):
            if n:
                mask &= m
                if not mask:
                    return 0
        return mask if mask != -1 else 0


def mask_to_columns(mask: int) -> List[int]:
    out = []
    c = 0
    while mask:
        if mask & 1:
            out.append(c)
        mask >>= 1
        c += 1
    return out


class LabeledExtender(DefaultColumnExtender):
    """DP-table extension with label-intersection pruning
    (ref aligner_labeled.hpp:14, LabeledExtender::call_outgoing)."""

    def __init__(self, graph, config: AlignerConfig, query: bytes,
                 buffer: AnnotationBuffer):
        super().__init__(graph, config, query)
        self.buffer = buffer
        self.seed_mask = 0
        self._masks = {}

    def get_extensions(self, seed: Alignment, min_path_score: int,
                       force_fixed_seed: bool) -> List[Alignment]:
        if seed.empty():
            return []
        self.seed_mask = self.buffer.intersect_path(seed.nodes)
        if not self.seed_mask:
            return []
        self._masks = {}
        exts = super().get_extensions(seed, min_path_score, force_fixed_seed)
        for a in exts:
            a.label_columns = mask_to_columns(
                self.buffer.intersect_path(a.nodes) or self.seed_mask)
        return exts

    def call_outgoing(self, table_i: int, force_fixed_seed: bool):
        out = super().call_outgoing(table_i, force_fixed_seed)
        if not out:
            return out
        col = self.table[table_i]
        pmask = getattr(col, "labels", None)
        if pmask is None:
            pmask = self.seed_mask
        masks = self.buffer.get_labels_masks([n for n, _, _ in out])
        filtered = []
        for (n, c, s), m in zip(out, masks):
            if not n:
                # dummy node: labels flow through (ref :102-103)
                self._masks[(table_i, n, c)] = pmask
                filtered.append((n, c, s))
                continue
            inter = pmask & m
            if inter:
                self._masks[(table_i, n, c)] = inter
                filtered.append((n, c, s))
        return filtered

    def _compute_column(self, parent_i, node, c, *args, **kwargs):
        col = super()._compute_column(parent_i, node, c, *args, **kwargs)
        col.labels = self._masks.get(
            (parent_i, node, c),
            getattr(self.table[parent_i], "labels", self.seed_mask))
        return col
