"""Seeders (ref src/graph/alignment/aligner_seeder_methods.{hpp,cpp}).

ExactSeeder: one seed per matching k-mer window.
MEMSeeder/UniMEMSeeder: maximal exact matches split at graph junctions.
The low-complexity (sdust) filter is applied per seed window.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .alignment import Alignment, seed_to_alignment
from .config import AlignerConfig


def num_exact_matching(query_nodes: np.ndarray, k: int) -> int:
    """#query chars covered by any matching k-mer (ref :49-65)."""
    num_matching = 0
    last_match_count = 0
    n = len(query_nodes)
    i = 0
    while i < n:
        if query_nodes[i]:
            j = i + 1
            while j < n and query_nodes[j]:
                j += 1
            num_matching += k + (j - i) - 1 - last_match_count
            last_match_count = k
            i = j
        else:
            if last_match_count:
                last_match_count -= 1
            i += 1
    return num_matching


def is_low_complexity(window: bytes, T: int = 20, W: int = 64) -> bool:
    """sdust-style low-complexity check (ref aligner_seeder_methods.cpp:3-35).

    Simplified triplet-score heuristic with the same thresholds: a window is
    low-complexity if the sdust score over 3-mers exceeds T.
    """
    if len(window) < 3:
        return False
    counts = {}
    score = 0
    for i in range(len(window) - 2):
        t = window[i:i + 3]
        c = counts.get(t, 0)
        score += c
        counts[t] = c + 1
    # sdust perfect score threshold scaled to window length
    return score * 10 > T * (len(window) - 2)


class Seeder:
    """Base: holds query, nodes, and match statistics."""

    def __init__(self, graph, query: bytes, orientation: bool,
                 nodes: np.ndarray, config: AlignerConfig):
        self.graph = graph
        self.query = query
        self.orientation = orientation
        self.nodes = nodes
        self.config = config
        self.num_matching = num_exact_matching(nodes, graph.k)

    def get_num_matches(self) -> int:
        return self.num_matching

    def get_seeds(self) -> List[tuple]:
        raise NotImplementedError

    def get_alignments(self) -> List[Alignment]:
        out = []
        for (start, length, nodes, offset) in self.get_seeds():
            out.append(seed_to_alignment(self.query, start, length, nodes,
                                         self.orientation, offset, self.config))
        return out


class ExactSeeder(Seeder):
    def get_seeds(self) -> List[tuple]:
        k = self.graph.k
        cfg = self.config
        if self.num_matching < cfg.min_exact_match * len(self.query):
            return []
        if cfg.max_seed_length < k:
            return []
        seeds = []
        for i in range(len(self.nodes)):
            if self.nodes[i]:
                window = self.query[i: i + k]
                if not cfg.seed_complexity_filter or not is_low_complexity(window):
                    seeds.append((i, k, [int(self.nodes[i])], 0))
        return seeds


class MEMSeeder(ExactSeeder):
    def is_terminus(self, node: int) -> bool:
        raise NotImplementedError

    def get_seeds(self) -> List[tuple]:
        k = self.graph.k
        cfg = self.config
        if k >= cfg.max_seed_length:
            return ExactSeeder.get_seeds(self)
        if self.num_matching < cfg.min_exact_match * len(self.query):
            return []

        n = len(self.nodes)
        flags = np.zeros(n, dtype=np.uint8)
        for i in range(n):
            if self.nodes[i]:
                term = (i + 1 == n or not self.nodes[i + 1]
                        or self.is_terminus(int(self.nodes[i])))
                flags[i] = 2 | int(term)

        seeds = []
        i = 0
        while i < n:
            if not (flags[i] & 2):
                i += 1
                continue
            j = i
            while j < n and (flags[j] & 2) and not (flags[j] & 1):
                j += 1
            if j < n and (flags[j] & 2):
                j += 1
            mem_length = (j - i) + k - 1
            if mem_length >= cfg.min_seed_length:
                seeds.append((i, mem_length,
                              [int(x) for x in self.nodes[i:j]], 0))
            i = j
        return seeds


class UniMEMSeeder(MEMSeeder):
    def is_terminus(self, node: int) -> bool:
        return (self.graph.has_multiple_outgoing(node)
                or not self.graph.has_single_incoming(node))


class ManualSeeder:
    def __init__(self, alignments: List[Alignment], num_matching: int = 0):
        self.alignments = alignments
        self.num_matching = num_matching

    def get_alignments(self) -> List[Alignment]:
        return self.alignments

    def get_num_matches(self) -> int:
        return self.num_matching
