"""Taxonomic classification (ref src/annotation/taxonomy/tax_classifier.{hpp,cpp}).

Builds the taxid tree from NCBI nodes.dmp, an Euler-tour linearization with a
sparse-table RMQ for O(1) LCA queries, and classifies reads by the deepest
taxid whose subtree covers at least lca_coverage_rate of the matched k-mers.
"""

from __future__ import annotations

import gzip
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class TaxonomyBase:
    def __init__(self, lca_coverage_rate: float = 0.0,
                 kmers_discovery_rate: float = 0.0):
        self.lca_coverage_rate = lca_coverage_rate
        self.kmers_discovery_rate = kmers_discovery_rate
        self.node_depth: Dict[int, int] = {}
        self.node_parent: Dict[int, int] = {}
        self.root_node: int = 0
        self.accversion_to_taxid: Dict[str, int] = {}

    # ------------------------------------------------------------- parsing
    @staticmethod
    def get_accession_version_from_label(label: str) -> str:
        """ref tax_classifier.cpp: GEN_BANK '>gi|..|ref|ACC|..' and
        TAXID '>kraken:taxid|NNN|ACC ..' label forms."""
        parts = label.lstrip(">").split("|")
        if parts and parts[0].startswith("kraken:taxid"):
            rest = parts[2] if len(parts) > 2 else ""
            return rest.split()[0] if rest else ""
        if "ref" in parts:
            return parts[parts.index("ref") + 1]
        if len(parts) >= 4:
            return parts[3]
        return label.split()[0].lstrip(">")

    @staticmethod
    def get_taxid_from_label(label: str) -> Optional[int]:
        parts = label.lstrip(">").split("|")
        if parts and parts[0].startswith("kraken:taxid") and len(parts) > 1:
            return int(parts[1])
        return None

    def read_accversion_to_taxid_map(self, filepath: str,
                                     restrict_labels=None):
        opener = gzip.open if filepath.endswith(".gz") else open
        keep = None
        if restrict_labels is not None:
            keep = {self.get_accession_version_from_label(l)
                    for l in restrict_labels}
        with opener(filepath, "rt") as f:
            header = f.readline()
            for line in f:
                parts = line.split()
                if len(parts) < 3:
                    continue
                accver, taxid = parts[1], int(parts[2])
                if keep is None or accver in keep:
                    self.accversion_to_taxid[accver] = taxid


class TaxonomyClsAnno(TaxonomyBase):
    def __init__(self, anno_graph=None, tax_tree_filepath: str = "",
                 lca_coverage_rate: float = 0.0,
                 kmers_discovery_rate: float = 0.0,
                 label_taxid_map_filepath: str = ""):
        super().__init__(lca_coverage_rate, kmers_discovery_rate)
        self.anno_graph = anno_graph
        self.rmq_data: List[List[int]] = []
        self.node_to_linearization_idx: Dict[int, int] = {}
        if tax_tree_filepath:
            tree = self.read_tree(tax_tree_filepath)
            lin: List[int] = []
            self.dfs_statistics(self.root_node, tree, lin)
            self.rmq_preprocessing(lin)
        if label_taxid_map_filepath:
            labels = (anno_graph.annotator.encoder.labels
                      if anno_graph is not None else None)
            self.read_accversion_to_taxid_map(label_taxid_map_filepath, labels)

    # ------------------------------------------------------------- building
    def read_tree(self, path: str) -> Dict[int, List[int]]:
        """nodes.dmp: 'taxid | parent | ...' (ref read_tree)."""
        parent: Dict[int, int] = {}
        with open(path) as f:
            for line in f:
                parts = [p.strip() for p in line.split("|")]
                if len(parts) < 2:
                    continue
                node, par = int(parts[0]), int(parts[1])
                parent[node] = par
        tree: Dict[int, List[int]] = {}
        root = None
        for node, par in parent.items():
            if node == par:
                root = node
                continue
            tree.setdefault(par, []).append(node)
        for k in tree:
            tree[k].sort()
        self.root_node = root if root is not None else 0
        self.node_parent = parent
        return tree

    def dfs_statistics(self, node: int, tree: Dict[int, List[int]],
                       linearization: List[int]):
        """Euler tour + depths (ref dfs_statistics; verified against
        tests/annotation/taxonomy/test_taxonomy.cpp vectors)."""
        self.node_to_linearization_idx[node] = len(linearization)
        linearization.append(node)
        depth = 0
        for child in tree.get(node, []):
            self.dfs_statistics(child, tree, linearization)
            linearization.append(node)
            depth = max(depth, self.node_depth[child])
        self.node_depth[node] = depth + 1
        self._linearization = linearization

    def rmq_preprocessing(self, linearization: Sequence[int]):
        """Sparse table of max-depth nodes over the Euler tour
        (ref rmq_preprocessing)."""
        n = len(linearization)
        self.rmq_data = [list(linearization)]
        span = 1
        while span * 2 <= n:
            prev = self.rmq_data[-1]
            row = list(prev)
            for i in range(n):
                j = i + span
                if j < n and self.node_depth[prev[j]] \
                        > self.node_depth[row[i]]:
                    row[i] = prev[j]
            self.rmq_data.append(row)
            span *= 2
        self._log_table = np.zeros(n + 1, dtype=np.int64)
        for i in range(2, n + 1):
            self._log_table[i] = self._log_table[i // 2] + 1

    # -------------------------------------------------------------- queries
    def find_lca(self, nodes: Sequence[int]) -> int:
        idxs = [self.node_to_linearization_idx[n] for n in nodes]
        lo, hi = min(idxs), max(idxs)
        span = hi - lo + 1
        lvl = int(self._log_table[span])
        a = self.rmq_data[lvl][lo]
        b = self.rmq_data[lvl][hi - (1 << lvl) + 1]
        return a if self.node_depth[a] >= self.node_depth[b] else b

    def taxid_for_label(self, label: str) -> Optional[int]:
        t = self.get_taxid_from_label(label)
        if t is not None:
            return t
        acc = self.get_accession_version_from_label(label)
        return self.accversion_to_taxid.get(acc)

    def assign_class(self, sequence: bytes) -> int:
        """Classify a read: deepest taxid covering >= lca_coverage_rate of
        the matched k-mers (ref TaxClassifier::assign_class)."""
        assert self.anno_graph is not None
        ag = self.anno_graph
        sigs = ag.get_top_label_signatures(sequence, 2 ** 63, 0.0, 0.0)
        if not sigs:
            return 0
        num_kmers = len(sigs[0][2])
        covered = np.zeros(num_kmers, dtype=bool)
        taxid_kmers: Dict[int, np.ndarray] = {}
        for label, count, bits in sigs:
            taxid = self.taxid_for_label(label)
            if taxid is None or taxid not in self.node_to_linearization_idx:
                continue
            bits = np.asarray(bits, dtype=bool)
            covered |= bits
            if taxid in taxid_kmers:
                taxid_kmers[taxid] |= bits
            else:
                taxid_kmers[taxid] = bits.copy()
        total = int(covered.sum())
        if not total or total < self.kmers_discovery_rate * num_kmers:
            return 0
        # accumulate per-node coverage up the tree
        cover: Dict[int, np.ndarray] = {}
        for taxid, bits in taxid_kmers.items():
            node = taxid
            seen = set()
            while node not in seen:
                seen.add(node)
                if node in cover:
                    cover[node] = cover[node] | bits
                else:
                    cover[node] = bits.copy()
                par = self.node_parent.get(node, node)
                if par == node:
                    break
                node = par
        # deepest node with enough coverage (node_depth counts from the
        # leaves — leaf = 1 — so deeper in the tree means SMALLER value)
        best, best_key = 0, None
        for node, bits in cover.items():
            if int(bits.sum()) >= self.lca_coverage_rate * total:
                # prefer nodes farthest from the root (smallest depth value)
                key = (self.node_depth.get(node, 1 << 30), node)
                if best_key is None or key < best_key:
                    best, best_key = node, key
        return best
