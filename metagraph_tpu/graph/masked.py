"""Masked de Bruijn graph + differential assembly
(ref src/graph/representation/masked_graph.hpp:14,
 src/graph/annotated_graph_algorithm.cpp — semantics mirrored from
 mask_nodes_by_label's three rounds)."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Sequence, Set, Tuple

import numpy as np

from . import traversal


@dataclass
class DifferentialAssemblyConfig:
    """ref annotated_graph_algorithm.hpp:31-39 + assemble.cpp:44-62 parsing."""

    label_mask_in_unitig_fraction: float = 0.0
    label_mask_in_kmer_fraction: float = 1.0
    label_mask_out_unitig_fraction: float = 1.0
    label_mask_out_kmer_fraction: float = 0.0
    label_mask_other_unitig_fraction: float = 1.0
    add_complement: bool = False

    @classmethod
    def from_experiment(cls, experiment: dict, graph) -> "DifferentialAssemblyConfig":
        return cls(
            add_complement=(graph.mode == "canonical"),
            label_mask_in_kmer_fraction=experiment.get("in_min_fraction", 1.0),
            label_mask_in_unitig_fraction=experiment.get("unitig_in_min_fraction", 0.0),
            label_mask_out_kmer_fraction=experiment.get("out_max_fraction", 0.0),
            label_mask_out_unitig_fraction=experiment.get("unitig_out_max_fraction", 1.0),
            label_mask_other_unitig_fraction=experiment.get("unitig_other_max_fraction", 1.0),
        )


class MaskedDeBruijnGraph:
    """A subgraph view selected by a node (BOSS edge) mask."""

    def __init__(self, graph, mask: np.ndarray):
        self.graph = graph
        self.boss = graph.boss
        self.k = graph.k
        self.mode = graph.mode
        mask = np.asarray(mask, dtype=bool).copy()
        mask &= self.boss.valid.astype(bool)
        self.mask = mask

    def num_nodes(self) -> int:
        return int(self.mask.sum())

    def call_sequences(self, unitigs: bool = False, min_tip_size: int = 1,
                       kmers_in_single_form: bool = False):
        return traversal.call_sequences(
            self.boss, unitigs=unitigs, min_tip_size=min_tip_size,
            kmers_in_single_form=kmers_in_single_form,
            subgraph_mask=self.mask.astype(np.uint8))

    def call_paths(self, unitigs: bool = True):
        return traversal.call_paths(self.boss, unitigs, False, True,
                                    self.mask.astype(np.uint8))


def mask_nodes_by_label(anno_graph, labels_in: Set[str], labels_out: Set[str],
                        labels_in_round2: Set[str], labels_out_round2: Set[str],
                        config: DifferentialAssemblyConfig
                        ) -> MaskedDeBruijnGraph:
    """ref annotated_graph_algorithm.cpp:107-284."""
    graph = anno_graph.graph
    anno = anno_graph.annotator
    enc = anno.encoder
    M = graph.max_index() + 1

    for label in labels_in_round2 | labels_out_round2:
        try:
            enc.encode(label)
        except KeyError:
            # ref assemble.cpp:30-42 check_labels: unknown labels are fatal
            raise ValueError(f"Label {label} is not found in annotation")
    num_in = len(labels_in) + len(labels_in_round2)
    num_out = len(labels_out) + len(labels_out_round2)

    # --- round 1: per-node in/out label counts ------------------------------
    in_counts = np.zeros(M, dtype=np.int64)
    out_counts = np.zeros(M, dtype=np.int64)
    init_mask = np.zeros(M, dtype=bool)
    for label in labels_in | labels_out:
        try:
            c = enc.encode(label)
        except KeyError:
            raise ValueError(f"Label {label} is not found in annotation")
        rows = _column_rows(anno, c)
        nodes = rows + 1
        if label in labels_in:
            in_counts[nodes] += 1
        if label in labels_out:
            out_counts[nodes] += 1
        init_mask[nodes] = True

    if config.add_complement:
        # extend the round-1 mask/counts to every masked node's reverse
        # complement (ref make_initial_masked_graph,
        # annotated_graph_algorithm.cpp:296-343: rc nodes receive the
        # forward node's in/out counts and join the mask iff in_count > 0)
        nodes = np.flatnonzero(init_mask)
        if len(nodes):
            boss = graph.boss
            kchars = boss.get_edge_seq(nodes)
            comp = graph.extractor.extended_complement_table()
            rc_chars = np.ascontiguousarray(comp[kchars[:, ::-1]])
            rc_nodes = graph.map_kmers_batch(rc_chars)
            ok = rc_nodes > 0
            rc, src = rc_nodes[ok], nodes[ok]
            in_snap = in_counts[src].copy()
            out_snap = out_counts[src].copy()
            np.add.at(in_counts, rc, in_snap)
            np.add.at(out_counts, rc, out_snap)
            init_mask[rc[in_snap > 0]] = True

    masked = MaskedDeBruijnGraph(graph, init_mask)
    check_other = config.label_mask_other_unitig_fraction != 1.0
    other_mask = np.zeros(M, dtype=bool)

    # --- round 2: shared/other labels over initial contigs ------------------
    if check_other or labels_in_round2 or labels_out_round2:
        union_mask = masked.mask.copy()
        table = graph.alphabet.decode_table
        for path, seq in masked.call_paths(unitigs=False):
            contig = table[np.array(seq, dtype=np.uint8)].tobytes()
            path_arr = np.array(path, dtype=np.int64)
            for label, count, sig in anno_graph.get_top_label_signatures(
                    contig, anno.num_labels, 0.0, 0.0):
                found_in = label in labels_in
                found_out = label in labels_out
                found_in2 = label in labels_in_round2
                found_out2 = label in labels_out_round2
                covered = path_arr[np.asarray(sig, dtype=bool)[:len(path_arr)]]
                if not (found_in or found_out or found_in2 or found_out2) \
                        and check_other:
                    other_mask[covered] = True
                if found_in2:
                    union_mask[covered] = True
                    in_counts[covered] += 1
                if found_out2:
                    union_mask[covered] = True
                    out_counts[covered] += 1
        masked = MaskedDeBruijnGraph(graph, union_mask)

    # --- round 3: filtration -------------------------------------------------
    min_in = math.ceil(config.label_mask_in_kmer_fraction * num_in)
    max_out = math.floor(config.label_mask_out_kmer_fraction * num_out)

    if (config.label_mask_in_unitig_fraction == 0.0
            and config.label_mask_out_unitig_fraction == 1.0
            and config.label_mask_other_unitig_fraction == 1.0):
        keep = masked.mask & (in_counts >= min_in) & (out_counts <= max_out)
        return MaskedDeBruijnGraph(graph, keep)

    # unitig-based filtering (ref :233-280 + update_masked_graph_by_unitig)
    new_mask = np.zeros(M, dtype=bool)
    for path, seq in masked.call_paths(unitigs=True):
        path_arr = np.array(path, dtype=np.int64)
        in_ok = in_counts[path_arr] >= min_in
        nz = np.flatnonzero(in_ok)
        if len(nz) == 0:
            continue
        begin, end = int(nz[0]), int(nz[-1]) + 1
        size = end - begin
        if len(nz) < math.ceil(config.label_mask_in_unitig_fraction * size):
            continue
        label_out_cutoff = math.floor(
            config.label_mask_out_unitig_fraction * size)
        other_cutoff = math.floor(
            config.label_mask_other_unitig_fraction * size)
        seg = path_arr[begin:end]
        out_kmers = int((out_counts[seg] > max_out).sum())
        if out_kmers > label_out_cutoff:
            continue
        if check_other and int(other_mask[seg].sum()) > other_cutoff:
            continue
        new_mask[seg] = True
    return MaskedDeBruijnGraph(graph, new_mask)


def _column_rows(anno, code: int) -> np.ndarray:
    if hasattr(anno, "column_rows"):
        return anno.column_rows(code)
    # static matrix: extract the column via row scan (small graphs only)
    mask = anno.get_rows_mask(np.arange(anno.num_rows))
    return np.flatnonzero(mask[:, code])


def run_differential_assembly(anno_graph, rules: dict):
    """Parse the rules JSON and yield (experiment name, masked graph)
    (ref assemble.cpp:64-160 call_masked_graphs)."""
    if "groups" not in rules or not rules["groups"]:
        raise ValueError("'groups' array missing in assembly rules")
    shared_in: Set[str] = set()
    shared_out: Set[str] = set()
    for group in rules["groups"]:
        if "shared_labels" in group:
            shared_in = set(group["shared_labels"].get("in", []))
            shared_out = set(group["shared_labels"].get("out", []))
        if "experiments" not in group:
            # ref assemble.cpp:117-118
            raise ValueError("Missing experiments in group")
        for experiment in group["experiments"]:
            cfg = DifferentialAssemblyConfig.from_experiment(
                experiment, anno_graph.graph)
            labels_in = set(experiment.get("in", []))
            labels_out = set(experiment.get("out", []))
            masked = mask_nodes_by_label(anno_graph, labels_in, labels_out,
                                         shared_in, shared_out, cfg)
            yield experiment["name"], masked
