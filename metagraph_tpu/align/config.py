"""Aligner configuration and scoring (ref src/graph/alignment/aligner_config.*,
defaults from cli/config/config.hpp:110-145 and cli/align.cpp:33-70)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

NINF = -(2 ** 31) + 100      # ref aligner_config.hpp ninf = INT32_MIN + 100


def dna_scoring_matrix(match: int = 2, transition: int = -3,
                       transversion: int = -3) -> np.ndarray:
    """(128, 128) int32 char-indexed score matrix
    (ref aligner_config.cpp:165-183)."""
    m = np.full((128, 128), transversion, dtype=np.int32)
    pairs = [("A", "G"), ("G", "A"), ("C", "T"), ("T", "C")]
    for a, b in pairs:
        m[ord(a), ord(b)] = transition
    for c in "ACGT":
        m[ord(c), ord(c)] = match
    # lowercase mirrors
    for a in "ACGTacgt":
        for b in "ACGTacgt":
            m[ord(a), ord(b)] = m[ord(a.upper()), ord(b.upper())]
    return m


def unit_scoring_matrix(match: int = 1) -> np.ndarray:
    """Edit-distance (unit-cost) matrix: every mismatch scores -match, every
    valid-character match scores +match (ref aligner_config.cpp:186-205)."""
    m = np.full((128, 128), -match, dtype=np.int32)
    for c in "ACGT":
        m[ord(c), ord(c)] = match
    for a in "ACGTacgt":
        for b in "ACGTacgt":
            m[ord(a), ord(b)] = m[ord(a.upper()), ord(b.upper())]
    return m


@dataclass
class AlignerConfig:
    num_alternative_paths: int = 1
    min_seed_length: int = 19            # clamped to k at init
    max_seed_length: int = 2 ** 63
    max_num_seeds_per_locus: int = 1000
    min_path_score: int = 0
    min_cell_score: int = NINF
    xdrop: int = 27
    min_exact_match: float = 0.7
    max_nodes_per_seq_char: float = 5.0
    max_ram_per_alignment: float = 200.0
    rel_score_cutoff: float = 0.95
    gap_opening_penalty: int = -6
    gap_extension_penalty: int = -2
    left_end_bonus: int = 5
    right_end_bonus: int = 5
    forward_and_reverse_complement: bool = True
    global_xdrop: bool = True
    allow_left_trim: bool = True
    seed_complexity_filter: bool = True
    no_backtrack: bool = False
    chain_alignments: bool = False
    post_chain_alignments: bool = False
    match_score_val: int = 2
    transition: int = -3
    transversion: int = -3
    edit_distance: bool = False          # --align-edit-distance: unit costs
    score_matrix: np.ndarray = field(default=None)

    def __post_init__(self):
        if self.score_matrix is None:
            self.score_matrix = (
                unit_scoring_matrix(1) if self.edit_distance
                else dna_scoring_matrix(self.match_score_val, self.transition,
                                        self.transversion))

    def clamp_to_k(self, k: int):
        self.min_seed_length = min(self.min_seed_length, k)
        return self

    def match_score(self, seq: bytes | str) -> int:
        if isinstance(seq, str):
            seq = seq.encode()
        a = np.frombuffer(seq, dtype=np.uint8)
        return int(self.score_matrix[a, a].sum())

    def score_sequences(self, a: bytes, b: bytes) -> int:
        x = np.frombuffer(a, dtype=np.uint8)
        y = np.frombuffer(b, dtype=np.uint8)
        return int(self.score_matrix[x, y].sum())
