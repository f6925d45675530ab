"""Post-chaining tests, ported from ref tests/graph/test_aligner_chain.cpp
(DBGAlignerPostChainTest).  Each case asserts the chained path's spliced
reference sequence.  Config mirrors the reference unit-test defaults
(aligner_config.hpp:23-46: gap -5/-2, end bonuses 0)."""

import pytest

from metagraph_tpu.align.aligner import DBGAligner
from metagraph_tpu.align.config import AlignerConfig, dna_scoring_matrix
from metagraph_tpu.graph.dbg_succinct import DBGSuccinct


def chain_align(k, refs, query, matrix=(2, -1, -2), gap_open=-5, gap_ext=-2):
    g = DBGSuccinct.build([r.encode() for r in refs], k)
    cfg = AlignerConfig(
        num_alternative_paths=1,
        min_seed_length=k,
        post_chain_alignments=True,
        gap_opening_penalty=gap_open,
        gap_extension_penalty=gap_ext,
        left_end_bonus=0,
        right_end_bonus=0,
        score_matrix=dna_scoring_matrix(*matrix))
    paths = DBGAligner(g, cfg).align(query.encode())
    assert len(paths) >= 1
    return paths


class TestPostChain:
    def test_align_chain_swap(self):
        # ref test_aligner_chain.cpp:36-53
        paths = chain_align(5, ["ATGATATGATGACCCCGG"], "TGACCCCGGATGATATGA")
        assert paths[0].sequence == b"TGACCCCGGATGATATGA"

    def test_align_chain_overlap_2(self):
        # ref test_aligner_chain.cpp:56-75
        paths = chain_align(5, ["TGAGGATCAG", "CAGCTAGCTAGCTAGC"],
                            "TGAGGATCAGCTAGCTAGCTAGC")
        assert paths[0].sequence == b"TGAGGATCAGCTAGCTAGCTAGC"

    def test_align_chain_overlap_3_prefer_mismatch_over_gap(self):
        # ref test_aligner_chain.cpp:77-99
        paths = chain_align(5, ["TGAGGATCAG", "CAGCTAGCT", "GCTTGCTAGC"],
                            "TGAGGATCAGCTAGCTTGCTAGC", matrix=(2, -3, -3))
        assert paths[0].sequence == b"TGAGGATCAGCTAGCTAGCTAGC"

    def test_align_chain_insert_no_chain_if_full_coverage(self):
        # ref test_aligner_chain.cpp:101-118
        paths = chain_align(10, ["TGAGGATCAGTTCTAGCTTGCTAGC"],
                            "TGAGGATCAGCTAGCTTGCTAGC")
        assert paths[0].sequence == b"TGAGGATCAGTTCTAGCTTGCTAGC"

    def test_align_chain_insert1(self):
        # ref test_aligner_chain.cpp:120-139
        paths = chain_align(
            10, ["TGAGGATCAGTTCTAGCTTG", "CTAGCTTGCTAGCGCTAGCTAGATC"],
            "TGAGGATCAGCTAGCTTGCTAGCGCTAGCTAGATC")
        assert paths[0].sequence == b"TGAGGATCAGTTCTAGCTTGCTAGCGCTAGCTAGATC"

    def test_align_chain_insert_mismatch(self):
        # ref test_aligner_chain.cpp:141-161
        paths = chain_align(
            10, ["TGAGGATCAGTTCTAGCTTG", "CTAGCTTGCTAGCGCTAGCTAGATC"],
            "TGAGGATCAGCTTGCTTGCTAGCGCTAGCTAGATC")
        assert paths[0].sequence == b"TGAGGATCAGTTCTAGCTTGCTAGCGCTAGCTAGATC"

    def test_align_chain_insert_in_overlap(self):
        # ref test_aligner_chain.cpp:163-182
        paths = chain_align(
            10, ["TGAGGATCAGTTCTAGCTTG", "CTAGCTTGCTAGCGCTAGCTAGATC"],
            "TGAGGATCAGCTAAGCTTGCTAGCGCTAGCTAGATC")
        assert paths[0].sequence == b"TGAGGATCAGTTCTAGCTTGCTAGCGCTAGCTAGATC"

    def test_align_chain_large_overlap(self):
        # ref test_aligner_chain.cpp:184-202
        paths = chain_align(
            10, ["TGAGGATCAGTTCTAGCTTG", "ATCAGTTCTAGCTTGCTAGCGCTAGCTAGATC"],
            "TGAGGATCAGTAATCTAGCTTGCTAGCGCTAGCTAGATC")
        assert paths[0].sequence == b"TGAGGATCAGTTCTAGCTTGCTAGCGCTAGCTAGATC"

    def test_align_chain_overlap_with_insert(self):
        # ref test_aligner_chain.cpp:204-225
        paths = chain_align(
            10, ["TGAGGATCAGTTCTAGCTTG", "CTAGCTTGCTAGCGCTAGCTAGATC"],
            "TGAGGATCAGTTCTAAGCTTGCTAGCGCTAGCTAGATC",
            matrix=(1, -1, -1), gap_open=-1, gap_ext=-1)
        assert paths[0].sequence == b"TGAGGATCAGTTCTAGCTTGCTAGCGCTAGCTAGATC"

    def test_align_chain_delete_in_overlap(self):
        # ref test_aligner_chain.cpp:227-246
        paths = chain_align(
            10, ["TGAGGATCAGTTCTAGCTTG", "CTAGCTTGCTAGCGCTAGCTAGATC"],
            "TGAGGATCAGTTCTACTTGCTAGCGCTAGCTAGATC")
        assert paths[0].sequence == b"TGAGGATCAGTTCTAGCTTGCTAGCGCTAGCTAGATC"

    def test_align_chain_disjoint(self):
        # ref test_aligner_chain.cpp:248-268
        paths = chain_align(
            10, ["CCCCCCCCTGAGGATCAG", "TTCACTAGCTAGCCCCCCCCC"],
            "CCCCCCCCTGAGGATCAGTTCACTAGCTAGCCCCCCCCC")
        assert paths[0].sequence == b"CCCCCCCCTGAGGATCAG$TTCACTAGCTAGCCCCCCCCC"

    def test_align_chain_gap(self):
        # ref test_aligner_chain.cpp:270-291
        paths = chain_align(
            10, ["AAAAACCCCCTGAGGATCAG", "ACTAGCTAGCCCCCCAAAAA"],
            "AAAAACCCCCTGAGGATCAGTTCACTAGCTAGCCCCCCAAAAA",
            matrix=(1, -1, -1), gap_open=-1, gap_ext=-1)
        assert paths[0].sequence == b"AAAAACCCCCTGAGGATCAG$ACTAGCTAGCCCCCCAAAAA"
