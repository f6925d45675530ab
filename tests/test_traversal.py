"""Traversal + cleaning tests (anchors from integration_tests/test_clean.py
and test_query.py primary-mode setup)."""

import numpy as np
import pytest

from metagraph_tpu.graph import traversal
from metagraph_tpu.graph.cleaning import (cleaning_pick_kmer_threshold,
                                          clean_graph_contigs,
                                          is_unreliable_unitig, smooth_vector)
from metagraph_tpu.graph.dbg_succinct import DBGSuccinct


def decode(g, contigs):
    table = g.alphabet.decode_table
    return [table[c].tobytes() for c in contigs]


class TestCallSequences:
    def test_roundtrip_small(self):
        rng = np.random.default_rng(5)
        seqs = ["".join(rng.choice(list("ACGT"), size=400)).encode()
                for _ in range(4)]
        g = DBGSuccinct.build(seqs, 9)
        contigs = traversal.call_sequences(g.boss)
        assert sum(len(c) - 8 for c in contigs) == g.num_nodes()
        g2 = DBGSuccinct.build(decode(g, contigs), 9)
        assert g2.num_nodes() == g.num_nodes()

    def test_unitigs_internal_nodes_simple(self):
        g = DBGSuccinct.build([b"ACGTTATACGGCATTTACGTA"], 5)
        unitigs = traversal.call_sequences(g.boss, unitigs=True)
        assert sum(len(c) - 4 for c in unitigs) == g.num_nodes()

    def test_primary_single_form(self):
        rng = np.random.default_rng(6)
        seqs = ["".join(rng.choice(list("ACGT"), size=300)).encode()
                for _ in range(3)]
        g = DBGSuccinct.build(seqs, 7, mode="canonical")
        contigs = traversal.call_sequences(g.boss, kmers_in_single_form=True)
        gp = DBGSuccinct.build(decode(g, contigs), 7)
        # every canonical pair represented exactly once
        n_pal = 0  # odd k -> no palindromes
        assert gp.num_nodes() == g.num_nodes() // 2
        # and mapping via canonical lookup covers everything
        for s in seqs:
            nodes = g.map_to_nodes(s)
            assert (nodes > 0).all()

    def test_cycle_coverage(self):
        # a sequence whose kmers form a cycle
        s = b"ACGTACGTACGT"
        g = DBGSuccinct.build([s], 4)
        contigs = traversal.call_sequences(g.boss)
        assert sum(len(c) - 3 for c in contigs) == g.num_nodes()


class TestCleaning:
    def test_smooth_vector_noop(self):
        v = np.array([1, 5, 3], dtype=np.int64)
        np.testing.assert_array_equal(smooth_vector(1, v), v)

    def test_is_unreliable(self):
        assert not is_unreliable_unitig(np.array([1, 1, 1]), 1)
        assert is_unreliable_unitig(np.array([1, 1, 5]), 3)
        assert not is_unreliable_unitig(np.array([5, 5, 1]), 3)

    def test_threshold_estimator_bimodal(self):
        # errors at cov 1-2, signal around 20 -> cutoff between
        hist = np.zeros(40, dtype=np.uint64)
        hist[1], hist[2], hist[3] = 10000, 3000, 900
        for c in range(15, 26):
            hist[c] = 500
        cutoff = cleaning_pick_kmer_threshold(hist)
        assert 3 <= cutoff <= 15

    def test_clean_mincount_mask(self):
        g = DBGSuccinct.build([b"ACGTACGTAGGACCTTAGCA"] * 3 + [b"TTTTTTTTTT"],
                              5, with_counts=True)
        seqs, counts = clean_graph_contigs(g, min_count=2)
        kmers = set()
        for s in seqs:
            for i in range(len(s) - 4):
                kmers.add(bytes(s[i:i + 5]))
        # the TTTTT kmers (count 6? no: one seq of 10 T -> TTTTT count 6) stays;
        # all kmers from the tripled read (count >= 3) stay
        dec = g.alphabet.decode_table
        assert dec[np.frombuffer(b"", dtype=np.uint8)] is not None
        assert len(kmers) > 0
        assert counts is not None


@pytest.mark.anchors
class TestCleanAnchors:
    """ref integration_tests/test_clean.py:26-184 (exact rebuild stats)."""

    @pytest.fixture(scope="class")
    def graph(self, transcripts_1000):
        return DBGSuccinct.build(transcripts_1000, 20, with_counts=True)

    def rebuild(self, g, seqs, counts):
        table = g.alphabet.decode_table
        return DBGSuccinct.build(
            [table[s].tobytes() for s in seqs], 20, with_counts=True,
            window_weights=counts)

    def test_no_cleaning_roundtrip(self, graph):
        seqs, counts = clean_graph_contigs(graph)
        g2 = self.rebuild(graph, seqs, counts)
        assert g2.num_nodes() == 591997
        w = g2.boss.weights[g2.boss.valid > 0]
        assert int((w > 0).sum()) == 591997
        assert f"{float(w.sum()) / 591997:.6g}" == "2.48587"

    def test_prune_tips_60(self, graph):
        seqs, counts = clean_graph_contigs(graph, prune_tips=60)
        g2 = self.rebuild(graph, seqs, counts)
        assert g2.num_nodes() == 589774
        w = g2.boss.weights[g2.boss.valid > 0]
        assert f"{float(w.sum()) / 589774:.6g}" == "2.49001"

    def test_prune_unitigs_3(self, graph):
        seqs, counts = clean_graph_contigs(graph, prune_unitigs=3)
        g2 = self.rebuild(graph, seqs, counts)
        assert g2.num_nodes() == 167395
        w = g2.boss.weights[g2.boss.valid > 0]
        assert f"{float(w.sum()) / 167395:.6g}" == "5.52732"

    def test_prune_tips_and_unitigs(self, graph):
        seqs, counts = clean_graph_contigs(graph, prune_tips=60,
                                           prune_unitigs=3)
        g2 = self.rebuild(graph, seqs, counts)
        assert g2.num_nodes() == 167224
        w = g2.boss.weights[g2.boss.valid > 0]
        assert f"{float(w.sum()) / 167224:.6g}" == "5.52757"


@pytest.mark.anchors
class TestPrimaryAnchor:
    def test_primary_transcripts_100(self, transcripts_100):
        g = DBGSuccinct.build(transcripts_100, 20, mode="canonical")
        contigs = traversal.call_sequences(g.boss, kmers_in_single_form=True)
        table = g.alphabet.decode_table
        gp = DBGSuccinct.build([table[c].tobytes() for c in contigs], 20,
                               mode="primary")
        assert gp.num_nodes() == 45792    # ref test_query.py:990


@pytest.mark.anchors
class TestCanonicalCleanK31:
    """ref test_clean.py TestCleanWeightedCanonical (1185814 @ 2.4635)."""

    def test_roundtrip(self, transcripts_1000):
        g = DBGSuccinct.build(transcripts_1000, 31, mode="canonical",
                              with_counts=True)
        assert g.num_nodes() == 1185814
        w = g.boss.weights[g.boss.valid > 0]
        assert f"{float(w.sum()) / 1185814:.6g}" == "2.4635"
        seqs, counts = clean_graph_contigs(g)
        table = g.alphabet.decode_table
        g2 = DBGSuccinct.build([table[s].tobytes() for s in seqs], 31,
                               mode="canonical", with_counts=True,
                               window_weights=counts)
        assert g2.num_nodes() == 1185814
        w2 = g2.boss.weights[g2.boss.valid > 0]
        assert f"{float(w2.sum()) / 1185814:.6g}" == "2.4635"
