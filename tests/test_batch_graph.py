"""--batch-align hull-expanded per-batch alignment graph
(ref src/cli/query.cpp:874-1110 construct_query_graph, :494-606
call_hull_sequences, :718-806 add_hull_contigs)."""

import numpy as np
import pytest

from metagraph_tpu.align.aligner import DBGAligner
from metagraph_tpu.align.config import AlignerConfig
from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
from metagraph_tpu.query.batch_graph import construct_batch_graph
from metagraph_tpu.query.pipeline import QueryEngine
from metagraph_tpu.seq_io.fasta import read_fasta

REF = "/root/reference/metagraph/tests/data"


def _engine(graph):
    eng = QueryEngine.__new__(QueryEngine)
    eng.graph = graph
    eng._canonical_offset = None
    eng._base = graph
    eng.use_device = False
    eng._host_index = None
    eng._device_index = None
    eng._bits = 4
    eng.n_threads = None
    return eng


def _mutated_reads(recs, n, rng, readlen=150, muts=2):
    reads = []
    for r in recs[:n]:
        s = bytearray(r.seq[:readlen].upper())
        if len(s) < readlen:
            continue
        for p in rng.choice(len(s), muts, replace=False):
            s[p] = ord("ACGT"[rng.integers(4)])
        reads.append(bytes(s))
    return reads


class TestBatchGraph:
    @pytest.fixture(scope="class")
    def full(self):
        recs = read_fasta(f"{REF}/transcripts_100.fa")
        return DBGSuccinct.build([r.seq for r in recs], k=20), recs

    def test_hull_recovers_mutation_detour(self, full):
        """A read with one interior mismatch aligns to the same score/CIGAR
        against the batch graph as against the full graph: the hull DFS from
        the last matched k-mer picks up the true-path contig
        (ref query.cpp:780-795 expansion from unmatched positions)."""
        g, recs = full
        rng = np.random.default_rng(0)
        reads = _mutated_reads(recs, 8, rng)
        small, stats = construct_batch_graph(_engine(g), reads)
        assert stats.num_hull_contigs > 0
        assert small.num_nodes() < g.num_nodes()
        cfg = AlignerConfig(min_exact_match=0.0)
        a_full = DBGAligner(g, cfg).align_batch(reads)
        a_small = DBGAligner(small, cfg).align_batch(reads)
        for x, y in zip(a_full, a_small):
            assert (len(x) == 0) == (len(y) == 0)
            if x:
                assert x[0].score == y[0].score
                assert str(x[0].cigar) == str(y[0].cigar)

    def test_every_small_kmer_in_full(self, full):
        """Batch-graph k-mers are a subset of the full graph's, so respelled
        alignments re-query the full index directly (ref add_hull_contigs
        emits only full-graph paths)."""
        g, recs = full
        rng = np.random.default_rng(1)
        reads = _mutated_reads(recs, 5, rng)
        small, _ = construct_batch_graph(_engine(g), reads)
        contigs = [c for _, c in small.sequences()] if hasattr(
            small, "sequences") else []
        if not contigs:  # fall back: check the mutated reads' nodes
            for r in reads:
                ns = small.map_to_nodes(r)
                nf = g.map_to_nodes(r)
                assert ((ns > 0) <= (nf > 0)).all()
        else:
            for c in contigs:
                assert (g.map_to_nodes(c) > 0).all()

    def test_exact_reads_no_hull_starts_needed(self, full):
        """Reads fully present in the graph match every window in the
        batch graph too."""
        g, recs = full
        reads = [r.seq[:150].upper() for r in recs[:5] if len(r.seq) >= 150]
        small, _ = construct_batch_graph(_engine(g), reads)
        for r in reads:
            assert (small.map_to_nodes(r) > 0).all()
