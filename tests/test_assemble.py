"""Differential assembly tests (ref integration_tests/test_assemble.py:267)."""

import json
import re

import numpy as np
import pytest

from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
from metagraph_tpu.annotation.column import ColumnMajorAnnotation
from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
from metagraph_tpu.graph.masked import (MaskedDeBruijnGraph,
                                        run_differential_assembly)
from metagraph_tpu.seq_io.fasta import read_fasta

REF = "/root/reference/metagraph/tests/data"

WANT_OTHER = (
    "CTTGGATCACACTCTTCTCAGAGCCCAGGCCAGGGGCCCCCAAGAAAGGCTCTGGTGGAGAACCTGTGCA"
    "TGAAGGCTGTCAACCAGTCCATAGGCAGGGCCATCAGGCACCAAAGGGATTCTGCCAGCATAGTGCTCCT"
    "GGACCAGTGATACACCCGGCACCCTGTCCTGGACATGCTGTTGGCCTGGATCTGAGCCCTCGTGGAGGTC"
    "AAAGCCACCTTTGGTTCTGCCATTGCTGCTGTGTGGAAGTTCACTCAAGTAGGCCTCTTCCTG")
WANT_SYM = (
    "TGGAAGTTCACTCAAGTAGGCCTCTTCCTGACAGGCAGCTGCACCACTGCCTGGCGCTGTGCCCTTCCTT"
    "TGCTCTGCCCGCTGGAGACGGTGTTTGTCATGGGCCTGGTCTGCAGG")


class TestMaskedGraph:
    def test_masked_subset(self):
        g = DBGSuccinct.build([b"ACGTACGTACGGATCATCAG"], 5)
        full = MaskedDeBruijnGraph(g, g.boss.valid.astype(bool))
        assert full.num_nodes() == g.num_nodes()
        contigs = full.call_sequences()
        assert sum(len(c) - 4 for c in contigs) == g.num_nodes()


@pytest.mark.anchors
class TestDiffAssembly:
    def test_metasub_example(self):
        recs = read_fasta(f"{REF}/metasub_fake_data_simple.fa")
        g = DBGSuccinct.build([r.seq for r in recs], 31)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for r in recs:
            ag.annotate_sequence(r.seq, [r.name])
        with open(f"{REF}/example.diff.json") as f:
            rules = json.loads(re.sub(r",\s*([\]}])", r"\1", f.read()))
        table = g.alphabet.decode_table
        results = {}
        for name, masked in run_differential_assembly(ag, rules):
            for c in masked.call_sequences():
                results.setdefault(name, []).append(table[c].tobytes().decode())
        assert set(results) == {"metasub_other", "metasub_by_kmer",
                                "metasub_sym_diff"}
        assert results["metasub_other"] == [WANT_OTHER]
        assert results["metasub_by_kmer"] == [WANT_OTHER]
        assert results["metasub_sym_diff"] == [WANT_SYM]


@pytest.mark.anchors
class TestAssembleGFAAnchors:
    """ref integration_tests/test_assemble.py:15-140: exact GFA record
    counts for assemble --unitigs --to-gfa and align -o .gfa P-lines on
    canonical transcripts_100 k=20."""

    EXPECT = {"--compacted": {"H": 1, "S": 1252, "L": 1634},
              "": {"H": 1, "S": 91584, "L": 91966}}

    @pytest.fixture(scope="class")
    def graph_dir(self, tmp_path_factory):
        from tests.test_cli import run_cli
        d = str(tmp_path_factory.mktemp("gfa"))
        r = run_cli(["build", "--mask-dummy", "--mode", "canonical",
                     "-k", "20", "-o", "graph",
                     "/root/reference/metagraph/tests/data/transcripts_100.fa"],
                    d)
        assert r.returncode == 0, r.stderr
        return d

    @pytest.mark.parametrize("flag", ["--compacted", ""])
    def test_gfa_record_counts(self, graph_dir, flag):
        import os
        from collections import Counter
        from tests.test_cli import run_cli
        args = ["assemble", "graph.dbg.npz", "-o", "assembled",
                "--unitigs", "--to-gfa"] + ([flag] if flag else [])
        r = run_cli(args, graph_dir)
        assert r.returncode == 0, r.stderr
        counts = Counter(line[0] for line in open(
            os.path.join(graph_dir, "assembled.gfa")) if line.strip())
        assert dict(counts) == self.EXPECT[flag]
        # align -o <gfa> appends P-lines for the query paths
        args = ["align", "-i", "graph.dbg.npz", "-o", "assembled.gfa"] \
            + ([flag] if flag else []) \
            + ["/root/reference/metagraph/tests/data/transcripts_100.fa"]
        r = run_cli(args, graph_dir)
        assert r.returncode == 0, r.stderr
        plines = sum(1 for line in open(
            os.path.join(graph_dir, "assembled.path.gfa"))
            if line.startswith("P"))
        assert plines == 100
