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
