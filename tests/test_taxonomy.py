"""Taxonomy tests — vectors from tests/annotation/taxonomy/test_taxonomy.cpp."""

import numpy as np
import pytest

from metagraph_tpu.annotation.taxonomy import TaxonomyBase, TaxonomyClsAnno

TREE = {
    0: [1, 2, 3],
    1: [4, 5],
    2: [],
    3: [6],
    4: [7, 8],
    5: [], 6: [], 7: [], 8: [],
}


class TestDfsAndRmq:
    def test_dfs_statistics(self):
        tax = TaxonomyClsAnno()
        lin = []
        tax.dfs_statistics(0, TREE, lin)
        assert lin == [0, 1, 4, 7, 4, 8, 4, 1, 5, 1, 0, 2, 0, 3, 6, 3, 0]
        assert tax.node_depth == {0: 4, 1: 3, 2: 1, 3: 2, 4: 2, 5: 1,
                                  6: 1, 7: 1, 8: 1}
        assert tax.node_to_linearization_idx == {
            0: 0, 1: 1, 2: 11, 3: 13, 4: 2, 5: 8, 6: 14, 7: 3, 8: 5}

    def test_rmq_preprocessing(self):
        tax = TaxonomyClsAnno()
        tax.node_depth = {0: 4, 1: 3, 2: 1, 3: 2, 4: 2, 5: 1, 6: 1,
                          7: 1, 8: 1}
        lin = [0, 1, 4, 7, 4, 8, 4, 1, 5, 1, 0, 2, 0, 3, 6, 3, 0]
        tax.rmq_preprocessing(lin)
        expected = [
            [0, 1, 4, 7, 4, 8, 4, 1, 5, 1, 0, 2, 0, 3, 6, 3, 0],
            [0, 1, 4, 4, 4, 4, 1, 1, 1, 0, 0, 0, 0, 3, 3, 0, 0],
            [0, 1, 4, 4, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        ]
        assert tax.rmq_data == expected

    def test_find_lca(self):
        tax = TaxonomyClsAnno()
        lin = []
        tax.dfs_statistics(0, TREE, lin)
        tax.rmq_preprocessing(lin)
        assert tax.find_lca([7, 8]) == 4
        assert tax.find_lca([7, 5]) == 1
        assert tax.find_lca([2, 6]) == 0
        assert tax.find_lca([4]) == 4


class TestLabels:
    def test_accession_parsing(self):
        f = TaxonomyBase.get_accession_version_from_label
        assert f(">gi|1070643132|ref|NC_031224.1| Arthrobacter phage") \
            == "NC_031224.1"
        assert f(">kraken:taxid|2016032|NC_047834.1 Alteromonas virus") \
            == "NC_047834.1"
        assert TaxonomyBase.get_taxid_from_label(
            ">kraken:taxid|2016032|NC_047834.1") == 2016032

    def test_read_nodes_dmp(self):
        tax = TaxonomyClsAnno(
            tax_tree_filepath="/root/reference/metagraph/tests/data/nodes.dmp.head")
        assert tax.root_node == 1
        assert tax.node_depth[tax.root_node] == max(tax.node_depth.values())


class TestClassification:
    def test_assign_class(self):
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        from metagraph_tpu.annotation.column import ColumnMajorAnnotation
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        rng = np.random.default_rng(0)
        seqs = ["".join(rng.choice(list("ACGT"), size=200)).encode()
                for _ in range(3)]
        labels = [">kraken:taxid|7|S7", ">kraken:taxid|8|S8",
                  ">kraken:taxid|2|S2"]
        g = DBGSuccinct.build(seqs, 11)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for s, l in zip(seqs, labels):
            ag.annotate_sequence(s, [l])
        tax = TaxonomyClsAnno(ag, lca_coverage_rate=0.9)
        lin = []
        tax.node_parent = {0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 3,
                           7: 4, 8: 4}
        tax.dfs_statistics(0, TREE, lin)
        tax.rmq_preprocessing(lin)
        # a read entirely from seq0 -> taxid 7
        assert tax.assign_class(seqs[0][:100]) == 7
        # a chimera of seq0 + seq1 -> their LCA 4 dominates
        chimera = seqs[0][:100] + seqs[1][:100]
        assert tax.assign_class(chimera) == 4
        # unmatched read -> 0
        assert tax.assign_class(b"N" * 50) == 0
