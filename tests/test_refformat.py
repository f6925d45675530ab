"""Reference on-disk format readers (seq_io/refformat.py): the example
artifacts in /root/reference/metagraph/examples were produced by the
reference binary; loading them must reproduce the exact BOSS arrays our own
construction yields for the same input."""

import numpy as np
import pytest

from metagraph_tpu.seq_io.refformat import (load_reference_boss,
                                            load_reference_column_annotation)

EX = "/root/reference/metagraph/examples/data"


class TestReferenceDbg:
    def test_dna_graph_bit_exact(self):
        from metagraph_tpu.seq_io.fasta import read_fasta
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        g = load_reference_boss(f"{EX}/graphs/test_DNA_graph.dbg")
        recs = read_fasta(f"{EX}/test_DNA_sequences.fa")
        mine = DBGSuccinct.build([r.seq for r in recs], 20)
        np.testing.assert_array_equal(g.boss.W, mine.boss.W)
        np.testing.assert_array_equal(g.boss.last, mine.boss.last)
        np.testing.assert_array_equal(g.boss.F, mine.boss.F)
        np.testing.assert_array_equal(g.boss.valid, mine.boss.valid)
        assert g.k == 20 and g.num_nodes() == 24
        for r in recs:
            assert (g.map_to_nodes(r.seq) > 0).all()

    def test_protein_graph_loads(self):
        g = load_reference_boss(f"{EX}/graphs/test_Protein_graph.dbg")
        assert g.k == 20
        assert g.boss.alph_size == 27
        assert g.num_nodes() == 57

    def test_dbg_succinct_load_dispatches(self):
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        g = DBGSuccinct.load(f"{EX}/graphs/test_DNA_graph.dbg")
        assert g.num_nodes() == 24


class TestReferenceAnnodbg:
    def test_dna_annotation(self):
        a = load_reference_column_annotation(
            f"{EX}/graphs/test_DNA_graph.column.annodbg")
        assert a.num_rows == 25
        assert a.encoder.decode(0) == "test_DNA_sequences.fa"
        # all 24 valid rows annotated (rows 1..24); dummy row 0 is not
        np.testing.assert_array_equal(a.column_rows(0), np.arange(1, 25))

    def test_protein_annotation(self):
        a = load_reference_column_annotation(
            f"{EX}/graphs/test_Protein_graph.column.annodbg")
        assert a.num_rows == 118
        assert len(a.column_rows(0)) == 57

    def test_end_to_end_query(self):
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        from metagraph_tpu.annotation.matrix import load_annotation
        g = load_reference_boss(f"{EX}/graphs/test_DNA_graph.dbg")
        a = load_annotation(f"{EX}/graphs/test_DNA_graph.column.annodbg")
        ag = AnnotatedDBG(g, a)
        assert ag.get_labels(b"ACGTACGTACGTACGTACGTACGTACGT", 1.0) \
            == ["test_DNA_sequences.fa"]
        assert ag.get_labels(b"A" * 28, 1.0) == []


class TestReferenceWeights:
    """`.dbg.weights` sidecar: bare sdsl::int_vector<> aligned with BOSS
    edge positions (ref node_weights.cpp:36-61, is_compatible:73-82)."""

    def _write_weights(self, path, vals, width=8):
        import struct
        payload = bytes(int(v) & 0xFF for v in vals)
        payload += b"\x00" * ((-len(payload)) % 8)
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", len(vals) * width))
            f.write(struct.pack("B", width))
            f.write(payload)

    def test_load_weights_sidecar(self, tmp_path):
        import shutil
        import numpy as np
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        dbg = tmp_path / "g.dbg"
        shutil.copy(f"{EX}/graphs/test_DNA_graph.dbg", dbg)
        g = DBGSuccinct.load(str(dbg))
        M = len(g.boss.W)
        vals = [(i % 250) + 1 for i in range(M)]
        self._write_weights(str(dbg) + ".weights", vals)
        g2 = DBGSuccinct.load(str(dbg))
        assert g2.boss.weights is not None
        assert np.array_equal(g2.boss.weights,
                              np.array(vals, dtype=np.uint64))

    def test_incompatible_weights_ignored(self, tmp_path):
        import shutil
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        dbg = tmp_path / "g.dbg"
        shutil.copy(f"{EX}/graphs/test_DNA_graph.dbg", dbg)
        self._write_weights(str(dbg) + ".weights", list(range(1, 11)))
        g = DBGSuccinct.load(str(dbg))
        assert g.boss.weights is None
