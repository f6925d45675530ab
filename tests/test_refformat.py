"""Reference on-disk format readers (seq_io/refformat.py): the example
artifacts in /root/reference/metagraph/examples were produced by the
reference binary; loading them must reproduce the exact BOSS arrays our own
construction yields for the same input."""

import numpy as np
import pytest

from metagraph_tpu.seq_io.refformat import (load_reference_boss,
                                            load_reference_column_annotation)

EX = "/root/reference/metagraph/examples/data"
REF = "/root/reference/metagraph/tests/data"


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

    def test_protein_graph_bit_exact(self):
        """Building from the example protein fasta reproduces the reference's
        serialized BOSS arrays exactly (8-bit packed keys, sigma=27)."""
        from metagraph_tpu.seq_io.fasta import read_fasta
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        from metagraph_tpu.kmer.alphabets import PROTEIN
        g = load_reference_boss(f"{EX}/graphs/test_Protein_graph.dbg")
        recs = read_fasta(f"{EX}/test_Protein_sequences.fa")
        mine = DBGSuccinct.build([r.seq for r in recs], 20, alphabet=PROTEIN)
        for name in ("W", "last", "F", "valid"):
            np.testing.assert_array_equal(getattr(g.boss, name),
                                          getattr(mine.boss, name))
        for r in read_fasta(f"{EX}/test_Protein_query.fa"):
            assert (mine.map_to_nodes(r.seq) > 0).all()

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


class TestReferenceWriters:
    """Emit side (refwrite.py): files this engine writes must parse with the
    byte-layout readers that are themselves verified against real reference
    artifacts (ref boss.cpp:262-340, annotate_column_compressed.cpp)."""

    def test_rrr_reencode_example_byte_exact(self):
        """Re-encoding the example .dbg `last` rrr vector reproduces the real
        sdsl serialization byte for byte (validates the fitted sample
        directories)."""
        from metagraph_tpu.seq_io import refformat as rf
        from metagraph_tpu.seq_io import refwrite as rw
        for name in ("test_DNA_graph", "test_Protein_graph"):
            path = (f"/root/reference/metagraph/examples/data/graphs/"
                    f"{name}.dbg")
            data = open(path, "rb").read()
            cur = rf.Cursor(data)
            nF = cur.be64()
            [cur.be64() for _ in range(nF)]
            cur.be64()
            cur.be64()
            rf.read_wt_huff(cur)
            cur.be64()
            cur.be64()
            start = cur.off
            last = rf.read_rrr_vector(cur)
            orig = data[start:cur.off]
            w = rw.Writer()
            rw.write_rrr_vector(w, last)
            assert bytes(w.buf) == orig

    def test_boss_roundtrip(self, tmp_path):
        from metagraph_tpu.seq_io.fasta import read_fasta
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        from metagraph_tpu.seq_io.refwrite import save_reference_boss
        from metagraph_tpu.seq_io.refformat import load_reference_boss
        recs = read_fasta(f"{REF}/transcripts_100.fa")
        for mode in ("basic", "canonical"):
            g = DBGSuccinct.build([r.seq for r in recs], k=20, mode=mode)
            out = save_reference_boss(g, str(tmp_path / f"g_{mode}.dbg"))
            g2 = load_reference_boss(out)
            assert g2.k == g.k and g2.mode == g.mode
            np.testing.assert_array_equal(g2.boss.W, g.boss.W)
            np.testing.assert_array_equal(g2.boss.last, g.boss.last)
            np.testing.assert_array_equal(g2.boss.F, g.boss.F)
            np.testing.assert_array_equal(g2.boss.valid, g.boss.valid)

    def test_annotation_roundtrip(self, tmp_path):
        from metagraph_tpu.seq_io.fasta import read_fasta
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        from metagraph_tpu.annotation.column import ColumnMajorAnnotation
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        from metagraph_tpu.seq_io.refwrite import (
            save_reference_column_annotation)
        from metagraph_tpu.seq_io.refformat import (
            load_reference_column_annotation)
        recs = read_fasta(f"{REF}/transcripts_100.fa")
        g = DBGSuccinct.build([r.seq for r in recs], k=20)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for r in recs[:25]:
            ag.annotate_sequence(r.seq, [r.name])
        out = save_reference_column_annotation(
            anno, str(tmp_path / "a.column.annodbg"))
        anno2 = load_reference_column_annotation(out)
        assert anno2.num_rows == anno.num_rows
        assert anno2.num_labels == anno.num_labels
        for c in range(anno.num_labels):
            np.testing.assert_array_equal(anno2.column_rows(c),
                                          anno.column_rows(c))
            assert anno2.encoder.decode(c) == anno.encoder.decode(c)
