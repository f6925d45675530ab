"""Conformance across graph representations (ref tests/graph/all/ typed suites)
+ canonical/primary wrappers + coords/primary query anchors."""

import io

import numpy as np
import pytest

from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
from metagraph_tpu.annotation.column import ColumnMajorAnnotation
from metagraph_tpu.graph import build_graph, traversal
from metagraph_tpu.graph.canonical import CanonicalDBG, RCDBG, revcomp
from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
from metagraph_tpu.query.pipeline import QueryEngine

REPRS = ["succinct", "bitmap", "hash", "sshash"]


@pytest.fixture(scope="module")
def seqs():
    rng = np.random.default_rng(11)
    return ["".join(rng.choice(list("ACGT"), size=300)).encode()
            for _ in range(3)]


class TestConformance:
    @pytest.mark.parametrize("mode", ["basic", "canonical"])
    def test_num_nodes_and_mapping(self, seqs, mode):
        graphs = {r: build_graph(r, seqs, 9, mode=mode) for r in REPRS}
        counts = {g.num_nodes() for g in graphs.values()}
        assert len(counts) == 1
        pat = {tuple((g.map_to_nodes_sequentially(seqs[0]) > 0).tolist())
               for g in graphs.values()}
        assert len(pat) == 1

    def test_traverse_and_degrees(self, seqs):
        graphs = {r: build_graph(r, seqs, 9) for r in REPRS}
        gsucc = graphs["succinct"]
        nodes = gsucc.map_to_nodes_sequentially(seqs[0])[:20]
        for r in ("bitmap", "hash"):
            g = graphs[r]
            other = g.map_to_nodes_sequentially(seqs[0])[:20]
            for ns, no in zip(nodes, other):
                assert len(gsucc.call_outgoing_kmers(int(ns))) \
                    == len(g.call_outgoing_kmers(int(no)))
                assert gsucc.has_single_incoming(int(ns)) \
                    == g.has_single_incoming(int(no))

    def test_hash_graph_dynamic(self, seqs):
        from metagraph_tpu.graph.hash_graph import DBGHashGraph
        g = DBGHashGraph(9)
        g.add_sequence(seqs[0])
        n0 = g.num_nodes()
        g.add_sequence(seqs[1])
        assert g.num_nodes() > n0
        assert (g.map_to_nodes_sequentially(seqs[0]) > 0).all()


class TestCanonicalWrapper:
    def test_wrap_primary(self, seqs):
        gc = DBGSuccinct.build(seqs, 9, mode="canonical")
        contigs = traversal.call_sequences(gc.boss, kmers_in_single_form=True)
        table = gc.alphabet.decode_table
        gp = DBGSuccinct.build([table[c].tobytes() for c in contigs], 9,
                               mode="primary")
        wrap = CanonicalDBG(gp)
        assert wrap.num_nodes() == gc.num_nodes()
        n_f = wrap.map_to_nodes_sequentially(seqs[0])
        n_r = wrap.map_to_nodes_sequentially(revcomp(seqs[0]))[::-1]
        assert (n_f > 0).all() and (n_r > 0).all()
        base_f = np.array([wrap.get_base_node(int(x)) for x in n_f])
        base_r = np.array([wrap.get_base_node(int(x)) for x in n_r])
        np.testing.assert_array_equal(base_f, base_r)

    def test_rcdbg(self, seqs):
        g = DBGSuccinct.build(seqs, 9)
        rc = RCDBG(g)
        n = rc.map_to_nodes_sequentially(revcomp(seqs[0]))
        np.testing.assert_array_equal(
            n[::-1], g.map_to_nodes_sequentially(seqs[0])[::-1][::-1])


@pytest.mark.anchors
class TestPrimaryQueryAnchors:
    """ref test_query.py primary class: byte counts 137269 / 137093."""

    def test_primary_query(self, transcripts_100, transcripts_1000):
        gc = DBGSuccinct.build(transcripts_100, 20, mode="canonical")
        contigs = traversal.call_sequences(gc.boss, kmers_in_single_form=True)
        table = gc.alphabet.decode_table
        gp = DBGSuccinct.build([table[c].tobytes() for c in contigs], 20,
                               mode="primary")
        assert gp.num_nodes() == 45792
        wrap = CanonicalDBG(gp)
        anno = ColumnMajorAnnotation(gp.max_index())
        ag = AnnotatedDBG(wrap, anno)
        from metagraph_tpu.seq_io.fasta import read_fasta
        recs100 = read_fasta(
            "/root/reference/metagraph/tests/data/transcripts_100.fa")
        for r in recs100:
            ag.annotate_sequence(r.seq, [r.name])
        engine = QueryEngine(ag)
        recs = read_fasta(
            "/root/reference/metagraph/tests/data/transcripts_1000.fa")
        for mode, want in (("labels", 137269), ("matches", 137093)):
            buf = io.StringIO()
            for res in engine.query_records(recs, mode, 2 ** 63, 1.0, 0.0):
                buf.write(res.to_string() + "\n")
            assert len(buf.getvalue().encode()) == want, mode


class TestTypedSuiteBehaviors:
    """Behaviors from the reference typed suites (tests/graph/all/)."""

    @pytest.mark.parametrize("repr_name", REPRS)
    def test_traverse_consistency(self, seqs, repr_name):
        g = build_graph(repr_name, seqs, 9)
        nodes = g.map_to_nodes_sequentially(seqs[0])
        s = seqs[0]
        for i in range(min(30, len(nodes) - 1)):
            nxt = g.traverse(int(nodes[i]), chr(s[i + 9]))
            assert nxt == nodes[i + 1]

    @pytest.mark.parametrize("repr_name", REPRS)
    def test_outgoing_chars_spell_kmers(self, seqs, repr_name):
        g = build_graph(repr_name, seqs, 9)
        node = int(g.map_to_nodes_sequentially(seqs[0])[0])
        kmer = g.get_node_sequence(node)
        for nxt, ch in g.call_outgoing_kmers(node):
            assert g.get_node_sequence(nxt) == kmer[1:] + ch.encode()

    @pytest.mark.parametrize("repr_name", ["succinct", "hash", "bitmap"])
    def test_incoming_chars_spell_kmers(self, seqs, repr_name):
        g = build_graph(repr_name, seqs, 9)
        node = int(g.map_to_nodes_sequentially(seqs[0])[10])
        kmer = g.get_node_sequence(node)
        ins = g.call_incoming_kmers(node)
        assert ins
        for prv, ch in ins:
            assert g.get_node_sequence(prv) == ch.encode() + kmer[:-1]

    def test_map_to_nodes_canonical_semantics(self, seqs):
        # canonical map: forward and rc of a read hit the same node ids
        g = build_graph("succinct", seqs, 9, mode="canonical")
        f = g.map_to_nodes(seqs[0])
        r = g.map_to_nodes(revcomp(seqs[0]))[::-1]
        np.testing.assert_array_equal(f, r)


class TestGraphTypePersistenceCLI:
    """build --graph TYPE -> save/load -> annotate -> query round trip for
    every representation (ref CLI graph-type parameterization)."""

    @pytest.mark.parametrize("gtype", ["hash", "bitmap", "sshash",
                                       "hashfast", "hashstr"])
    def test_roundtrip(self, gtype, tmp_path):
        import subprocess
        import sys
        import os
        d = str(tmp_path)
        env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")

        def run(argv):
            return subprocess.run(
                [sys.executable, "-m", "metagraph_tpu.cli"] + argv,
                capture_output=True, text=True, env=env, cwd=d)
        (tmp_path / "s.fa").write_text(
            ">a\nACGTACGTAGGACCTTAGCA\n>b\nTTGGCCAATTGGCCAATT\n")
        r = run(["build", "--graph", gtype, "-k", "11", "-o", "g", "s.fa"])
        assert r.returncode == 0, r.stderr
        assert "nodes=18" in r.stderr
        r = run(["annotate", "-i", "g.dbg.npz", "--anno-header", "-o", "a",
                 "s.fa"])
        assert r.returncode == 0, r.stderr
        r = run(["query", "-i", "g.dbg.npz", "-a", "a.column.annodbg.npz",
                 "--query-mode", "matches", "s.fa"])
        assert r.returncode == 0, r.stderr
        lines = r.stdout.strip().split("\n")
        assert lines[0] == "0\ta\t<a>:10"
        assert lines[1] == "1\tb\t<b>:8"

    def test_library_save_load(self, tmp_path):
        import numpy as np
        from metagraph_tpu.graph import build_graph
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        seqs = [b"ACGTACGTAGGACCTTAGCA"]
        for t in ("hash", "bitmap", "sshash"):
            g = build_graph(t, seqs, 9)
            p = str(tmp_path / f"{t}.dbg.npz")
            g.save(p)
            g2 = DBGSuccinct.load(p)
            assert g2.num_nodes() == g.num_nodes()
            np.testing.assert_array_equal(g2.map_to_nodes(seqs[0]),
                                          g.map_to_nodes(seqs[0]))


class TestDNA5Alphabet:
    """DNA5: N is a real, self-complementary character
    (ref alphabets.hpp:81-85)."""

    def test_canonical_dna5_build_and_map(self):
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        from metagraph_tpu.kmer.alphabets import DNA5
        seqs = [b"ACGTNNACGTACGNTTTGGAGCACGT", b"NNNNACGTACGNNN"]
        g = DBGSuccinct.build(seqs, 5, alphabet=DNA5, mode="canonical")
        # a k-mer and its reverse complement map to the same node (N<->N)
        m = g.map_to_nodes(b"ACGTN")
        mrc = g.map_to_nodes(b"NACGT")
        assert m[0] == mrc[0] > 0
        # basic-mode DNA treats N as invalid; DNA5 indexes it
        gd = DBGSuccinct.build(seqs, 5)
        assert (gd.map_to_nodes_sequentially(b"ACGTN") == 0).all()
        g5 = DBGSuccinct.build(seqs, 5, alphabet=DNA5)
        assert (g5.map_to_nodes_sequentially(b"ACGTN") > 0).any()


class TestCaseSensitiveDNA:
    """DNA_CASE ($ACGTNacgt): complement flips case across strands
    (ref alphabets.hpp:107-123)."""

    def test_case_sensitive_build_and_canonical(self):
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        from metagraph_tpu.kmer.alphabets import DNA_CS
        g = DBGSuccinct.build([b"ACGTacgtNNaCgT", b"acgtACGT"], 4,
                              alphabet=DNA_CS, mode="canonical")
        # rc(ACGT) = acgt under case-flipping complement
        m1, m2 = g.map_to_nodes(b"ACGT"), g.map_to_nodes(b"acgt")
        assert m1[0] == m2[0] > 0
        # case stays distinct without canonicalization
        s1 = g.map_to_nodes_sequentially(b"ACGT")
        s2 = g.map_to_nodes_sequentially(b"acgt")
        assert s1[0] != s2[0]
        # U/u encode as T/t
        assert (g.map_to_nodes(b"ACGU") == g.map_to_nodes(b"ACGT")).all()


class TestQueryAcrossGraphTypes:
    """ref test_query.py @parameterized_class over graph representations:
    the annotate+query CLI flow must behave identically on every type."""

    @pytest.mark.parametrize("gtype", ["succinct", "hash", "bitmap",
                                       "sshash"])
    def test_annotate_query_flow(self, gtype, tmp_path):
        from tests.test_cli import run_cli
        (tmp_path / "s.fa").write_text(
            ">s1\nACGTACGTAGGGACGTACGTC\n>s2\nTTGGCCAATTGGCCTTAAGGC\n")
        args = ["build", "--graph", gtype, "-k", "11", "-o", "g", "s.fa"]
        if gtype == "succinct":
            args.insert(1, "--mask-dummy")
        r = run_cli(args, tmp_path)
        assert r.returncode == 0, r.stderr
        r = run_cli(["annotate", "-i", "g.dbg.npz", "--anno-filename",
                     "-o", "a", "s.fa"], tmp_path)
        assert r.returncode == 0, r.stderr
        r = run_cli(["query", "-i", "g.dbg.npz", "-a", "a.column.annodbg",
                     "s.fa"], tmp_path)
        assert r.returncode == 0, r.stderr
        lines = r.stdout.strip().split("\n")
        assert len(lines) == 2
        assert all("s.fa" in l for l in lines)
