"""Annotation + query pipeline tests.

Byte anchors from the reference integration suite
(ref integration_tests/test_query.py:190-260): stdout byte counts for the
transcripts_100-annotated k=20 graph queried with transcripts_1000.fa.
"""

import io

import numpy as np
import pytest

from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG, get_min_count
from metagraph_tpu.annotation.column import ColumnMajorAnnotation
from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
from metagraph_tpu.query.pipeline import QueryEngine
from metagraph_tpu.query.results import (collapse_coord_ranges,
                                         encode_presence_mask)


def make_annotated(seqs, k, labels=None, counts=False, coords=False):
    g = DBGSuccinct.build(seqs, k)
    anno = ColumnMajorAnnotation(g.max_index())
    ag = AnnotatedDBG(g, anno)
    coord = 0
    for i, s in enumerate(seqs):
        lab = [labels[i] if labels else f"seq{i}"]
        if coords:
            ag.annotate_kmer_coords(s, lab, coord)
            coord += len(s)
        else:
            ag.annotate_sequence(s, lab)
        if counts:
            ag.annotate_kmer_counts(s, lab)
    return ag


class TestMinCount:
    def test_thresholds(self):
        # ref annotated_dbg.cpp:235-240
        assert get_min_count(1.0, 0.0, 10, 10) == 10
        assert get_min_count(0.7, 0.0, 10, 10) == 7
        assert get_min_count(0.7, 0.0, 10, 0) == 11     # none present
        assert get_min_count(0.0, 0.0, 10, 1) == 1
        assert get_min_count(0.7, 0.5, 10, 4) == 11     # below presence frac


class TestAnnotatedDBG:
    def test_get_labels(self):
        ag = make_annotated([b"ACGTACGTAGGA", b"TTTTCCCCAAAA"], 5)
        assert ag.get_labels(b"ACGTACGTAGGA", 1.0) == ["seq0"]
        assert ag.get_labels(b"TTTTCCCCAAAA", 1.0) == ["seq1"]
        assert ag.get_labels(b"GGGGGGGG", 0.1) == []
        # shared prefix between both -> both labels at low fraction
        both = ag.get_labels(b"ACGTACGTAGGA"[:8], 0.1)
        assert both == ["seq0"]

    def test_label_code_order(self):
        ag = make_annotated([b"AAACCCGGG", b"AAACCCGGG"], 4,
                            labels=["zzz", "aaa"])
        # both labels on same kmers; LABELS output in code order: zzz first
        assert ag.get_labels(b"AAACCCGGG", 1.0) == ["zzz", "aaa"]

    def test_top_labels_sorted_count_desc(self):
        ag = make_annotated([b"ACGTACGTACGTAAAA", b"ACGTACGT"], 5)
        top = ag.get_top_labels(b"ACGTACGTACGTAAAA", discovery_fraction=0.0)
        assert top[0][0] == "seq0"
        assert top[0][1] >= top[1][1]

    def test_duplicate_kmers_count_multiple(self):
        ag = make_annotated([b"AAAAAAAA"], 4)
        top = ag.get_top_labels(b"AAAAAAAA", discovery_fraction=1.0)
        assert top == [("seq0", 5)]      # 5 windows, all same kmer

    def test_kmer_counts(self):
        ag = make_annotated([b"AAAAAG"], 5, counts=True)
        res = ag.get_kmer_counts(b"AAAAAG", discovery_fraction=1.0)
        assert len(res) == 1
        label, count, ab = res[0]
        assert label == "seq0" and count == 2
        assert list(ab) == [1, 1]

    def test_signatures(self):
        ag = make_annotated([b"ACGTACGTAAGG"], 5)
        res = ag.get_top_label_signatures(b"ACGTACGTAAGG", discovery_fraction=1.0)
        label, count, bits = res[0]
        assert bits.all() and count == len(bits)

    def test_coords(self):
        ag = make_annotated([b"ACGTAAGGTT"], 5, coords=True)
        res = ag.get_kmer_coordinates(b"ACGTAAGGTT", discovery_fraction=1.0)
        label, count, tuples = res[0]
        assert [t[0] for t in tuples] == list(range(6))


class TestFormats:
    def test_presence_mask(self):
        assert encode_presence_mask(np.array([1, 1, 1, 0, 0, 1, 1, 0], bool)) \
            == "x3o2x2o1"
        assert encode_presence_mask(np.array([0, 1], bool)) == "o1x1"
        assert encode_presence_mask(np.zeros(0, bool)) == ""

    def test_collapse_coords(self):
        # consecutive diagonal run 0..2 with coords 5,6,7
        assert collapse_coord_ranges([[5], [6], [7]]) == ["0-5-7"]
        assert collapse_coord_ranges([[5], [9], [10]]) == ["0-5", "1-9-10"]
        assert collapse_coord_ranges([[3], [], [3]]) == ["0-3", "2-3"]


@pytest.mark.anchors
class TestQueryByteAnchors:
    """Exact stdout byte counts (ref integration_tests/test_query.py)."""

    @pytest.fixture(scope="class", params=[False, True],
                    ids=["host", "device"])
    def engine(self, request, transcripts_100):
        from metagraph_tpu.seq_io.fasta import read_fasta
        recs = read_fasta("/root/reference/metagraph/tests/data/transcripts_100.fa")
        g = DBGSuccinct.build([r.seq for r in recs], 20)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for r in recs:
            ag.annotate_sequence(r.seq, [r.name])
        return QueryEngine(ag, use_device=request.param)

    def run_query(self, engine, mode, fwd_and_reverse=False):
        from metagraph_tpu.seq_io.fasta import read_fasta
        recs = read_fasta(
            "/root/reference/metagraph/tests/data/transcripts_1000.fa")
        buf = io.StringIO()
        for res in engine.query_records(recs, mode, 2 ** 63, 1.0, 0.0,
                                        fwd_and_reverse=fwd_and_reverse):
            buf.write(res.to_string() + "\n")
        return len(buf.getvalue().encode())

    def test_labels(self, engine):
        assert self.run_query(engine, "labels") == 137140

    def test_matches(self, engine):
        assert self.run_query(engine, "matches") == 136959

    def test_forked_host_parallel_identical(self, engine):
        """-p N on the host path forks per-batch workers; output order and
        bytes must match the serial run (query.cpp:1304 fan-out analog)."""
        if engine.use_device:
            pytest.skip("fork fan-out applies to the host path")
        from metagraph_tpu.seq_io.fasta import read_fasta
        recs = read_fasta(
            "/root/reference/metagraph/tests/data/transcripts_1000.fa")[:300]
        par = QueryEngine(engine.anno_graph, use_device=False, n_threads=3)
        serial = [r.to_string() for r in engine.query_records(
            recs, "labels", 2 ** 63, 1.0, 0.0, batch_size_bp=50_000)]
        forked = [r.to_string() for r in par.query_records(
            recs, "labels", 2 ** 63, 1.0, 0.0, batch_size_bp=50_000)]
        assert forked == serial

    def test_labels_both(self, engine):
        assert self.run_query(engine, "labels", True) == 261390

    def test_matches_both(self, engine):
        assert self.run_query(engine, "matches", True) == 260215


class TestDeviceExecuteBatch:
    """execute_batch (the device query path) is byte-identical to the host
    per-sequence path across all six modes (ref query.cpp:382-445)."""

    @pytest.fixture(scope="class")
    def setup(self):
        seqs = [b"ACGTACGTAGGACTGACTGATCGATGCA",
                b"ACGTACGTAGGATTTACGCATGCATGCA",
                b"TTTTTTTTTTTTTTGGGGGGGACGTACG"]
        g = DBGSuccinct.build(seqs, 7)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for i, s in enumerate(seqs):
            ag.annotate_kmer_coords(s, [f"L{i}"])
            ag.annotate_kmer_counts(s, [f"L{i}"], abundance=i + 2)
        reads = seqs + [b"ACGTACGTAGGACTTACGCAT", b"NNNNNNNNNN", b"ACG"]
        return ag, reads

    @pytest.mark.parametrize("mode", ["labels", "matches", "counts-sum",
                                      "counts", "signature", "coords"])
    @pytest.mark.parametrize("df,pf", [(1.0, 0.0), (0.7, 0.3), (0.0, 0.0)])
    def test_modes_match_host(self, setup, mode, df, pf):
        ag, reads = setup
        host = QueryEngine(ag, use_device=False)
        dev = QueryEngine(ag, use_device=True)
        nl_h = host.map_batch(reads)
        nl_d = dev.map_batch(reads)
        for a, b in zip(nl_h, nl_d):
            assert np.array_equal(a, b)
        ph = host.execute_batch(nl_h, mode, 2, df, pf)
        pd = dev.execute_batch(nl_d, mode, 2, df, pf)

        def norm(p):
            def third(t):
                v = t[2]
                if isinstance(v, np.ndarray):
                    return v.tolist()
                return [list(x) if isinstance(x, (list, np.ndarray)) else x
                        for x in v]
            return [[(t[0], t[1], third(t))
                     if isinstance(t, tuple) and len(t) == 3 else t
                     for t in seq_r] for seq_r in p]
        assert norm(ph) == norm(pd)


class TestJsonOutput:
    def test_to_json_shape(self):
        ag = make_annotated([b"ACGTACGTAGGA"], 5)
        from metagraph_tpu.query.results import QuerySequence, SeqSearchResult
        import json
        res = SeqSearchResult(QuerySequence(0, "q", "ACGTACGTAGGA"), "matches",
                              ag.get_top_labels(b"ACGTACGTAGGA", 10, 1.0))
        obj = json.loads(res.to_json())
        assert obj["seq_description"] == "q"
        assert obj["results"][0]["sample"] == "seq0"
        assert obj["results"][0]["kmer_count"] == 8


class TestCanonicalGraphQuery:
    """Canonical-mode graphs must give strand-independent node mapping and
    labels (ref sequence_graph.hpp:49-55: map the canonical form)."""

    @pytest.fixture(scope="class")
    def ag(self):
        rng = np.random.default_rng(11)
        seqs = ["".join(rng.choice(list("ACGT"), size=120)).encode()
                for _ in range(4)]
        g = DBGSuccinct.build(seqs, 11, mode="canonical")
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for i, s in enumerate(seqs):
            ag.annotate_sequence(s, [f"s{i}"])
        ag._seqs = seqs
        return ag

    @staticmethod
    def _rc(s):
        return s.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]

    def test_map_strand_independent(self, ag):
        s = ag._seqs[0]
        f = ag.graph.map_to_nodes(s)
        r = ag.graph.map_to_nodes(self._rc(s))[::-1]
        assert (f > 0).all()
        np.testing.assert_array_equal(f, r)

    def test_labels_on_rc_read(self, ag):
        s = ag._seqs[2]
        assert ag.get_labels(s, 1.0) == ["s2"]
        assert ag.get_labels(self._rc(s), 1.0) == ["s2"]

    def test_engine_map_batch_matches_host(self, ag):
        eng = QueryEngine(ag)
        for s in (ag._seqs[1], self._rc(ag._seqs[1])):
            np.testing.assert_array_equal(eng.map_batch([s])[0],
                                          ag.graph.map_to_nodes(s))

    def test_device_pipeline_matches_host(self, ag):
        from metagraph_tpu.query.device import DeviceQueryPipeline
        dp = DeviceQueryPipeline(ag.graph, ag.annotator)
        reads = [ag._seqs[0], self._rc(ag._seqs[0]), ag._seqs[3]]
        res = dp.query_labels(reads, "matches", discovery_fraction=1.0)
        eng = QueryEngine(ag)
        host = [eng.execute(n, "matches", discovery_fraction=1.0)
                for n in eng.map_batch(reads)]
        assert [r for r in res] == host


@pytest.mark.anchors
class TestQueryCountsConformance:
    """ref integration_tests/test_query.py TestQueryCounts (:640-830):
    counts-sum and counts query modes against brute-force expectations,
    and the coords byte anchors on transcripts_100."""

    KC1 = {'AAA': 1, 'AAC': 2, 'ACC': 3, 'CCC': 4, 'CCG': 5, 'CGG': 6,
           'GGG': 7, 'GGT': 8, 'GTT': 9, 'TTT': 10, 'TTA': 11, 'TAA': 12}
    KC2 = {'AAA': 11, 'AAC': 12, 'ACC': 13, 'CCC': 14, 'CCG': 15, 'CGG': 16,
           'GGG': 17, 'GGT': 18, 'GTT': 19, 'TTT': 20}
    QUERIES = ['AAA', 'AAAA', 'AAAAAAAAAAAAA', 'CCC', 'CCCC',
               'CCCCCCCCCCCCC', 'TTT', 'AAACCCGGGTTT', 'AAACCCGGGTTTTTT',
               'AAACCCGGGTTTAAA', 'TTTAAACCCGGG', 'ACACACACACACATTTAAACCCGGG']

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        d = tmp_path_factory.mktemp("qc")
        f1, f2 = str(d / "file_1.fa"), str(d / "file_2.fa")
        with open(f1, "w") as f:
            for km, c in self.KC1.items():
                f.write(f">L1\n{km}\n" * c)
        with open(f2, "w") as f:
            for km, c in self.KC2.items():
                f.write(f">L2\n{km}\n" * c)
        from metagraph_tpu.seq_io.fasta import read_fasta
        seqs = [r.seq for r in read_fasta(f1)] + [r.seq for r in read_fasta(f2)]
        g = DBGSuccinct.build(seqs, 3)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for path, recs in ((f1, read_fasta(f1)), (f2, read_fasta(f2))):
            for r in recs:
                ag.annotate_sequence(r.seq, [path])
                ag.annotate_kmer_counts(r.seq, [path])
        return ag, f1, f2

    def expected(self, mode, discovery):
        import math
        out = []
        for i, s in enumerate(self.QUERIES):
            nk = len(s) - 2
            line = [f"{i}", f"s{i}"]
            for counts, label in ((self.KC1, "F1"), (self.KC2, "F2")):
                per = [counts.get(s[j:j + 3], 0) for j in range(nk)]
                n = sum(1 for c in per if c > 0)
                if n >= discovery * nk:
                    if mode == "counts-sum":
                        line.append(f"<{label}>:{sum(per)}")
                    else:
                        line.append(f"<{label}>:" + ":".join(map(str, per)))
            out.append(line)
        return out

    @pytest.mark.parametrize("discovery", [0.0, 0.25, 0.5, 0.75, 1.0])
    @pytest.mark.parametrize("mode", ["counts-sum", "counts"])
    def test_counts_modes(self, setup, mode, discovery):
        from metagraph_tpu.query.pipeline import QueryEngine
        from metagraph_tpu.seq_io.fasta import FastaRecord
        ag, f1, f2 = setup
        eng = QueryEngine(ag)
        recs = [FastaRecord(f"s{i}", s.encode())
                for i, s in enumerate(self.QUERIES)]
        got = []
        for res in eng.query_records(recs, mode, 2 ** 63, discovery, 0.0):
            got.append(res.to_string(verbose=(mode == "counts"))
                       .replace(f"<{f1}>", "<F1>").replace(f"<{f2}>", "<F2>")
                       .split("\t"))
        exp = self.expected(mode, discovery)
        assert len(got) == len(exp)
        for g_line, e_line in zip(got, exp):
            assert sorted(g_line) == sorted(e_line), (g_line, e_line)


@pytest.mark.anchors
class TestQueryCoordsByteAnchors:
    """ref test_query.py:359-404: coords-mode stdout byte counts on
    transcripts_100 (collapsed and --verbose-output expanded)."""

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        import subprocess
        import sys
        import os
        d = str(tmp_path_factory.mktemp("qcoords"))
        env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")

        def run(argv):
            r = subprocess.run([sys.executable, "-m", "metagraph_tpu.cli"]
                               + argv, capture_output=True, text=True,
                               env=env, cwd=d)
            assert r.returncode == 0, r.stderr
            return r
        fa = "/root/reference/metagraph/tests/data/transcripts_100.fa"
        run(["build", "-k", "20", "-o", "graph", fa])
        run(["annotate", "-i", "graph.dbg.npz", "--anno-header",
             "--coordinates", "-o", "anno", fa])
        return d, run, fa

    @pytest.mark.parametrize("fraction,verbose,expected", [
        (0.05, False, 139268), (0.95, False, 31522),
        (0.05, True, 1619883), (0.95, True, 492788)])
    def test_byte_counts(self, setup, fraction, verbose, expected):
        d, run, fa = setup
        argv = ["query", "--query-mode", "coords", "-i", "graph.dbg.npz",
                "-a", "anno.column.annodbg",
                "--min-kmers-fraction-label", str(fraction), fa]
        if verbose:
            argv.insert(3, "--verbose-output")
        r = run(argv)
        assert len(r.stdout.encode()) == expected
