"""Alignment tests (anchors from integration_tests/test_align.py:27-100)."""

import numpy as np
import pytest

from metagraph_tpu.align.aligner import DBGAligner, format_alignments_tsv
from metagraph_tpu.align.alignment import revcomp
from metagraph_tpu.align.config import AlignerConfig
from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
from metagraph_tpu.seq_io.fasta import read_fasta

REF = "/root/reference/metagraph/tests/data"


def make_aligner(seqs, k, **cfg_kw):
    g = DBGSuccinct.build(seqs, k)
    return DBGAligner(g, AlignerConfig(**cfg_kw))


class TestBasicAlignment:
    def test_exact_match(self):
        s = b"ACGTAGCTAGCATCAGTCATGCA"
        al = make_aligner([s], 11, forward_and_reverse_complement=False)
        alns = al.align(s)
        assert len(alns) == 1
        a = alns[0]
        # full match: len * 2 + both end bonuses
        assert a.score == len(s) * 2 + 10
        assert a.cigar.to_string() == f"{len(s)}="
        assert a.sequence == s

    def test_single_mismatch_middle(self):
        s = b"ACGTAGCTAGCATCAGTCATGCAAGGCTAGCA"
        q = bytearray(s)
        q[15] = ord("T") if q[15] != ord("T") else ord("A")
        al = make_aligner([s], 11, forward_and_reverse_complement=False)
        alns = al.align(bytes(q))
        assert len(alns) == 1
        a = alns[0]
        assert a.sequence == s
        assert a.cigar.get_num_matches() == len(s) - 1
        assert a.score == (len(s) - 1) * 2 - 3 + 10

    def test_no_match(self):
        al = make_aligner([b"AAAAAAAACCCCCCCCC"], 11,
                          forward_and_reverse_complement=False,
                          min_exact_match=0.0)
        alns = al.align(b"GGGGGGTTTTTTGGGGGG")
        assert alns == []

    def test_reverse_complement_strand(self):
        s = b"ACGTAGCTAGCATCAGTCATGCAAGGCTAGCA"
        al = make_aligner([s], 11)
        alns = al.align(revcomp(s))
        assert alns
        assert alns[0].orientation
        assert alns[0].cigar.get_num_matches() == len(s)

    def test_insertion_in_query(self):
        s = b"ACGTAGCTAGCATCAGTCATGCAAGGCTAGCATG"
        q = s[:16] + b"T" + s[16:]
        al = make_aligner([s], 11, forward_and_reverse_complement=False)
        alns = al.align(q)
        assert alns
        a = alns[0]
        assert "I" in a.cigar.to_string()
        assert a.score == len(s) * 2 - 6 + 10

    def test_deletion_in_query(self):
        s = b"ACGTAGCTAGCATCAGTCATGCAAGGCTAGCATG"
        q = s[:16] + s[17:]
        al = make_aligner([s], 11, forward_and_reverse_complement=False)
        alns = al.align(q)
        assert alns
        a = alns[0]
        assert "D" in a.cigar.to_string()
        assert a.score == (len(s) - 1) * 2 - 6 + 10


@pytest.mark.anchors
class TestAlignAnchors:
    """ref integration_tests/test_align.py test_simple_align_all_graphs."""

    @pytest.fixture(scope="class")
    def mt_graph(self):
        recs = read_fasta(f"{REF}/genome.MT.fa")
        g = DBGSuccinct.build([r.seq for r in recs], 11)
        assert g.num_nodes() == 16438
        return g

    def test_align_only_forwards_anchors(self, mt_graph):
        cfg = AlignerConfig(min_exact_match=0.0,
                            forward_and_reverse_complement=False)
        aligner = DBGAligner(mt_graph, cfg)
        reads = read_fasta(f"{REF}/genome_MT1.fq")
        lines = []
        for rec in reads:
            alns = aligner.align(rec.seq)
            lines.append(format_alignments_tsv(rec.name, rec.seq, alns,
                                               cfg.min_path_score).rstrip("\n"))
        assert len(lines) == 7
        assert lines[0] == ("MT-10/1\t" + reads[0].seq.decode()
                            + "\t+\tTAGAATCTTAG\t22\t11\t19S11=120S\t0")
        for i in (1, 2, 4):
            fields = lines[i].split("\t")
            assert fields[4] == "310"
            assert fields[6] == "150="
        assert lines[3].endswith("\t*\t*\t0\t*\t*\t*")
        assert lines[5].split("\t")[4] == "22"

    def test_map_mode_anchors(self, mt_graph):
        reads = read_fasta(f"{REF}/genome_MT1.fq")
        expect = ["1/140/1", "140/140/140", "140/140/140", "0/140/0",
                  "140/140/140", "1/140/1", "1/140/1"]
        for rec, e in zip(reads, expect):
            nodes = mt_graph.map_to_nodes(rec.seq)
            matched = int((nodes > 0).sum())
            uniq = len(set(nodes[nodes > 0].tolist()))
            assert f"{matched}/{len(nodes)}/{uniq}" == e


class TestPallasSW:
    def test_kernel_matches_oracle(self):
        from metagraph_tpu.align.pallas_sw import (
            batch_local_align_scores, reference_local_align_score)
        rng = np.random.default_rng(0)
        B, LQ, LR = 12, 48, 64
        qs = rng.integers(0, 4, size=(B, LQ)).astype(np.int32)
        rs = rng.integers(0, 4, size=(B, LR)).astype(np.int32)
        for b in range(0, B, 3):
            rs[b, 5:35] = qs[b, 2:32]
        qs[1, 40:] = -1
        got = batch_local_align_scores(qs, rs, interpret=True)
        want = [reference_local_align_score(qs[b], rs[b]) for b in range(B)]
        np.testing.assert_array_equal(got, want)


class TestLabeledExtension:
    """In-extension label pruning (ref aligner_labeled.cpp:81-137):
    extensions never cross label boundaries."""

    @pytest.fixture(scope="class")
    def setup(self):
        import numpy as np
        from metagraph_tpu.annotation.column import ColumnMajorAnnotation
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        rng = np.random.default_rng(9)
        a = "".join(rng.choice(list("ACGT"), size=60))
        shared = "".join(rng.choice(list("ACGT"), size=30))
        b1 = "".join(rng.choice(list("ACGT"), size=60))
        b2 = "".join(rng.choice(list("ACGT"), size=60))
        # two labels share a prefix path then diverge
        s1 = (a + shared + b1).encode()
        s2 = (a + shared + b2).encode()
        g = DBGSuccinct.build([s1, s2], 11)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        ag.annotate_sequence(s1, ["L1"])
        ag.annotate_sequence(s2, ["L2"])
        return ag, s1, s2

    def test_alignment_labels_are_path_intersection(self, setup):
        from metagraph_tpu.align.aligner import LabeledAligner
        ag, s1, s2 = setup
        aligner = LabeledAligner(ag)
        alns = aligner.align(s1[40:120])
        assert alns
        labels = [ag.annotator.encoder.decode(c)
                  for c in alns[0].label_columns]
        assert labels == ["L1"]

    def test_shared_region_has_both_labels(self, setup):
        from metagraph_tpu.align.aligner import LabeledAligner
        ag, s1, s2 = setup
        aligner = LabeledAligner(ag)
        alns = aligner.align(s1[20:80])   # inside a + shared prefix
        assert alns
        labels = sorted(ag.annotator.encoder.decode(c)
                        for c in alns[0].label_columns)
        assert labels == ["L1", "L2"]

    def test_extension_stops_at_label_boundary(self, setup):
        """A read spelling label-L1 path but seeded in the shared region must
        not extend into L2-only nodes when labels diverge."""
        import numpy as np
        from metagraph_tpu.align.labeled import (AnnotationBuffer,
                                                 LabeledExtender)
        from metagraph_tpu.align.config import AlignerConfig
        ag, s1, s2 = setup
        buffer = AnnotationBuffer(ag)
        cfg = AlignerConfig(min_seed_length=11)
        ext = LabeledExtender(ag.graph, cfg, s1[40:120], buffer)
        # every produced extension must have a nonempty label set
        from metagraph_tpu.align.aligner import LabeledAligner
        alns = LabeledAligner(ag, cfg).align(s1[40:120])
        for a in alns:
            assert a.label_columns
            mask = buffer.intersect_path(a.nodes)
            assert mask


@pytest.mark.anchors
class TestCoordToHeader:
    """ref integration_tests/test_align.py TestAlignCoordToHeader: the .seqs
    index resolves global coords to per-sequence header:start-end ranges."""

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        from metagraph_tpu.cli.main import main
        d = tmp_path_factory.mktemp("cth")
        (d / "seqs.fa").write_text(
            ">seq1\nGTATCGATCG\n>seq2\nGCTAGCTAGCTAGCTA\n"
            ">seq3\nATCGATCGAAAAACCCCCGGGGGTTTTT\n")
        (d / "query.fa").write_text(
            ">query1\nTATCGATCG\n>query2\nGCTAGCTAGCTAG\n"
            ">query3\nAAAAACCCCC\n")
        import os
        cwd = os.getcwd()
        os.chdir(d)
        try:
            main(["build", "-k", "5", "-o", "g", "seqs.fa"])
            main(["annotate", "-i", "g.dbg.npz", "--coordinates",
                  "--index-header-coords", "-o", "a", "seqs.fa"])
        finally:
            os.chdir(cwd)
        return d

    def run_align(self, d, extra=()):
        import os
        import io
        import contextlib
        from metagraph_tpu.cli.main import main
        cwd = os.getcwd()
        os.chdir(d)
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                main(["align", "--align-only-forwards", "-i", "g.dbg.npz",
                      "-a", "a.column.annodbg.npz", *extra, "query.fa"])
        finally:
            os.chdir(cwd)
        return [line.split("\t") for line in
                buf.getvalue().rstrip().split("\n")]

    def test_seqs_maps_coords_to_headers(self, setup):
        rows = self.run_align(setup)
        assert rows[0][8] == "seq1:2-10"     # ref test_align.py:505
        assert rows[1][8] == "seq2:1-13"     # ref test_align.py:513
        assert rows[2][8] == "seq3:9-18"     # ref test_align.py:521
        assert [r[6] for r in rows] == ["9=", "13=", "10="]

    def test_no_coord_mapping(self, setup):
        rows = self.run_align(setup, ("--no-coord-mapping",))
        # global file offsets (ref test_align.py:540-552)
        assert rows[0][8] == "seqs.fa:2-10"
        assert rows[1][8] == "seqs.fa:7-19"
        assert rows[2][8] == "seqs.fa:27-36"


class TestAggregatorLabelBuckets:
    """Per-label top-k buckets (ref aligner_aggregator.hpp:25-138)."""

    def _aln(self, score, labels=(), node=1):
        from metagraph_tpu.align.alignment import Alignment
        from metagraph_tpu.align.cigar import Cigar
        c = Cigar()
        c.append("=", 5)
        return Alignment(query=b"ACGTA", nodes=[node], sequence=b"ACGTA",
                         score=score, cigar=c,
                         label_columns=list(labels))

    def test_per_label_topk(self):
        from metagraph_tpu.align.aligner import AlignmentAggregator
        from metagraph_tpu.align.config import AlignerConfig
        cfg = AlignerConfig(num_alternative_paths=1, rel_score_cutoff=0.0)
        agg = AlignmentAggregator(cfg)
        # one queue per label: the best alignment of EACH label survives
        assert agg.add(self._aln(10, [0], node=1))
        assert agg.add(self._aln(8, [1], node=2))   # worse globally, kept
        assert not agg.add(self._aln(7, [1], node=3))  # label 1 bucket full
        out = agg.get_alignments()
        assert sorted(a.score for a in out) == [8, 10]

    def test_shared_alignment_emitted_once(self):
        from metagraph_tpu.align.aligner import AlignmentAggregator
        from metagraph_tpu.align.config import AlignerConfig
        cfg = AlignerConfig(num_alternative_paths=2, rel_score_cutoff=0.0)
        agg = AlignmentAggregator(cfg)
        agg.add(self._aln(10, [0, 1], node=1))
        agg.add(self._aln(9, [0], node=2))
        out = agg.get_alignments()
        assert [a.score for a in out] == [10, 9]

    def test_label_cutoff(self):
        from metagraph_tpu.align.aligner import AlignmentAggregator
        from metagraph_tpu.align.config import AlignerConfig
        from metagraph_tpu.align.config import NINF
        cfg = AlignerConfig(num_alternative_paths=1, rel_score_cutoff=0.0)
        agg = AlignmentAggregator(cfg)
        agg.add(self._aln(10, [0], node=1))
        # label 0 bucket is full -> cutoff is its min; label 1 empty -> NINF
        assert agg.get_score_cutoff([0]) == 10
        assert agg.get_score_cutoff([1]) == max(NINF,
                                                agg.get_global_cutoff())


class TestWaveExtenderParity:
    """Wave-parallel extender and lockstep batch driver reproduce the inline
    extender's alignments exactly (scores, CIGARs, orientations)."""

    def _noisy_reads(self, recs, n_reads, rate, seed=5):
        import random
        random.seed(seed)
        reads = []
        while len(reads) < n_reads:
            src = random.choice(recs).seq
            if len(src) < 160:
                continue
            a = random.randrange(0, len(src) - 150)
            s = bytearray(src[a:a + 150])
            for i in range(len(s)):
                if random.random() < rate:
                    s[i] = random.choice(b"ACGT")
            reads.append(bytes(s))
        return reads

    def test_batch_matches_sequential(self):
        from metagraph_tpu.seq_io.fasta import read_fasta
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        recs = read_fasta(
            "/root/reference/metagraph/tests/data/transcripts_100.fa")
        g = DBGSuccinct.build([r.seq for r in recs], 20)
        reads = self._noisy_reads(recs, 12, 0.08)
        al = DBGAligner(g, AlignerConfig(num_alternative_paths=2))

        def key(rs):
            return [[(a.score, a.cigar.to_string(), a.orientation)
                     for a in r] for r in rs]
        seq = [al.align(r) for r in reads]
        assert key(al.align_batch(reads)) == key(seq)
        assert key(al.align_batch(reads, backend="device")) == key(seq)
        # fork-based host fan-out (aligner -p): byte-identical results
        assert key(al.align_batch(reads, processes=3)) == key(seq)
        # the numpy engine (native disabled) is the bit-exact oracle
        import metagraph_tpu.align.flat as _flat
        saved = _flat._nlib
        _flat._nlib = False
        try:
            assert key(al.align_batch(reads)) == key(seq)
        finally:
            _flat._nlib = saved

    def test_wave_extender_matches_inline(self):
        from metagraph_tpu.align.extender import DefaultColumnExtender
        from metagraph_tpu.align.wave_extender import WaveExtender
        from metagraph_tpu.seq_io.fasta import read_fasta
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        recs = read_fasta(
            "/root/reference/metagraph/tests/data/transcripts_100.fa")
        g = DBGSuccinct.build([r.seq for r in recs], 20)
        reads = self._noisy_reads(recs, 8, 0.15, seed=9)
        outs = []
        for cls in (DefaultColumnExtender, WaveExtender):
            al = DBGAligner(g, AlignerConfig(), extender_class=cls)
            outs.append([[(a.score, a.cigar.to_string(), a.orientation)
                          for a in al.align(r)] for r in reads])
        assert outs[0] == outs[1]


class TestScoringKnobs:
    """CLI-exposed scoring variants (ref config.hpp:114-145, --align-*)."""

    SEQ = b"ACGTAGCTAGCATCAGTCATGCAAGGCTAGCA"

    def _one_mismatch(self):
        q = bytearray(self.SEQ)
        q[15] = ord("T") if q[15] != ord("T") else ord("A")
        return bytes(q)

    def test_edit_distance_unit_costs(self):
        # unit costs: match +1, mismatch -1 (ref unit_scoring_matrix)
        al = make_aligner([self.SEQ], 11, edit_distance=True,
                          forward_and_reverse_complement=False)
        a = al.align(self._one_mismatch())[0]
        assert a.cigar.get_num_matches() == len(self.SEQ) - 1
        assert a.score == (len(self.SEQ) - 1) * 1 - 1 + 10

    def test_custom_match_and_mismatch_scores(self):
        al = make_aligner([self.SEQ], 11, match_score_val=3, transition=-5,
                          transversion=-5,
                          forward_and_reverse_complement=False)
        a = al.align(self._one_mismatch())[0]
        assert a.score == (len(self.SEQ) - 1) * 3 - 5 + 10

    def test_end_bonus(self):
        al = make_aligner([self.SEQ], 11, left_end_bonus=7, right_end_bonus=7,
                          forward_and_reverse_complement=False)
        a = al.align(self.SEQ)[0]
        assert a.score == len(self.SEQ) * 2 + 14


class TestProteinAlignment:
    """BLOSUM62 scoring over Protein graphs (ref aligner_config.cpp:146-152,
    207-254; no reverse-complement pass for amino acids)."""

    @pytest.fixture(scope="class")
    def pgraph(self):
        from metagraph_tpu.seq_io.fasta import read_fasta
        from metagraph_tpu.kmer.alphabets import PROTEIN
        EX = "/root/reference/metagraph/examples/data"
        recs = read_fasta(f"{EX}/test_Protein_sequences.fa")
        g = DBGSuccinct.build([r.seq for r in recs], 20, alphabet=PROTEIN)
        return g, recs

    def test_exact_protein_alignment(self, pgraph):
        from metagraph_tpu.align.config import blosum62_scoring_matrix
        g, recs = pgraph
        cfg = AlignerConfig(protein=True)
        assert not cfg.forward_and_reverse_complement
        al = DBGAligner(g, cfg)
        q = recs[0].seq[5:45]
        a = al.align(q)[0]
        assert a.cigar.to_string() == f"{len(q)}="
        m = blosum62_scoring_matrix()
        qa = np.frombuffer(q, dtype=np.uint8)
        assert a.score == int(m[qa, qa].sum()) + \
            cfg.left_end_bonus + cfg.right_end_bonus

    def test_protein_mismatch_blosum_score(self, pgraph):
        g, recs = pgraph
        cfg = AlignerConfig(protein=True)
        al = DBGAligner(g, cfg)
        q = bytearray(recs[0].seq[5:45])
        orig = q[20]
        q[20] = ord("W") if orig != ord("W") else ord("A")
        a = al.align(bytes(q))[0]
        assert "X" in a.cigar.to_string()
        # batch path byte-identical to the sequential one
        b = al.align_batch([bytes(q)])[0][0]
        assert (b.cigar.to_string(), b.score) == (a.cigar.to_string(), a.score)

    def test_blosum62_values(self):
        from metagraph_tpu.align.config import blosum62_scoring_matrix
        m = blosum62_scoring_matrix()
        # spot values from the published BLOSUM62 table
        assert m[ord("W"), ord("W")] == 11
        assert m[ord("A"), ord("A")] == 4
        assert m[ord("W"), ord("A")] == -3
        assert m[ord("J"), ord("J")] == 1        # unknown letters: diag +1
        assert m[ord("J"), ord("A")] == -4


class TestCaseSensitiveAlignment:
    """Review regression: batch alignment on DNA_CASE graphs (char_idx
    wildcard crash + case-folding of query/graph chars)."""

    def test_dna_case_batch_align(self):
        rng = np.random.default_rng(2)
        seq = "".join(rng.choice(list("ACGTacgt"), 200)).encode()
        from metagraph_tpu.kmer.alphabets import DNA_CS
        g = DBGSuccinct.build([seq], 11, alphabet=DNA_CS)
        al = DBGAligner(g, AlignerConfig(min_seed_length=11))
        assert not al.config.forward_and_reverse_complement
        r = al.align_batch([seq[20:80]])
        assert r[0] and r[0][0].cigar.to_string() == "60="
        q = bytearray(seq[20:80])
        q[30] = ord("A") if q[30] != ord("A") else ord("C")
        r2 = al.align_batch([bytes(q)])
        assert r2[0] and r2[0][0].cigar.to_string() == "30=1X29="


def test_pool_unpicklable_seeder_falls_back():
    """A locally created seeder class can't pickle into the forkserver
    pool; align_batch must degrade to single-process, not raise."""
    from metagraph_tpu.align.aligner import DBGAligner
    from metagraph_tpu.align.config import AlignerConfig
    from metagraph_tpu.align.seeder import ExactSeeder, make_suffix_seeder
    from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
    g = DBGSuccinct.build([b"ACGTACCCGGTTAGCAGTACGTTTACGCAT" * 3], 11)
    local_cls = make_suffix_seeder(ExactSeeder)     # unpicklable qualname
    al = DBGAligner(g, AlignerConfig(), seeder_class=local_cls)
    reads = [b"ACGTACCCGGTTAGCAGT", b"CAGTACGTTTACGCATAC"]
    res_pool = al.align_batch(reads, processes=2)
    res_serial = al.align_batch(reads)
    assert [[(a.score, a.cigar.to_string()) for a in r] for r in res_pool] \
        == [[(a.score, a.cigar.to_string()) for a in r] for r in res_serial]
    al.close_pool()
