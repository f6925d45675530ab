"""Seed chaining (--align-chain) tests
(ref aligner_chainer.cpp chain_seeds / call_seed_chains_both_strands,
dbg_aligner.cpp:546-640 coordinate requirement)."""

import numpy as np
import pytest

from metagraph_tpu.align.aligner import DBGAligner
from metagraph_tpu.align.config import AlignerConfig
from metagraph_tpu.align.seed_chainer import (Anchor, align_chained_seeds,
                                              chain_seeds)
from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
from metagraph_tpu.annotation.column import ColumnMajorAnnotation
from metagraph_tpu.graph.dbg_succinct import DBGSuccinct


def make_setup(sources, k=11, seed=3):
    g = DBGSuccinct.build([s.encode() for s in sources], k)
    anno = ColumnMajorAnnotation(g.max_index())
    ag = AnnotatedDBG(g, anno)
    for i, s in enumerate(sources):
        ag.annotate_kmer_coords(s.encode(), [f"lab{i}"], 0)
    cfg = AlignerConfig(min_seed_length=k, num_alternative_paths=1)
    return g, ag, DBGAligner(g, cfg)


@pytest.fixture(scope="module")
def src():
    rng = np.random.default_rng(3)
    return "".join(rng.choice(list("ACGT"), size=300))


class TestChainSeedsDP:
    def test_colinear_anchors_chain(self):
        cfg = AlignerConfig(min_seed_length=19)
        # two colinear anchors: same diagonal, 20 apart
        anchors = [Anchor(0, 100, 0, 19, 19, 0),
                   Anchor(0, 120, 20, 39, 19, 1)]
        table, bt = chain_seeds(cfg, 50, anchors)
        # sorted descending coord: table[0] = coord 120
        assert table[0].coord == 120
        assert bt[1] == 0                     # low-coord anchor chains back
        assert table[1].score == 19 + 19      # no gap penalty on diagonal

    def test_offdiagonal_penalty(self):
        cfg = AlignerConfig(min_seed_length=19)
        anchors = [Anchor(0, 100, 0, 19, 19, 0),
                   Anchor(0, 130, 20, 39, 19, 1)]   # coord gap 10 > query gap
        table, bt = chain_seeds(cfg, 80, anchors)
        assert bt[1] == 0
        assert table[1].score < 38            # penalized

    def test_labels_not_crossed(self):
        cfg = AlignerConfig(min_seed_length=19)
        anchors = [Anchor(0, 100, 0, 19, 19, 0),
                   Anchor(1, 120, 20, 39, 19, 1)]
        table, bt = chain_seeds(cfg, 50, anchors)
        assert bt == [-1, -1]


class TestAlignChainedSeeds:
    def test_insertion_chain(self, src):
        g, ag, aligner = make_setup([src])
        q = src[40:90] + "TTTTT" + src[90:140]
        alns = align_chained_seeds(aligner, ag, q.encode())
        assert len(alns) == 1
        a = alns[0]
        assert a.label_columns == [0]
        assert b"$" in a.sequence             # spliced junction
        assert a.cigar.get_clipping() == 0 and a.cigar.get_end_clipping() == 0

    def test_deletion_chain(self, src):
        g, ag, aligner = make_setup([src])
        q = src[40:90] + src[120:170]
        alns = align_chained_seeds(aligner, ag, q.encode())
        assert len(alns) == 1
        assert alns[0].cigar.to_string() == "51=9G49="

    def test_rc_strand(self, src):
        g, ag, aligner = make_setup([src])
        comp = str.maketrans("ACGT", "TGCA")
        q = (src[40:90] + "TTTTT" + src[90:140]).translate(comp)[::-1]
        alns = align_chained_seeds(aligner, ag, q.encode())
        assert len(alns) == 1
        assert alns[0].orientation

    def test_label_selection(self, src):
        rng = np.random.default_rng(7)
        src2 = "".join(rng.choice(list("ACGT"), size=200))
        g, ag, aligner = make_setup([src, src2])
        q = src2[30:80] + src2[100:150]
        alns = align_chained_seeds(aligner, ag, q.encode())
        assert len(alns) == 1
        assert [ag.annotator.encoder.decode(c)
                for c in alns[0].label_columns] == ["lab1"]

    def test_low_exact_match_rejected(self, src):
        g, ag, aligner = make_setup([src])
        aligner.config.min_exact_match = 0.99
        q = src[40:90] + "TTTTTTTTTTTTTTTTTTTT" + src[90:140]
        alns = align_chained_seeds(aligner, ag, q.encode())
        assert alns == []


class TestCLIChain:
    def test_requires_coordinates(self, tmp_path, monkeypatch, capsys):
        from metagraph_tpu.cli.main import main
        fa = tmp_path / "in.fa"
        fa.write_text(">s\nACGTACGTACGTACGTACGTACGT\n")
        monkeypatch.chdir(tmp_path)
        main(["build", "-k", "11", "-o", "g", str(fa)])
        with pytest.raises(SystemExit):
            main(["align", "-i", "g.dbg.npz", "--align-chain", str(fa)])
        assert "coordinates" in capsys.readouterr().err
