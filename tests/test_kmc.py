"""KMC database reader tests (anchors: integration_tests/test_build.py
test_build_from_kmc*: 469983 / 802920 nodes)."""

import numpy as np
import pytest

from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
from metagraph_tpu.seq_io.kmc import KMCDatabase, read_kmers

DB1 = "/root/reference/metagraph/tests/data/transcripts_1000_kmc_counters.kmc_suf"
DB2 = ("/root/reference/metagraph/tests/data/"
       "transcripts_1000_kmc_counters_both_strands.kmc_suf")


class TestKMCReader:
    def test_header(self):
        db = KMCDatabase(DB1)
        assert db.k == 11
        assert db.total_kmers == 469983
        assert not db.both_strands
        db2 = KMCDatabase(DB2)
        assert db2.total_kmers == 401460
        assert db2.both_strands

    def test_kmers_sorted_unique(self):
        db = KMCDatabase(DB1)
        chars, counts = db.kmers_and_counts()
        assert chars.shape == (469983, 11)
        assert (counts >= 1).all()
        assert set(np.unique(chars)) <= set(b"ACGT")


@pytest.mark.anchors
class TestKMCBuildAnchors:
    def test_basic_from_single_strand(self):
        chars, counts, k = read_kmers(DB1, both_from_canonical=True)
        g = DBGSuccinct.build([chars[i].tobytes() for i in range(len(chars))], k)
        assert g.num_nodes() == 469983

    def test_basic_from_both_strands(self):
        chars, counts, k = read_kmers(DB2, both_from_canonical=True)
        g = DBGSuccinct.build([chars[i].tobytes() for i in range(len(chars))], k)
        assert g.num_nodes() == 802920

    def test_canonical_from_single_strand(self):
        chars, counts, k = read_kmers(DB1, both_from_canonical=False)
        g = DBGSuccinct.build([chars[i].tobytes() for i in range(len(chars))],
                              k, mode="canonical")
        assert g.num_nodes() == 802920
