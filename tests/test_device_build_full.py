"""Full single-chip device BOSS construction (succinct/device_build.py r5)
vs the host pipeline — arrays must be bit-identical.
(ref boss_chunk_construct.cpp:341-462 construct_boss_chunk semantics)"""

import numpy as np
import pytest

from metagraph_tpu import native
from metagraph_tpu.kmer.extractor import KmerExtractor
from metagraph_tpu.succinct.construct import build_boss_arrays
from metagraph_tpu.succinct.device_build import device_build_boss_arrays

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native lib unavailable")


def _host(seqs, K):
    kmers, _ = KmerExtractor().extract(seqs, K, mode="basic")
    return build_boss_arrays(kmers)


def _check(seqs, K, **kw):
    want = _host(seqs, K)
    got = device_build_boss_arrays(seqs, K, **kw)
    assert got is not None
    for f in ("W", "last", "valid", "F"):
        np.testing.assert_array_equal(getattr(got, f), getattr(want, f),
                                      err_msg=f"{f} K={K}")
    assert got.k == want.k


class TestDeviceBuildFull:
    def test_random_with_ns(self):
        rng = np.random.default_rng(5)
        for K in (3, 11, 16, 17, 20, 21):
            seqs = ["".join(rng.choice(list("ACGTN"), size=int(n),
                                       p=[.24, .24, .24, .24, .04])).encode()
                    for n in rng.integers(1, 900, size=40)]
            _check(seqs, K)

    def test_overflow_regrows_compact_buffer(self):
        # many disconnected reads -> many dummy source/sink nodes; a tiny
        # capd must regrow transparently and still match the host arrays
        rng = np.random.default_rng(9)
        seqs = ["".join(rng.choice(list("ACGT"), size=40)).encode()
                for _ in range(300)]
        _check(seqs, 20, capd=64)

    def test_transcripts_anchor(self):
        from metagraph_tpu.seq_io.fasta import read_fasta
        recs = read_fasta(
            "/root/reference/metagraph/tests/data/transcripts_100.fa")
        seqs = [r.seq for r in recs]
        _check(seqs, 20)

    def test_out_of_scope_returns_none(self):
        seqs = [b"ACGTACGTACGTACGTACGTACGTACGT"]
        assert device_build_boss_arrays(seqs, 22) is None  # K > 21

    def test_dbg_succinct_device_flag(self):
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        rng = np.random.default_rng(3)
        seqs = ["".join(rng.choice(list("ACGT"), size=200)).encode()
                for _ in range(20)]
        g1 = DBGSuccinct.build(seqs, 15)
        g2 = DBGSuccinct.build(seqs, 15, device=True)
        assert g1.num_nodes() == g2.num_nodes()
        assert np.array_equal(g1.boss.W, g2.boss.W)
        assert np.array_equal(g1.boss.last, g2.boss.last)
