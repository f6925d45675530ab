"""K-mer packing / extraction unit tests (ref tests/test_kmer*.cpp semantics)."""

import numpy as np
import pytest

from metagraph_tpu.kmer import packing
from metagraph_tpu.kmer.alphabets import DNA
from metagraph_tpu.kmer.extractor import KmerExtractor


def enc(s):
    return KmerExtractor(DNA).encode(s)


class TestPacking:
    def test_pack_roundtrip(self):
        rng = np.random.default_rng(0)
        for K in (2, 5, 16, 17, 31, 35, 63):
            chars = rng.integers(0, 5, size=(100, K), dtype=np.uint8)
            order = packing.boss_priority_order(K)
            packed = packing.pack_codes(chars, order)
            back = packing.unpack_codes(packed, K, order)
            np.testing.assert_array_equal(chars, back)

    def test_boss_order_matches_reference_semantics(self):
        # one-swapped co-lex: ACG < ACT by label; TA$ ordering dominated by
        # second-to-last char first.  For edge strings s[0..K-1] the priority is
        # s[K-2], ..., s[0], s[K-1]  (ref kmer_boss.hpp:58-68)
        def key(s):
            c = enc(s)
            return packing.pack_codes(c, packing.boss_priority_order(len(c)))[0]

        def less(a, b):
            ka, kb = key(a), key(b)
            return tuple(ka) < tuple(kb)

        assert less("ACG", "ACT")          # same node AC, label G < T
        assert not less("TCG", "ACG")      # node TC vs AC: co-lex C==C then T>A
        assert less("CAG", "TCG")          # node co-lex: A < C (2nd-to-last char)
        assert less("AAA", "AAC")

    def test_unique_rows_counts(self):
        chars = np.array([[1, 2], [1, 2], [3, 4], [1, 1]], dtype=np.uint8)
        packed = packing.pack_codes(chars)
        u, c = packing.unique_rows(packed, np.array([1, 2, 3, 4], dtype=np.uint64))
        assert len(u) == 3
        assert c.sum() == 10
        uc = packing.unpack_codes(u, 2)
        np.testing.assert_array_equal(uc[0], [1, 1])

    def test_searchsorted_membership(self):
        rng = np.random.default_rng(1)
        rows = rng.integers(0, 5, size=(50, 20), dtype=np.uint8)
        packed = packing.pack_codes(rows, packing.boss_priority_order(20))
        u, _ = packing.unique_rows(packed)
        assert packing.rows_in(u, packed).all()
        absent = packing.pack_codes(
            np.full((1, 20), 9, dtype=np.uint8), packing.boss_priority_order(20))
        assert not packing.rows_in(u, absent).any()


class TestExtractor:
    def test_basic_extraction(self):
        ex = KmerExtractor(DNA)
        kmers, _ = ex.extract([b"ACGTACGT"], 4, mode="basic")
        # 5 windows, distinct: ACGT, CGTA, GTAC, TACG  -> 4 unique
        assert kmers.shape == (4, 4)

    def test_invalid_chars_split(self):
        ex = KmerExtractor(DNA)
        kmers, _ = ex.extract([b"ACGTNNACGT"], 4, mode="basic")
        assert kmers.shape == (1, 4)   # only ACGT twice -> 1 unique
        kmers2, _ = ex.extract([b"ACGNGT"], 4, mode="basic")
        assert kmers2.shape[0] == 0

    def test_canonical_min_of_strands(self):
        ex = KmerExtractor(DNA)
        # AAAA's rc is TTTT; canonical must be AAAA
        kmers, _ = ex.extract([b"TTTT"], 4, mode="canonical")
        assert ex.decode(kmers[0]) == "AAAA"

    def test_both_mode_contains_both_strands(self):
        ex = KmerExtractor(DNA)
        kmers, _ = ex.extract([b"ACGA"], 4, mode="both")
        seqs = {ex.decode(k) for k in kmers}
        assert seqs == {"ACGA", "TCGT"}

    def test_counts(self):
        ex = KmerExtractor(DNA)
        kmers, counts = ex.extract([b"AAAAA"], 4, mode="basic", with_counts=True)
        assert kmers.shape[0] == 1
        assert counts[0] == 2

    def test_counts_canonical_palindrome_doubles(self):
        ex = KmerExtractor(DNA)
        # ACGT is its own reverse complement
        kmers, counts = ex.extract([b"ACGT"], 4, mode="both", with_counts=True)
        assert kmers.shape[0] == 1
        assert counts[0] == 2


class TestBloomFilter:
    def test_no_false_negatives(self):
        from metagraph_tpu.kmer.bloom import KmerBloomFilter
        rng = np.random.default_rng(0)
        seqs = ["".join(rng.choice(list("ACGT"), size=200)).encode()
                for _ in range(5)]
        bloom = KmerBloomFilter.from_fpp(11, False, 1000, 0.01)
        for s in seqs:
            bloom.add_sequence(s)
        for s in seqs:
            assert bloom.check_kmer_presence(s).all()

    def test_filters_absent(self):
        from metagraph_tpu.kmer.bloom import KmerBloomFilter
        rng = np.random.default_rng(1)
        bloom = KmerBloomFilter.from_fpp(15, False, 1000, 0.01)
        bloom.add_sequence(b"ACGT" * 50)
        probe = "".join(rng.choice(list("ACGT"), size=1000)).encode()
        fp = bloom.check_kmer_presence(probe).mean()
        assert fp < 0.1

    def test_canonical_mode(self):
        from metagraph_tpu.kmer.bloom import KmerBloomFilter
        from metagraph_tpu.graph.canonical import revcomp
        bloom = KmerBloomFilter.from_fpp(9, True, 100, 0.01)
        s = b"ACGGATTCAGCGTTACA"
        bloom.add_sequence(s)
        assert bloom.check_kmer_presence(revcomp(s)).all()

    def test_save_load(self, tmp_path):
        from metagraph_tpu.kmer.bloom import KmerBloomFilter
        bloom = KmerBloomFilter.from_fpp(9, False, 100, 0.05)
        bloom.add_sequence(b"ACGTACGTACGTAAA")
        p = str(tmp_path / "f.bloom.npz")
        bloom.save(p)
        b2 = KmerBloomFilter.load(p)
        assert b2.check_kmer_presence(b"ACGTACGTACGTAAA").all()
