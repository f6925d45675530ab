"""Device (JAX) query kernels vs the host BOSS oracle — run on CPU backend."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
from metagraph_tpu.kmer.extractor import KmerExtractor
from metagraph_tpu.succinct import ops


@pytest.fixture(scope="module")
def small_graph():
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT"), size=500)).encode() for _ in range(5)]
    g = DBGSuccinct.build(seqs, 11)
    return g, seqs


class TestDeviceBOSS:
    def test_rank_select_match_host(self, small_graph):
        g, _ = small_graph
        hb = g.boss
        db = ops.DeviceBOSS.from_host(hb)
        rng = np.random.default_rng(1)
        M = len(hb.W)
        ii = rng.integers(1, M, size=500)
        cc = rng.integers(0, 10, size=500)
        np.testing.assert_array_equal(
            hb.rank_W(ii, cc),
            np.array(jax.jit(db.rank_W)(jnp.asarray(ii, jnp.int32),
                                        jnp.asarray(cc, jnp.int32))))
        np.testing.assert_array_equal(
            hb.rank_last(ii),
            np.array(jax.jit(db.rank_last)(jnp.asarray(ii, jnp.int32))))
        nn = hb.num_nodes()
        rr = np.arange(0, nn + 1)
        np.testing.assert_array_equal(
            hb.select_last(rr),
            np.array(jax.jit(db.select_last)(jnp.asarray(rr, jnp.int32))))
        for c in range(10):
            cnt = int((hb.W == c).sum()) - (1 if c == 0 else 0)
            if cnt == 0:
                continue
            r = np.arange(1, cnt + 1)
            np.testing.assert_array_equal(
                hb.select_W(np.full_like(r, c), r),
                np.array(jax.jit(db.select_W)(
                    jnp.full(r.shape, c, jnp.int32), jnp.asarray(r, jnp.int32))),
                err_msg=f"select_W c={c}")

    def test_map_kmers_match_host(self, small_graph):
        g, seqs = small_graph
        db = ops.DeviceBOSS.from_host(g.boss)
        ex = KmerExtractor()
        for s in seqs[:2]:
            codes = ex.encode(s).astype(np.int32)
            wins = np.lib.stride_tricks.sliding_window_view(codes, 11)
            host = g.boss.map_sequence(ex.encode(s))
            dev = np.array(jax.jit(db.map_kmers)(jnp.asarray(wins)))
            np.testing.assert_array_equal(dev, host)

    def test_dense_last_block(self):
        # regression: a 128-block of all-1 last bits must not overflow int8
        g = DBGSuccinct.build([bytes("ACGT" * 200, "ascii")], 4)
        # tiny graph; build a synthetic dense-last BOSS instead
        from metagraph_tpu.succinct.construct import BossArrays
        from metagraph_tpu.succinct.boss import BOSS
        M = 512
        last = np.ones(M, dtype=np.uint8)
        last[0] = 0
        W = np.ones(M, dtype=np.uint8)
        W[0] = 0
        arr = BossArrays(k=3, alph_size=5, W=W, last=last,
                         F=np.zeros(5, dtype=np.int64),
                         valid=np.ones(M, dtype=np.uint8))
        hb = BOSS(arr)
        db = ops.DeviceBOSS.from_host(hb)
        r = np.arange(1, int(last.sum()) + 1)
        np.testing.assert_array_equal(
            hb.select_last(r),
            np.array(jax.jit(db.select_last)(jnp.asarray(r, jnp.int32))))


class TestDeviceKmerIndex:
    def test_lookup_matches_host(self, small_graph):
        g, seqs = small_graph
        valid_edges = np.flatnonzero(g.boss.valid)
        kchars = g.boss.get_edge_seq(valid_edges)
        idx = ops.DeviceKmerIndex.from_host(kchars, valid_edges)
        ex = KmerExtractor()
        for s in seqs[:2]:
            codes = ex.encode(s)
            host = g.boss.map_sequence(codes)
            wins = np.lib.stride_tricks.sliding_window_view(codes, 11)
            q = ops.pack_kmers32(wins.astype(np.uint8))
            dev = np.array(idx.lookup(jnp.asarray(q)))
            np.testing.assert_array_equal(dev, host)

    def test_missing_kmers(self, small_graph):
        g, _ = small_graph
        valid_edges = np.flatnonzero(g.boss.valid)
        idx = ops.DeviceKmerIndex.from_host(
            g.boss.get_edge_seq(valid_edges), valid_edges)
        probe = np.tile(np.array([1, 2, 3, 4], dtype=np.uint8), 3)[:11][None, :]
        host = g.map_to_nodes_sequentially(b"ACGTACGTACG")
        q = ops.pack_kmers32(probe)
        dev = np.array(idx.lookup(jnp.asarray(q)))
        np.testing.assert_array_equal(dev, host)

    def test_device_pack_windows(self, small_graph):
        g, seqs = small_graph
        ex = KmerExtractor()
        codes = ex.encode(seqs[0] + b"NN" + seqs[1]).astype(np.int32)
        K = 11
        packed, valid = ops.device_pack_windows(jnp.asarray(codes)[None, :], K)
        wins = np.lib.stride_tricks.sliding_window_view(codes, K)
        w_valid = ~(np.lib.stride_tricks.sliding_window_view(codes >= 5, K).any(axis=1))
        np.testing.assert_array_equal(np.array(valid)[0], w_valid)
        expect = ops.pack_kmers32(wins[w_valid].astype(np.uint8))
        np.testing.assert_array_equal(np.array(packed)[0][w_valid], expect)


class TestDeviceAnnotation:
    def test_count_label_variants_agree(self):
        import jax.numpy as jnp
        from metagraph_tpu.annotation import ops as aops
        rng = np.random.default_rng(0)
        R, L, Q, S = 5000, 70, 20000, 37
        bitmap = rng.integers(0, 2 ** 32, size=(R, (L + 31) // 32),
                              dtype=np.uint32)
        nodes = rng.integers(0, R, size=Q).astype(np.int32)
        seq_ids = np.sort(rng.integers(0, S, size=Q)).astype(np.int32)
        args = (jnp.asarray(bitmap), jnp.asarray(nodes), jnp.asarray(seq_ids),
                S, L)
        c1, p1 = aops.count_labels(*args)
        c2, p2 = aops.count_labels_sorted(*args)
        c3, p3 = aops.count_labels_matmul(*args)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(c1),
                                      np.asarray(c3).astype(np.int32))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_array_equal(np.asarray(p1),
                                      np.asarray(p3).astype(np.int32))

    def test_device_pipeline_matches_host_query(self):
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        from metagraph_tpu.annotation.column import ColumnMajorAnnotation
        from metagraph_tpu.query.device import DeviceQueryPipeline
        rng = np.random.default_rng(1)
        seqs = ["".join(rng.choice(list("ACGT"), size=300)).encode()
                for _ in range(6)]
        g = DBGSuccinct.build(seqs, 13)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for i, s in enumerate(seqs):
            ag.annotate_sequence(s, [f"s{i}"])
        pipe = DeviceQueryPipeline(g, anno)
        queries = [seqs[0], seqs[2][:100], b"N" * 30, b"ACGT"]
        dev = pipe.query_labels(queries, "matches", 2 ** 63, 0.7, 0.0)
        for q, got in zip(queries, dev):
            want = ag.get_top_labels(q, 2 ** 63, 0.7, 0.0)
            assert got == want, (q[:20], got, want)

    def test_query_epoch_matches_step(self):
        import jax.numpy as jnp
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        from metagraph_tpu.annotation.column import ColumnMajorAnnotation
        from metagraph_tpu.query.device import (DeviceQueryPipeline,
                                                query_epoch, query_step)
        rng = np.random.default_rng(2)
        seqs = ["".join(rng.choice(list("ACGT"), size=500)).encode()
                for _ in range(4)]
        g = DBGSuccinct.build(seqs, 11)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for i, s in enumerate(seqs):
            ag.annotate_sequence(s, [f"s{i}"])
        pipe = DeviceQueryPipeline(g, anno)
        q, sid, _ = pipe.prepare_batch(seqs)
        pad = 256 - len(q) % 256
        q = np.concatenate([q, np.full((pad, q.shape[1]),
                                       np.iinfo(np.uint32).max, np.uint32)])
        sid = np.concatenate([sid, np.full(pad, 3, np.int32)])
        S, L = 4, anno.num_labels
        c1, p1, _ = query_step(pipe.index.table, pipe.annotation.bitmap,
                               jnp.asarray(q), jnp.asarray(sid), S, L)
        c2, p2 = query_epoch(pipe.index.table, pipe.annotation.bitmap,
                             jnp.asarray(q), jnp.asarray(sid), S, L, 256)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


class TestPackedEpoch:
    def test_query_epoch_codes2_matches_unpacked(self):
        """2-bit packed tile upload (native tile_pack2 + device unpack) is
        bit-identical to the uint8 code-tile epoch."""
        import jax.numpy as jnp
        from metagraph_tpu import native
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        from metagraph_tpu.annotation.column import ColumnMajorAnnotation
        from metagraph_tpu.query.device import (
            TILE, DeviceQueryPipeline, query_epoch_codes, query_epoch_codes2,
            tile_codes_layout)
        if native.get_lib() is None:
            import pytest
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(3)
        seqs = ["".join(rng.choice(list("ACGTN"), size=int(n))).encode()
                for n in rng.integers(10, 700, size=16)]
        g = DBGSuccinct.build([s for s in seqs if len(s) >= 13], 13)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for i, s in enumerate(seqs):
            if len(s) >= 13:
                ag.annotate_sequence(s, [f"s{i}"])
        pipe = DeviceQueryPipeline(g, anno)
        K, S, L = 13, len(seqs), anno.num_labels
        ex = g.extractor
        tiles, tile_seq, _ = tile_codes_layout(
            [ex.encode(s) for s in seqs], K)
        c1, p1, n1 = query_epoch_codes(
            pipe.index.table, pipe.annotation.bitmap, jnp.asarray(tiles),
            jnp.asarray(tile_seq), S, L, K)
        t2, vb, ts2, nwins = native.tile_pack2(seqs, K, TILE)
        from metagraph_tpu.query.pipeline import _thresholds
        dsel, selmin = _thresholds(nwins, 0.7, 0.1, S)
        mask, c2, p2, n2 = query_epoch_codes2(
            pipe.index.table, pipe.annotation.bitmap, jnp.asarray(t2),
            jnp.asarray(vb), jnp.asarray(ts2), jnp.asarray(dsel),
            jnp.asarray(selmin), S, L, K, TILE + K - 1)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
        # the fused selection mask == get_min_count host reference
        from metagraph_tpu.annotation.annotated_dbg import get_min_count
        bits = np.unpackbits(
            np.ascontiguousarray(np.asarray(mask)).view(np.uint8),
            axis=1, bitorder="little")[:, :L]
        ch, ph = np.asarray(c1), np.asarray(p1)
        for i, nk in enumerate(nwins):
            if nk == 0:
                assert not bits[i].any()
                continue
            mc = get_min_count(0.7, 0.1, nk, int(ph[i]))
            want = (ch[i] >= mc) if ph[i] >= mc else np.zeros(L, bool)
            np.testing.assert_array_equal(bits[i].astype(bool), want)


class TestDeviceBuild:
    def test_sort_unique_matches_host(self):
        from metagraph_tpu.succinct.device_build import device_sort_unique
        rng = np.random.default_rng(0)
        keys = rng.integers(0, 50, size=(5000, 3)).astype(np.uint32)
        got = device_sort_unique(keys)
        want = np.unique(keys.astype(np.uint64)
                         .dot(np.array([1 << 40, 1 << 20, 1], np.uint64)))
        assert len(got) == len(want)
        # lexicographic order check
        for w in range(2):
            pass
        prev = None
        for row in got[:100]:
            t = tuple(row)
            assert prev is None or t > prev
            prev = t

    def test_counts(self):
        from metagraph_tpu.succinct.device_build import device_sort_unique
        keys = np.array([[1, 2], [1, 2], [0, 5], [3, 3], [0, 5], [0, 5]],
                        dtype=np.uint32)
        uniq, counts = device_sort_unique(keys, with_counts=True)
        assert [tuple(u) for u in uniq] == [(0, 5), (1, 2), (3, 3)]
        assert counts.tolist() == [3, 2, 1]

    def test_build_kmer_set_matches_extractor(self):
        from metagraph_tpu import native
        from metagraph_tpu.succinct.device_build import build_kmer_set_device
        from metagraph_tpu.succinct.ops import pack_kmers32
        rng = np.random.default_rng(1)
        seq = "".join(rng.choice(list("ACGTN"), size=3000)).encode()
        res = native.fasta_encode(b">x\n" + seq + b"\n")
        assert res is not None
        codes, _ = res
        uniq = build_kmer_set_device(codes, 15)
        chars, _ = KmerExtractor().extract([seq], 15)
        np.testing.assert_array_equal(uniq, pack_kmers32(chars))


class TestWireEpoch:
    def test_pack_kmers2_extract_windows2_roundtrip(self):
        """Window keys funnel-shifted from the 2-bit wire stream equal
        pack_kmers2 of the window chars (the hash-key contract)."""
        import jax.numpy as jnp
        from metagraph_tpu import native
        from metagraph_tpu.succinct.ops import (extract_windows2,
                                                pack_kmers2, window_valid2)
        from metagraph_tpu.query.device import TILE, wire_words_layout
        if native.get_lib() is None:
            import pytest
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(7)
        for K in (2, 13, 16, 17, 20, 31):
            seqs = ["".join(rng.choice(list("ACGTN"), size=int(n))).encode()
                    for n in rng.integers(K, 600, size=6)]
            t2, vb, ts2, nwins = native.tile_pack2(seqs, K, TILE)
            words, vwords = wire_words_layout(t2, vb, K, TILE, len(t2))
            keys = np.asarray(extract_windows2(jnp.asarray(words), K, TILE))
            valid = np.asarray(window_valid2(jnp.asarray(vwords), K, TILE))
            ex = KmerExtractor()
            base = 0
            for i, s in enumerate(seqs):
                codes = ex.encode(s)
                nw = max(len(codes) - K + 1, 0)
                nt = -(-nw // TILE) if nw else 0
                wins = np.lib.stride_tricks.sliding_window_view(codes, K) \
                    if nw else np.zeros((0, K), np.uint8)
                bad = np.concatenate([[0], np.cumsum(codes >= 5)])
                vref = (bad[K:] - bad[:-K]) == 0 if nw else np.zeros(0, bool)
                kflat = keys[base: base + nt].reshape(-1, 2)[:nw]
                vflat = valid[base: base + nt].reshape(-1)[:nw]
                np.testing.assert_array_equal(vflat, vref, err_msg=f"K={K}")
                if vref.any():
                    safe = np.where(wins[vref] >= 5, 1, wins[vref])
                    want = pack_kmers2(safe)
                    np.testing.assert_array_equal(
                        kflat[vref], want, err_msg=f"K={K} seq {i}")
                base += nt

    def test_dedup_epoch_matches_tiled(self):
        """query_epoch_dedup (the reference's query-graph move on device,
        ref query.cpp:893) returns counts identical to the per-occurrence
        epoch, with duplicate windows collapsing into distinct ids."""
        import jax.numpy as jnp
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        from metagraph_tpu.annotation.column import ColumnMajorAnnotation
        from metagraph_tpu.query.device import (
            DeviceQueryPipeline, dedup_batch, query_epoch_dedup,
            query_epoch_tiled, tile_layout)
        rng = np.random.default_rng(6)
        base = ["".join(rng.choice(list("ACGTN"), 280,
                                   p=[.24, .24, .24, .24, .04])).encode()
                for _ in range(5)]
        seqs = base * 4
        g = DBGSuccinct.build([s for s in base], 13)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for i, s in enumerate(base):
            ag.annotate_sequence(s, [f"s{i}"])
        pipe = DeviceQueryPipeline(g, anno)
        S, L = len(seqs), anno.num_labels
        q, sid, _ = pipe.prepare_batch(seqs)
        tiles, tseq = tile_layout(q, sid, S)
        c1, p1, _ = query_epoch_tiled(
            pipe.index.table, pipe.annotation.bitmap, jnp.asarray(tiles),
            jnp.asarray(tseq), S, L)
        dkeys, dtiles, dtseq, D = dedup_batch(q, sid, S)
        assert 0 < D < len(q)
        c2, p2 = query_epoch_dedup(
            pipe.index.table, pipe.annotation.bitmap, jnp.asarray(dkeys),
            jnp.asarray(dtiles), jnp.asarray(dtseq), S, L)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_keys2_to_keys4_matches_pack_kmers32(self):
        """Device 2-bit -> 4-bit key conversion reproduces pack_kmers32
        (the shared-hash-table probe contract) for every K in range."""
        from metagraph_tpu.succinct.ops import (keys2_to_keys4, pack_kmers2,
                                                pack_kmers32)
        rng = np.random.default_rng(3)
        for K in (2, 8, 15, 16, 17, 20, 24, 31):
            chars = rng.integers(1, 5, (257, K)).astype(np.uint8)
            got = np.asarray(keys2_to_keys4(pack_kmers2(chars), K))
            np.testing.assert_array_equal(
                got, pack_kmers32(chars, bits=4), err_msg=f"K={K}")

    def test_query_epoch_wire_matches_codes2(self):
        """The wire epoch (2-bit stream keys converted on device to the
        shared 4-bit table's nibble keys) returns bit-identical
        counts/present/mask/nodes to the codes2 epoch."""
        import jax.numpy as jnp
        from metagraph_tpu import native
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        from metagraph_tpu.annotation.column import ColumnMajorAnnotation
        from metagraph_tpu.query.device import (
            TILE, DeviceQueryPipeline, query_epoch_codes2, query_epoch_wire,
            wire_words_layout)
        from metagraph_tpu.query.pipeline import QueryEngine, _thresholds
        if native.get_lib() is None:
            import pytest
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(11)
        seqs = ["".join(rng.choice(list("ACGTN"), size=int(n))).encode()
                for n in rng.integers(10, 700, size=16)]
        K = 17
        g = DBGSuccinct.build([s for s in seqs if len(s) >= K], K)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for i, s in enumerate(seqs):
            if len(s) >= K:
                ag.annotate_sequence(s, [f"s{i}"])
        pipe = DeviceQueryPipeline(g, anno)
        eng = QueryEngine(ag, use_device=True)
        assert eng._wire_ok()
        eng._build_device_index()
        table4 = eng._device_index.table
        S, L = len(seqs), anno.num_labels
        t2, vb, ts2, nwins = native.tile_pack2(seqs, K, TILE)
        dsel, selmin = _thresholds(nwins, 0.7, 0.1, S)
        m1, c1, p1, n1 = query_epoch_codes2(
            pipe.index.table, pipe.annotation.bitmap, jnp.asarray(t2),
            jnp.asarray(vb), jnp.asarray(ts2), jnp.asarray(dsel),
            jnp.asarray(selmin), S, L, K, TILE + K - 1)
        words, vwords = wire_words_layout(t2, vb, K, TILE, len(t2))
        m2, c2, p2, n2 = query_epoch_wire(
            table4, pipe.annotation.bitmap, jnp.asarray(words),
            jnp.asarray(vwords), jnp.asarray(ts2), jnp.asarray(dsel),
            jnp.asarray(selmin), S, L, K, TILE)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
        # the production entrypoint packs the five inputs into ONE upload
        # buffer (query_epoch_wire_buf); the offset math must reproduce the
        # direct five-arg results bit-identically
        from metagraph_tpu.query.device import (query_epoch_wire_buf,
                                                wire_epoch_buffer)
        buf = wire_epoch_buffer(words, vwords, ts2, dsel, selmin)
        m3, c3, p3, n3 = query_epoch_wire_buf(
            table4, pipe.annotation.bitmap, jnp.asarray(buf),
            len(words), words.shape[1], vwords.shape[1], S, L, K, TILE)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m3))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c3))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p3))
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n3))

    def _fused_vs_host(self, mode_name, K=19):
        """query_batch_fused payloads == host (no-device) payloads on a
        canonical / primary graph, for every query mode."""
        from metagraph_tpu import native
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        from metagraph_tpu.annotation.column import ColumnMajorAnnotation
        from metagraph_tpu.query.pipeline import QueryEngine
        if native.get_lib() is None:
            import pytest
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(23)
        refs = ["".join(rng.choice(list("ACGT"), size=400)).encode()
                for _ in range(6)]
        g = DBGSuccinct.build(refs, K, mode=mode_name)
        graph = g
        if mode_name == "primary":
            from metagraph_tpu.graph.canonical import CanonicalDBG
            graph = CanonicalDBG(g)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(graph, anno)
        for i, s in enumerate(refs):
            ag.annotate_sequence(s, [f"s{i}"])
        # queries: exact slices, reverse complements, noisy reads, invalids
        comp = bytes.maketrans(b"ACGT", b"TGCA")
        queries = []
        for i, s in enumerate(refs):
            queries.append(s[i * 10: i * 10 + 120])
            queries.append(s[30: 200][::-1].translate(comp))
            q = bytearray(s[50: 180])
            for p in range(0, len(q), 17):
                q[p] = ord(rng.choice(list("ACGTN")))
            queries.append(bytes(q))
        queries.append(b"N" * 60)
        queries.append(b"ACG")
        host = QueryEngine(ag, use_device=False)
        dev = QueryEngine(ag, use_device=True)
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
        for qmode in ("labels", "matches", "counts", "signature"):
            want = [host.execute(n, qmode, 5, 0.6, 0.05)
                    for n in host.map_batch(queries)]
            got = dev.query_batch_fused(queries, qmode, 5, 0.6, 0.05)
            assert got is not None, f"fused path refused {mode_name}"
            assert norm(got) == norm(want), f"{mode_name}/{qmode}"

    def test_fused_compressed_annotation_matches_host(self, monkeypatch):
        # force the descend/walk device paths (the default budget would
        # densify this small matrix into a working bitmap)
        monkeypatch.setenv("METAGRAPH_DENSE_ANNO_BUDGET", "0")
        """The ONE-dispatch fused path with BRWT / row-diff-BRWT device
        annotations (words_fn row source) is payload-identical to host —
        the configuration that scales past dense R x L/8 bitmaps
        (ref multi_brwt/brwt.hpp:66)."""
        from metagraph_tpu import native
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        from metagraph_tpu.annotation.column import ColumnMajorAnnotation
        from metagraph_tpu.annotation.matrix import (BRWT, RowDiff,
                                                     StaticAnnotation)
        from metagraph_tpu.query.pipeline import QueryEngine
        if native.get_lib() is None:
            import pytest
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(31)
        K = 21
        refs = ["".join(rng.choice(list("ACGT"), size=500)).encode()
                for _ in range(8)]
        g = DBGSuccinct.build(refs, K)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for i, s in enumerate(refs):
            ag.annotate_sequence(s, [f"s{i}"])
        anno.freeze()
        cols = [anno.column_rows(c) for c in range(anno.num_labels)]
        R, L = anno.num_rows, anno.num_labels
        queries = [s[17:190] for s in refs] + [b"N" * 40, refs[0][:K - 1]]
        host = QueryEngine(ag, use_device=False)
        # (no "counts": binary BRWT matrices carry no k-mer count values)
        want = {m: [host.execute(n, m, 5, 0.6, 0.05)
                    for n in host.map_batch(queries)]
                for m in ("labels", "matches", "signature")}
        from metagraph_tpu.annotation.sparse_device import \
            DeviceBlockSparseAnno
        for name, matrix in [
                ("brwt", BRWT.from_columns(cols, R, L)),
                ("row_diff_brwt",
                 RowDiff.from_annotation(cols, R, L, g, inner_type=BRWT))]:
            ag2 = AnnotatedDBG(g, StaticAnnotation(matrix, anno.encoder,
                                                   name))
            # beyond the dense budget the production route is the
            # label-sparse device annotation, served through
            # execute_batch (query_batch_fused hands off by returning
            # None, exactly as query_records does)
            dev = QueryEngine(ag2, use_device=True)
            for qmode, w in want.items():
                got = dev.query_batch_fused(queries, qmode, 5, 0.6, 0.05)
                if got is None:
                    got = dev.execute_batch(dev.map_batch(queries), qmode,
                                            5, 0.6, 0.05)
                assert str(got) == str(w), f"{name}/{qmode}"
            assert isinstance(dev._device_anno, DeviceBlockSparseAnno)
            # the words_fn fused path remains the fallback when the
            # sparse conversion bails: force it and check payloads again
            dev2 = QueryEngine(ag2, use_device=True)
            monkeypatch.setattr(DeviceBlockSparseAnno, "from_matrix",
                                classmethod(lambda *a, **k: None))
            got2 = dev2.query_batch_fused(queries, "labels", 5, 0.6, 0.05)
            assert got2 is not None, f"fused words_fn path refused {name}"
            assert str(got2) == str(want["labels"]), name
            assert dev2._device_words is not None
            monkeypatch.undo()
            monkeypatch.setenv("METAGRAPH_DENSE_ANNO_BUDGET", "0")

    def test_fused_canonical_graph_matches_host(self):
        self._fused_vs_host("canonical")

    def test_fused_primary_graph_matches_host(self):
        self._fused_vs_host("primary")


class TestWideAlphabetDeviceIndex:
    """8-bit device hash keys for Protein graphs (pack_kmers32 bits=8):
    query --device matches the host path on wide alphabets."""

    def test_protein_device_query_matches_host(self):
        from metagraph_tpu.seq_io.fasta import read_fasta
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        from metagraph_tpu.kmer.alphabets import PROTEIN
        from metagraph_tpu.annotation.column import ColumnMajorAnnotation
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        from metagraph_tpu.query.pipeline import QueryEngine
        EX = "/root/reference/metagraph/examples/data"
        recs = read_fasta(f"{EX}/test_Protein_sequences.fa")
        g = DBGSuccinct.build([r.seq for r in recs], 20, alphabet=PROTEIN)
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for r in recs:
            ag.annotate_sequence(r.seq, [r.name])
        qs = [r.seq for r in read_fasta(f"{EX}/test_Protein_query.fa")]
        mk = lambda: [type("R", (), {"name": f"q{i}", "seq": s})()
                      for i, s in enumerate(qs)]
        host = QueryEngine(ag, use_device=False)
        dev = QueryEngine(ag, use_device=True)
        assert dev._bits == 8
        for mode in ("labels", "matches"):
            rh = [r.to_string()
                  for r in host.query_records(mk(), mode, 10, 0.7, 0.0)]
            rd = [r.to_string()
                  for r in dev.query_records(mk(), mode, 10, 0.7, 0.0)]
            assert rh == rd

    def test_pack_codes32_8bit_roundtrip_order(self):
        import numpy as np
        from metagraph_tpu.succinct import ops
        from metagraph_tpu.kmer import packing
        rng = np.random.default_rng(0)
        chars = rng.integers(0, 27, (500, 21)).astype(np.uint8)
        keys = ops.pack_kmers32(chars, bits=8)
        # row order under the packed keys == row order under the raw codes
        order = packing.boss_priority_order(21)
        ref = np.lexsort(chars[:, order][:, ::-1].T)
        import numpy.lib.recfunctions as rf
        got = np.lexsort(keys[:, ::-1].T)
        assert np.array_equal(
            chars[ref], chars[got]) or np.array_equal(ref, got)
