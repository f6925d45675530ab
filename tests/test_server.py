"""HTTP server + Python client end-to-end (ref integration_tests/test_api.py)."""

import json
import time

import numpy as np
import pytest

from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
from metagraph_tpu.annotation.column import ColumnMajorAnnotation
from metagraph_tpu.api.client import GraphClient, GraphClientJson
from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
from metagraph_tpu.server.server import MetaGraphServer

PORT = 5601


@pytest.fixture(scope="module")
def server_and_seqs():
    rng = np.random.default_rng(7)
    seqs = ["".join(rng.choice(list("ACGT"), size=400)).encode()
            for _ in range(5)]
    g = DBGSuccinct.build(seqs, 15)
    anno = ColumnMajorAnnotation(g.max_index())
    ag = AnnotatedDBG(g, anno)
    for i, s in enumerate(seqs):
        ag.annotate_sequence(s, [f"sample{i}"])
    server = MetaGraphServer(ag)
    server.serve(port=PORT, background=True)
    time.sleep(0.3)
    yield server, seqs
    server.shutdown()


class TestAPI:
    def test_stats_and_labels(self, server_and_seqs):
        _, seqs = server_and_seqs
        c = GraphClientJson("127.0.0.1", PORT)
        stats = c.stats()
        assert stats["graph"]["k"] == 15
        assert stats["annotation"]["labels"] == 5
        assert c.column_labels() == [f"sample{i}" for i in range(5)]

    def test_search(self, server_and_seqs):
        _, seqs = server_and_seqs
        c = GraphClientJson("127.0.0.1", PORT)
        res = c.search(seqs[2].decode(), discovery_fraction=1.0)
        assert len(res) == 1
        samples = [r["sample"] for r in res[0]["results"]]
        assert "sample2" in samples

    def test_align(self, server_and_seqs):
        _, seqs = server_and_seqs
        c = GraphClientJson("127.0.0.1", PORT)
        q = seqs[1][:60]
        res = c.align(q.decode())
        a = res[0]["alignments"][0]
        assert a["cigar"] == "60="
        assert a["score"] == 130

    def test_search_with_align(self, server_and_seqs):
        _, seqs = server_and_seqs
        c = GraphClientJson("127.0.0.1", PORT)
        q = bytearray(seqs[1][:60])
        q[30] = ord("A") if q[30] != ord("A") else ord("C")
        res = c.search(q.decode(), align=True, discovery_fraction=0.0)
        assert "best_alignment" in res[0]

    def test_dataframe_client(self, server_and_seqs):
        pytest.importorskip("pandas")
        _, seqs = server_and_seqs
        c = GraphClient("127.0.0.1", PORT)
        df = c.search(seqs[0].decode(), discovery_fraction=1.0)
        assert "sample" in df.columns and len(df) >= 1

    def test_error_handling(self, server_and_seqs):
        c = GraphClientJson("127.0.0.1", PORT)
        with pytest.raises(ValueError):
            c.search("ACGT", discovery_fraction=2.0)


class TestApiErrorContract:
    """ref integration_tests/test_api.py:78-150 raw-request error contract."""

    def post(self, server_and_seqs, endpoint, body):
        import http.client
        host, port = "127.0.0.1", PORT
        conn = http.client.HTTPConnection(host, port, timeout=10)
        conn.request("POST", f"/{endpoint}", body,
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        data = json.loads(r.read().decode())
        conn.close()
        return r.status, data

    def test_incomplete_json(self, server_and_seqs):
        code, data = self.post(server_and_seqs, "search",
                               '{"FASTA": ">q\\nACGT", "top_labels": 1,')
        assert code == 400
        assert "Bad json received:" in data["error"]

    def test_invalid_top_labels(self, server_and_seqs):
        code, data = self.post(server_and_seqs, "search", json.dumps(
            {"FASTA": ">q\nACGT", "top_labels": "not_a_number",
             "discovery_fraction": 0.01}))
        assert code == 400
        assert "Value is not convertible to Int." in data["error"]

    def test_missing_fasta(self, server_and_seqs):
        code, data = self.post(server_and_seqs, "search", json.dumps(
            {"top_labels": 100, "discovery_fraction": 0.01}))
        assert code == 400
        assert "No input sequences received from client" in data["error"]

    def test_invalid_discovery_fraction(self, server_and_seqs):
        code, _ = self.post(server_and_seqs, "search", json.dumps(
            {"FASTA": ">q\nTCGA", "discovery_fraction": 1.1,
             "top_labels": 1}))
        assert code == 400

    def test_missing_top_labels_defaults(self, server_and_seqs):
        code, _ = self.post(server_and_seqs, "search", json.dumps(
            {"FASTA": ">q\nTCGA", "discovery_fraction": 0.1}))
        assert code == 200

    def test_invalid_url(self, server_and_seqs):
        code, _ = self.post(server_and_seqs, "not_valid", "{}")
        assert code == 404

    def test_no_matching_sequence(self, server_and_seqs):
        code, data = self.post(server_and_seqs, "search", json.dumps(
            {"FASTA": ">q\nGGGGGGGGGGGGGGGGGG", "discovery_fraction": 0.01,
             "top_labels": 1}))
        assert code == 200
        assert len(data) == 1
        assert data[0]["results"] == []

    def test_align_no_sequence(self, server_and_seqs):
        # ref test_api.py:212-218: empty sequence aligns to nothing, not 400
        code, data = self.post(server_and_seqs, "align", json.dumps(
            {"FASTA": ">query\n", "min_exact_match": 0}))
        assert code == 200
        assert data[0]["alignments"] == []

    def test_align_empty_fasta_desc(self, server_and_seqs):
        _, seqs = server_and_seqs
        code, data = self.post(server_and_seqs, "align", json.dumps(
            {"FASTA": ">\n" + seqs[0][:40].decode(), "min_exact_match": 0}))
        assert code == 200
        assert data[0]["seq_description"] == ""

    def test_search_empty_fasta_desc(self, server_and_seqs):
        _, seqs = server_and_seqs
        code, data = self.post(server_and_seqs, "search", json.dumps(
            {"FASTA": ">\n" + seqs[0][:40].decode(), "top_labels": 5,
             "discovery_fraction": 0.1}))
        assert code == 200
        assert data[0]["seq_description"] == ""

    def test_search_no_coordinate_support(self, server_and_seqs):
        # ref test_api.py:234-254: 400 with the exact message
        _, seqs = server_and_seqs
        code, data = self.post(server_and_seqs, "search", json.dumps(
            {"FASTA": ">q\n" + seqs[0][:40].decode(), "top_labels": 5,
             "discovery_fraction": 0.1, "query_coords": True}))
        assert code == 400
        assert "Annotation does not support k-mer coordinate queries" \
            in data["error"]

    def test_search_no_count_support(self, server_and_seqs):
        _, seqs = server_and_seqs
        code, data = self.post(server_and_seqs, "search", json.dumps(
            {"FASTA": ">q\n" + seqs[0][:40].decode(), "top_labels": 5,
             "discovery_fraction": 0.1, "abundance_sum": True}))
        assert code == 400
        assert "Annotation does not support k-mer count queries" \
            in data["error"]


class TestMultiGraphClient:
    """ref test_api.py:452-545: one client over several graph servers."""

    def test_multi_graph_search_and_stats(self, server_and_seqs, tmp_path):
        pytest.importorskip("pandas")
        from metagraph_tpu.api.client import MultiGraphClient
        _, seqs = server_and_seqs
        # second server over a different subset
        g2 = DBGSuccinct.build(seqs[:2], 15)
        anno2 = ColumnMajorAnnotation(g2.max_index())
        ag2 = AnnotatedDBG(g2, anno2)
        for i, s in enumerate(seqs[:2]):
            ag2.annotate_sequence(s, [f"other{i}"])
        srv2 = MetaGraphServer(ag2, name="graph2")
        srv2.serve(port=PORT + 1, background=True)
        time.sleep(0.2)
        try:
            mc = MultiGraphClient()
            mc.add_graph("127.0.0.1", PORT, name="g1")
            mc.add_graph("127.0.0.1", PORT + 1, name="g2")
            assert set(mc.list_graphs()) == {"g1", "g2"}
            res = mc.search(seqs[0].decode(), discovery_fraction=1.0)
            assert set(res) == {"g1", "g2"}
            assert len(res["g1"]) and "sample0" in set(res["g1"]["sample"])
            assert "other0" in set(res["g2"]["sample"])
            labels = mc.column_labels()
            assert labels["g2"] == ["other0", "other1"]
        finally:
            srv2.shutdown()


class TestConcurrency:
    def test_concurrent_mixed_requests(self, server_and_seqs):
        """8 threads hammer search/align/stats simultaneously (VERDICT r2
        #10: the ThreadingHTTPServer shares jitted functions and the engine
        lock across handler threads; results must match the serial ones)."""
        import concurrent.futures as cf
        _, seqs = server_and_seqs
        c = GraphClientJson("127.0.0.1", PORT)
        expect_search = [c.search(s.decode(), discovery_fraction=1.0)
                         for s in seqs]
        expect_align = [c.align(s[:60].decode()) for s in seqs]
        expect_stats = c.stats()

        def worker(t):
            cl = GraphClientJson("127.0.0.1", PORT)
            out = []
            for rep in range(6):
                i = (t + rep) % len(seqs)
                kind = (t + rep) % 3
                if kind == 0:
                    out.append(("search", i,
                                cl.search(seqs[i].decode(),
                                          discovery_fraction=1.0)))
                elif kind == 1:
                    out.append(("align", i, cl.align(seqs[i][:60].decode())))
                else:
                    out.append(("stats", i, cl.stats()))
            return out

        with cf.ThreadPoolExecutor(max_workers=8) as pool:
            results = [f.result() for f in
                       [pool.submit(worker, t) for t in range(8)]]
        for out in results:
            for kind, i, got in out:
                if kind == "search":
                    assert got == expect_search[i], i
                elif kind == "align":
                    assert got == expect_align[i], i
                else:

                    def _stable(s):
                        return {k: v for k, v in s.items()
                                if k != "process"}     # RSS varies
                    assert _stable(got) == _stable(expect_stats)
