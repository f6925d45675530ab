"""HTTP server + Python client end-to-end (ref integration_tests/test_api.py)."""

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
