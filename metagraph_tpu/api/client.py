"""Python API client (ref api/python/metagraph/client.py:24-380 — same
interface: GraphClientJson, GraphClient with DataFrames, MultiGraphClient)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Dict, Iterable, List, Optional, Tuple, Union

JsonDict = dict

DEFAULT_TOP_LABELS = 10000
DEFAULT_DISCOVERY_FRACTION = 0.7
DEFAULT_NUM_NODES_PER_SEQ_CHAR = 10.0


class GraphClientJson:
    def __init__(self, host: str, port: int, name: str = None,
                 api_path: str = None):
        self.host = host
        self.port = port
        self.server = f"http://{host}:{port}"
        if api_path:
            self.server = f"{self.server}/{api_path.lstrip('/')}"
        self.name = name if name else self.server

    def search(self, sequence: Union[str, Iterable[str]],
               top_labels: int = DEFAULT_TOP_LABELS,
               discovery_fraction: float = DEFAULT_DISCOVERY_FRACTION,
               with_signature: bool = False,
               abundance_sum: bool = False,
               query_counts: bool = False,
               query_coords: bool = False,
               align: bool = False,
               **align_params):
        if not 0.0 <= discovery_fraction <= 1.0:
            raise ValueError(
                "discovery_fraction should be between 0 and 1 inclusive. "
                f"Got {discovery_fraction}")
        if align:
            if isinstance(sequence, str):
                sequence = [sequence]
            else:
                sequence = list(sequence)
            alignments = self.align(sequence, **align_params)
            # unalignable reads keep their ORIGINAL sequence so the search
            # FASTA never contains empty records (which would desync the
            # positional result pairing below)
            aligned = [a["alignments"][0]["sequence"] if a["alignments"]
                       else s for a, s in zip(alignments, sequence)]
            sequence = aligned
        params = {"count_labels": True,
                  "discovery_fraction": discovery_fraction,
                  "top_labels": top_labels,
                  "with_signature": with_signature,
                  "abundance_sum": abundance_sum,
                  "query_counts": query_counts,
                  "query_coords": query_coords}
        results = self._json_seq_query(sequence, params, "search")
        if align:
            for alignment, res in zip(alignments, results):
                res["best_alignment"] = (alignment["alignments"][0]
                                         if alignment["alignments"] else {})
        return results

    def align(self, sequence: Union[str, Iterable[str]],
              min_exact_match: float = DEFAULT_DISCOVERY_FRACTION,
              max_alternative_alignments: int = 1,
              max_num_nodes_per_seq_char: float = DEFAULT_NUM_NODES_PER_SEQ_CHAR):
        if not 0.0 <= min_exact_match <= 1.0:
            raise ValueError(
                "min_exact_match should be between 0 and 1 inclusive. "
                f"Got {min_exact_match}")
        params = {"max_alternative_alignments": max_alternative_alignments,
                  "max_num_nodes_per_seq_char": max_num_nodes_per_seq_char,
                  "min_exact_match": min_exact_match}
        return self._json_seq_query(sequence, params, "align")

    def column_labels(self) -> List[str]:
        return self._do_request("column_labels", {}, post_req=False)

    def stats(self) -> dict:
        return self._do_request("stats", {}, post_req=False)

    def _json_seq_query(self, sequence, param_dict, endpoint):
        if isinstance(sequence, str):
            sequence = [sequence]
        fasta = "\n".join(f">{i}\n{s}" for i, s in enumerate(sequence))
        payload = {"FASTA": fasta, **param_dict}
        return self._do_request(endpoint, payload)

    def _do_request(self, endpoint, payload, post_req=True):
        url = f"{self.server}/{endpoint}"
        if post_req:
            req = urllib.request.Request(
                url, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
        else:
            req = urllib.request.Request(url)
        try:
            with urllib.request.urlopen(req) as resp:
                body = json.loads(resp.read())
        except urllib.error.HTTPError as e:
            # surface the server's JSON {"error": ...} detail (the reference
            # client raises the message, not just the status line)
            try:
                detail = json.loads(e.read()).get("error")
            except Exception:
                detail = None
            raise RuntimeError(detail or str(e)) from None
        if isinstance(body, dict) and "error" in body:
            raise RuntimeError(str(body["error"]))
        return body


class GraphClient:
    """DataFrame-returning client (requires pandas)."""

    def __init__(self, host: str, port: int, name: str = None,
                 api_path: str = None):
        self._json_client = GraphClientJson(host, port, name, api_path)
        self.name = self._json_client.name

    def search(self, sequence, **kwargs):
        import pandas as pd
        results = self._json_client.search(sequence, **kwargs)
        rows = []
        for res in results:
            for hit in res.get("results", []):
                row = dict(hit)
                row["seq_description"] = res.get("seq_description", "")
                rows.append(row)
        return pd.DataFrame(rows)

    def align(self, sequence, **kwargs):
        import pandas as pd
        results = self._json_client.align(sequence, **kwargs)
        rows = []
        for res in results:
            for a in res.get("alignments", []):
                row = dict(a)
                row["seq_description"] = res.get("seq_description", "")
                rows.append(row)
        return pd.DataFrame(rows)

    def column_labels(self):
        return self._json_client.column_labels()


class MultiGraphClient:
    def __init__(self):
        self.graphs: Dict[str, GraphClient] = {}

    def add_graph(self, host: str, port: int, name: str = None,
                  api_path: str = None):
        client = GraphClient(host, port, name, api_path)
        self.graphs[client.name] = client

    def list_graphs(self) -> Dict[str, Tuple[str, int]]:
        return {name: (c._json_client.host, c._json_client.port)
                for name, c in self.graphs.items()}

    def search(self, sequence, **kwargs):
        return {name: c.search(sequence, **kwargs)
                for name, c in self.graphs.items()}

    def align(self, sequence, **kwargs):
        return {name: c.align(sequence, **kwargs)
                for name, c in self.graphs.items()}

    def column_labels(self):
        return {name: c.column_labels() for name, c in self.graphs.items()}
