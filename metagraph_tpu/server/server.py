"""HTTP query server (ref src/cli/server.cpp — endpoint contract at
:379 POST /search, :503 POST /align, :517 GET /column_labels, :543 GET /stats;
JSON shapes match the reference so its Python client works unmodified)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ..utils.timer import get_curr_rss as _get_curr_rss
from ..utils.timer import get_peak_rss as _get_peak_rss


def _parse_fasta_string(fasta: str):
    records = []
    name, seq = None, []
    for line in fasta.splitlines():
        if line.startswith(">"):
            if name is not None:
                records.append((name, "".join(seq)))
            name = line[1:].split()[0] if len(line) > 1 else ""
            seq = []
        else:
            seq.append(line.strip())
    if name is not None:
        records.append((name, "".join(seq)))
    return records


class MetaGraphServer:
    def __init__(self, anno_graph, aligner_config=None, name: str = "graph",
                 use_device: bool = False):
        from ..query.pipeline import QueryEngine
        self.anno_graph = anno_graph
        self.engine = QueryEngine(anno_graph, use_device=use_device)
        self.name = name
        self._aligner = None
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._engine_lock = threading.Lock()
        if use_device:
            # build the device index/annotation once, up front (requests are
            # served from worker threads; the jitted calls are thread-safe)
            self.engine._build_device_index()
            self.engine._build_device_annotation()

    # -------------------------------------------------------------- search
    def search(self, payload: dict) -> list:
        fasta = payload.get("FASTA")
        if fasta is None:
            raise ValueError("No input sequences received from client")
        discovery = float(payload.get("discovery_fraction", 0.7))
        if not 0.0 <= discovery <= 1.0:
            raise ValueError("Discovery fraction should be within [0, 1.0]")
        try:
            top = int(payload.get("top_labels", 10000))
        except (TypeError, ValueError):
            raise ValueError("Value is not convertible to Int.")
        anno = self.anno_graph.annotator
        if payload.get("query_coords", False):
            if not getattr(anno, "has_coords", False):
                # ref server.cpp check_labels_in_coordinates
                raise ValueError(
                    "Annotation does not support k-mer coordinate queries")
            mode = "coords"
        elif payload.get("query_counts", False):
            if not getattr(anno, "has_values", False) \
                    and not getattr(anno, "has_coords", False):
                raise ValueError(
                    "Annotation does not support k-mer count queries")
            mode = "counts"
        elif payload.get("with_signature", False):
            mode = "signature"
        elif payload.get("abundance_sum", False):
            if not getattr(anno, "has_values", False) \
                    and not getattr(anno, "has_coords", False):
                raise ValueError(
                    "Annotation does not support k-mer count queries")
            mode = "counts-sum"
        else:
            mode = "matches"

        from ..seq_io.fasta import FastaRecord
        records = [FastaRecord(n, s.encode())
                   for n, s in _parse_fasta_string(fasta)]
        out = []
        for res in self.engine.query_records(records, mode, top, discovery, 0.0):
            out.append(json.loads(res.to_json(False, self.anno_graph.graph.k)))
        out.sort(key=lambda r: r.get("seq_description", ""))
        return out

    # --------------------------------------------------------------- align
    def align(self, payload: dict) -> list:
        from ..align.aligner import DBGAligner
        from ..align.config import AlignerConfig
        fasta = payload.get("FASTA")
        if fasta is None:
            raise ValueError("No input sequences received from client")
        g = self.anno_graph.graph
        base = g.graph if hasattr(g, "get_base_node") else g
        alpha = getattr(base, "alphabet", None)
        cfg = AlignerConfig(
            min_exact_match=float(payload.get("min_exact_match", 0.7)),
            num_alternative_paths=max(
                1, int(payload.get("max_alternative_alignments", 1))),
            max_nodes_per_seq_char=float(
                payload.get("max_num_nodes_per_seq_char", 5.0)),
            protein=alpha is not None and alpha.name == "Protein",
        )
        aligner = DBGAligner(self.anno_graph.graph, cfg)
        records = _parse_fasta_string(fasta)
        # lockstep batch: every read's extension waves batch into one kernel
        # call per global step (align/batch.py)
        results = aligner.align_batch([s.encode() for _, s in records])
        out = []
        for (name, seq), paths in zip(records, results):
            entry = {"seq_description": name, "alignments": []}
            max_score = cfg.match_score(seq) + cfg.left_end_bonus \
                + cfg.right_end_bonus
            for path in paths:
                entry["alignments"].append({
                    "score": path.score,
                    "max_score": max_score,
                    "sequence": path.sequence.decode(),
                    "cigar": path.cigar.to_string(),
                    "orientation": path.orientation,
                })
            out.append(entry)
        return out

    # --------------------------------------------------------------- stats
    def stats(self) -> dict:
        g = self.anno_graph.graph
        anno = self.anno_graph.annotator
        base = g.graph if hasattr(g, "get_base_node") else g
        return {
            "graph": {
                "k": g.k,
                "nodes": int(base.num_nodes()),
                "is_canonical_mode": g.mode == "canonical",
            },
            "annotation": {
                "labels": int(anno.num_labels),
                "objects": int(anno.num_rows),
                "representation": getattr(anno, "representation", "column"),
            },
            "process": {                       # ref unix_tools get_*_RSS
                "curr_rss_mb": round(_get_curr_rss() / 1e6, 1),
                "peak_rss_mb": round(_get_peak_rss() / 1e6, 1),
            },
        }

    def column_labels(self) -> list:
        return list(self.anno_graph.annotator.encoder.labels)

    # ------------------------------------------------------------- serving
    def serve(self, host: str = "127.0.0.1", port: int = 5555,
              background: bool = False):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                try:
                    if self.path.rstrip("/").endswith("stats"):
                        self._reply(200, server.stats())
                    elif self.path.rstrip("/").endswith("column_labels"):
                        self._reply(200, server.column_labels())
                    else:
                        self._reply(404, {"error": "unknown endpoint"})
                except Exception as e:
                    self._reply(400, {"error": str(e)})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(n) or b"{}"
                    try:
                        payload = json.loads(body)
                    except json.JSONDecodeError as e:
                        raise ValueError(f"Bad json received: {e}")
                    if self.path.rstrip("/").endswith("search"):
                        self._reply(200, server.search(payload))
                    elif self.path.rstrip("/").endswith("align"):
                        self._reply(200, server.align(payload))
                    else:
                        self._reply(404, {"error": "unknown endpoint"})
                except ValueError as e:
                    self._reply(400, {"error": str(e)})
                except Exception as e:
                    self._reply(500, {"error": str(e)})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        if background:
            t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
            t.start()
            return t
        self._httpd.serve_forever()

    def shutdown(self):
        if self._httpd:
            self._httpd.shutdown()
