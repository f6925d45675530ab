"""Full device (TPU) batch query pipeline.

One jitted step covers the per-batch hot path of `metagraph query`:
window packing -> hash-index lookup -> annotation row gather -> per-sequence
label counts.  Thresholding/top-k/formatting stay on host (tiny per-sequence
work).  Produces results identical to the host pipeline.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..annotation import ops as anno_ops
from ..annotation.annotated_dbg import get_min_count
from ..succinct import ops as graph_ops


@functools.partial(jax.jit, static_argnums=(4, 5))
def query_step(table: jnp.ndarray, bitmap: jnp.ndarray, queries: jnp.ndarray,
               seq_ids: jnp.ndarray, num_seqs: int, num_labels: int):
    """packed k-mer windows (Q, W) + seq ids -> (counts, present, nodes)."""
    nodes = graph_ops._hash_lookup(table, queries)
    counts, present = anno_ops.count_labels(bitmap, nodes, seq_ids,
                                            num_seqs, num_labels)
    return counts, present, nodes


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def query_epoch(table: jnp.ndarray, bitmap: jnp.ndarray, queries: jnp.ndarray,
                seq_ids: jnp.ndarray, num_seqs: int, num_labels: int,
                chunk: int = 1 << 17):
    """Whole-workload query in ONE dispatch: lax.scan over fixed chunks keeps
    the bit-expansion intermediate bounded while XLA pipelines the chunks.

    The batch is padded internally to a chunk multiple with 0xFFFFFFFF
    sentinel keys (never a valid packed k-mer -> lookup miss) and seq_id 0,
    so misses contribute nothing to counts/present."""
    pad = (-queries.shape[0]) % chunk
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.full((pad, queries.shape[1]),
                               jnp.iinfo(jnp.uint32).max, queries.dtype)])
        seq_ids = jnp.concatenate(
            [seq_ids, jnp.zeros(pad, seq_ids.dtype)])
    n = queries.shape[0] // chunk
    qs = queries.reshape(n, chunk, queries.shape[1])
    ss = seq_ids.reshape(n, chunk)

    def body(acc, x):
        q, s = x
        nodes = graph_ops._hash_lookup(table, q)
        c, p = anno_ops.count_labels_matmul(bitmap, nodes, s, num_seqs,
                                            num_labels)
        return (acc[0] + c, acc[1] + p), None

    init = (jnp.zeros((num_seqs, num_labels), jnp.float32),
            jnp.zeros(num_seqs, jnp.float32))
    (counts, present), _ = jax.lax.scan(body, init, (qs, ss))
    return counts.astype(jnp.int32), present.astype(jnp.int32)


def _rowmin_packed(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rowwise lexicographic min of two (N, W) packed-word arrays."""
    lt = np.zeros(len(a), dtype=bool)
    decided = np.zeros(len(a), dtype=bool)
    for j in range(a.shape[1]):
        lt |= ~decided & (a[:, j] < b[:, j])
        decided |= a[:, j] != b[:, j]
    return np.where(lt[:, None], a, b)


class DeviceQueryPipeline:
    def __init__(self, graph, annotation):
        boss = graph.boss
        valid_edges = np.flatnonzero(boss.valid)
        kchars = boss.get_edge_seq(valid_edges)
        self.index = graph_ops.DeviceHashIndex.from_packed(
            graph_ops.pack_kmers32(kchars), valid_edges.astype(np.uint32))
        self.annotation = anno_ops.DeviceAnnotation.from_column_annotation(
            annotation, graph.max_index())
        self.graph = graph
        self.anno = annotation
        self.k = graph.k

    def prepare_batch(self, seqs: List[bytes]):
        """host-side packing of a sequence batch -> device inputs.

        For canonical-mode graphs each window is canonicalized (packed min of
        fwd/rc), matching DBGSuccinct.map_to_nodes (ref sequence_graph.hpp:49).
        """
        k = self.k
        ex = self.graph.extractor
        canonical = getattr(self.graph, "mode", None) == "canonical"
        comp = np.concatenate(
            [ex.alphabet.complement_table,
             np.arange(ex.alphabet.sigma, ex._invalid + 1)]).astype(np.uint8) \
            if canonical else None
        from .. import native
        if native.get_lib() is not None:
            sep = np.array([ex.alphabet.sigma], dtype=np.uint8)
            codes_list = [ex.encode(s) for s in seqs]
            num_kmers = [max(len(c) - k + 1, 0) for c in codes_list]
            cat = np.concatenate(
                [np.concatenate([c, sep]) for c in codes_list]) \
                if codes_list else sep[:0]
            if len(cat) >= k:
                all_packed = native.pack_windows_boss(cat, k, bits=32)
                if canonical:
                    rc_packed = native.pack_windows_boss(
                        np.ascontiguousarray(comp[cat[::-1]]), k,
                        bits=32)[::-1]
                    all_packed = _rowmin_packed(all_packed, rc_packed)
                q_parts, sid_parts = [], []
                off = 0
                for i, c in enumerate(codes_list):
                    n = num_kmers[i]
                    if n:
                        q_parts.append(all_packed[off: off + n])
                        sid_parts.append(np.full(n, i, dtype=np.int32))
                    off += len(c) + 1
                if q_parts:
                    return (np.concatenate(q_parts),
                            np.concatenate(sid_parts), num_kmers)
            W = (k + 7) // 8
            return (np.zeros((0, W), dtype=np.uint32),
                    np.zeros(0, dtype=np.int32), num_kmers)
        q_parts, sid_parts = [], []
        num_kmers = []
        for i, s in enumerate(seqs):
            codes = ex.encode(s)
            n = max(len(codes) - k + 1, 0)
            num_kmers.append(n)
            if n == 0:
                continue
            wins = np.lib.stride_tricks.sliding_window_view(codes, k)
            bad = np.concatenate([[0], np.cumsum(codes >= ex.alphabet.sigma)])
            valid = (bad[k:] - bad[:-k]) == 0
            packed = np.zeros((n, graph_ops._ceil_div(k, 8)), dtype=np.uint32)
            if valid.any():
                pk = graph_ops.pack_kmers32(wins[valid])
                if canonical:
                    rc_wins = np.lib.stride_tricks.sliding_window_view(
                        comp[codes[::-1]], k)[::-1]
                    pk = _rowmin_packed(
                        pk, graph_ops.pack_kmers32(rc_wins[valid]))
                packed[valid] = pk
                packed[~valid] = np.iinfo(np.uint32).max
            else:
                packed[:] = np.iinfo(np.uint32).max
            q_parts.append(packed)
            sid_parts.append(np.full(n, i, dtype=np.int32))
        if q_parts:
            queries = np.concatenate(q_parts)
            seq_ids = np.concatenate(sid_parts)
        else:
            queries = np.zeros((0, graph_ops._ceil_div(k, 8)), dtype=np.uint32)
            seq_ids = np.zeros(0, dtype=np.int32)
        return queries, seq_ids, num_kmers

    def query_labels(self, seqs: List[bytes], mode: str = "labels",
                     num_top_labels: int = 2 ** 63,
                     discovery_fraction: float = 0.7,
                     presence_fraction: float = 0.0):
        """LABELS / MATCHES for a batch; payloads identical to the host path.

        Note: counts here are per *distinct row occurrence* as in the host
        path (duplicate k-mers count multiply — segment-sum does exactly
        that).
        """
        queries, seq_ids, num_kmers = self.prepare_batch(seqs)
        S = len(seqs)
        counts, present, _ = query_step(
            self.index.table, self.annotation.bitmap, jnp.asarray(queries),
            jnp.asarray(seq_ids), S, self.annotation.num_labels)
        counts = np.asarray(counts)
        present = np.asarray(present)
        enc = self.anno.encoder
        out = []
        for i in range(S):
            nk = num_kmers[i]
            if nk == 0:
                out.append([])
                continue
            min_count = get_min_count(discovery_fraction, presence_fraction,
                                      nk, int(present[i]))
            if present[i] < min_count:
                out.append([])
                continue
            sel = np.flatnonzero(counts[i] >= min_count)
            if mode == "labels":
                out.append([enc.decode(int(c)) for c in sel])
            else:
                pairs = sorted(((int(counts[i][c]), -int(c)) for c in sel),
                               reverse=True)
                pairs = pairs[: num_top_labels] if num_top_labels < len(pairs) \
                    else pairs
                out.append([(enc.decode(-negc), n) for n, negc in pairs])
        return out
