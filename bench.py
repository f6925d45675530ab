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

    # flagship engine: bucketized hash index (1-2 wide gathers per query)
    hidx = ops.DeviceHashIndex.from_packed(
        ops.pack_kmers32(kchars), valid_edges.astype(np.uint32))
    log(f"hash index: {hidx.table.shape[0]} buckets "
        f"({hidx.table.nbytes/1e6:.0f} MB)")

    BATCH = 1 << 20   # large batches amortize relay RPC latency
    from metagraph_tpu.parallel.sharding import pad_rows
    qpad = pad_rows(queries, BATCH, fill=np.iinfo(np.uint32).max)
    batches = qpad.reshape(-1, BATCH, queries.shape[1])

    lookup = jax.jit(hidx.lookup)
    # distinct rolled copies per rep so no cache layer can serve repeats
    reps = 5
    qdev = [[jax.device_put(np.roll(b, r, axis=0)) for b in batches]
            for r in range(reps)]
    lookup(qdev[0][0]).block_until_ready()       # warmup/compile

    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        outs = [lookup(b) for b in qdev[r]]
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
    dt = min(times)   # best-of: the relay adds heavy run-to-run noise
    dev_kps = n_kmers / dt
    log(f"device: {dt*1e3:.1f} ms/epoch (median {np.median(times)*1e3:.1f}) "
        f"-> {dev_kps/1e6:.1f} M kmers/s on {jax.devices()[0].platform}")

    # sanity: results must match host mapping
    got = np.array(lookup(jax.device_put(batches[0])))[:1000]
    want = g.boss.map_to_edges_batch(wins[valid][:1000])
    assert np.array_equal(got, want), "device/host mismatch"

    # CPU baseline: host searchsorted path (single core, numpy)
    sub = wins[valid]
    order = packing.boss_priority_order(K)
    sorted_keys, _ = packing.unique_rows(packing.pack_codes(kchars, order))
    qk = packing.pack_codes(sub, order)
    cpu_dt = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        packing.searchsorted_rows(sorted_keys, qk)
        cpu_dt = min(cpu_dt, time.perf_counter() - t0)
    cpu_kps = n_kmers / cpu_dt
    log(f"cpu baseline: {cpu_dt*1e3:.1f} ms -> {cpu_kps/1e6:.2f} M kmers/s")

    print(json.dumps({
        "metric": "batch_query_throughput",
        "value": round(dev_kps / 1e6, 2),
        "unit": "Mkmers/s",
        "vs_baseline": round(dev_kps / cpu_kps, 2),
    }))


if __name__ == "__main__":
    main()
