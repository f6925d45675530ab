#!/usr/bin/env python
"""Dedup (query-graph) epoch vs per-occurrence epoch on the chip
(VERDICT r5 task 1).

Two regimes on the bench graph (591,997 nodes, 1000 labels):
  A. the bench workload (1000 reads x4 replicas): distinct/total ~ 0.10,
     but D ~ R, so the compact [hit|words] table is the same size class
     as the annotation bitmap (slow gather class)
  B. a high-duplication batch (100 reads x40): D << R — the compact table
     drops into the fast (<~34 MB) gather class

Counts are asserted identical to the per-occurrence epoch in both.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=3, warm=1):
    for _ in range(warm):
        r = fn(*args)
    _ = int(np.asarray(r[1]).sum())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        _ = int(np.asarray(r[1]).sum())
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def main():
    from metagraph_tpu.seq_io.fasta import read_fasta
    from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
    from metagraph_tpu.annotation.column import ColumnMajorAnnotation
    from metagraph_tpu.query.device import (DeviceQueryPipeline,
                                            query_epoch_tiled,
                                            query_epoch_dedup, dedup_batch,
                                            tile_layout)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache_bench_graph.npz")
    recs = read_fasta(
        "/root/reference/metagraph/tests/data/transcripts_1000.fa")
    seqs = [r.seq for r in recs]
    g = DBGSuccinct.load(cache)
    anno = ColumnMajorAnnotation.load(cache[:-4] + "_anno.npz")
    pipe = DeviceQueryPipeline(g, anno)
    L = pipe.annotation.num_labels
    Lw = (L + 31) // 32

    for name, batch in (("bench x4 (D~R)", seqs * 4),
                        ("100 reads x40 (D<<R)", seqs[:100] * 40)):
        S = len(batch)
        q, sid, _ = pipe.prepare_batch(batch)
        tiles, tseq = tile_layout(q, sid, S)
        t0 = time.perf_counter()
        dkeys, dtiles, dtseq, D = dedup_batch(q, sid, S)
        host_dedup = time.perf_counter() - t0
        wd_mb = len(dkeys) * (Lw + 1) * 4 / 1e6
        print(f"\n{name}: {len(q)} windows, {D} distinct "
              f"(ratio {len(q)/D:.2f}); host dedup {host_dedup*1e3:.0f} ms; "
              f"compact table {wd_mb:.0f} MB", flush=True)
        targs = (pipe.index.table, pipe.annotation.bitmap,
                 jax.device_put(tiles), jax.device_put(tseq))
        dt_t, r_t = timeit(
            lambda a, b, c, d: query_epoch_tiled(a, b, c, d, S, L)[:2],
            *targs)
        print(f"  per-occurrence epoch: {dt_t*1e3:7.1f} ms  "
              f"{len(q)/dt_t/1e6:5.1f} Mk/s", flush=True)
        dargs = (pipe.index.table, pipe.annotation.bitmap,
                 jax.device_put(dkeys), jax.device_put(dtiles),
                 jax.device_put(dtseq))
        dt_d, r_d = timeit(
            lambda a, b, c, d, e: query_epoch_dedup(a, b, c, d, e, S, L),
            *dargs)
        same = (np.array_equal(np.asarray(r_t[0]), np.asarray(r_d[0]))
                and np.array_equal(np.asarray(r_t[1]), np.asarray(r_d[1])))
        print(f"  dedup epoch:          {dt_d*1e3:7.1f} ms  "
              f"{len(q)/dt_d/1e6:5.1f} Mk/s  counts identical={same}",
              flush=True)


if __name__ == "__main__":
    main()
