#!/usr/bin/env python
"""Profile the fused query epoch's stages on the device (VERDICT r3 next #1:
find where the bytes go between the measured epoch and its ~344 Mkmers/s
gather-bound roofline).

Times, per stage, on the bench workload (591,997-node graph, 1000 labels,
~5.9M windows):
  - hash lookup only (one bucket-row gather + compares per window)
  - annotation row gather only
  - count stage variants: int8 expand+sum (current), CSA bit-plane popcount
  - full epoch with each count variant

Usage: python scripts/profile_epoch.py [--cpu]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(r):
    """Force a real device->host readback (the relay's block_until_ready
    can return before execution completes)."""
    import jax
    leaf = jax.tree_util.tree_leaves(r)[0]
    return int(np.asarray(leaf).reshape(-1)[:1][0])


def timeit(fn, *args, reps=5, warm=2):
    for _ in range(warm):
        r = fn(*args)
    _force(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        _force(r)
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rep", type=int, default=4)
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp

    from metagraph_tpu.seq_io.fasta import read_fasta
    from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
    from metagraph_tpu.annotation.column import ColumnMajorAnnotation
    from metagraph_tpu.query.device import (DeviceQueryPipeline, tile_layout,
                                            _tile_label_counts,
                                            _tile_label_counts_expand,
                                            _fold_tiles, TILE)
    from metagraph_tpu.succinct import ops as graph_ops
    from metagraph_tpu.annotation import ops as anno_ops

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache_bench_graph.npz")
    recs = read_fasta("/root/reference/metagraph/tests/data/transcripts_1000.fa")
    seqs = [r.seq for r in recs]
    g = DBGSuccinct.load(cache) if os.path.exists(cache) \
        else DBGSuccinct.build(seqs, 20)
    anno = ColumnMajorAnnotation.load(cache[:-4] + "_anno.npz")
    pipe = DeviceQueryPipeline(g, anno)
    L = pipe.annotation.num_labels
    dev = jax.devices()[0].platform
    print(f"device: {dev}", flush=True)

    seqs_big = seqs * args.rep
    S = len(seqs_big)
    queries_all, sids_all, _ = pipe.prepare_batch(seqs_big)
    tiles, tile_seq = tile_layout(queries_all, sids_all, S)
    N, T, W = tiles.shape
    nwin = len(queries_all)
    print(f"workload: {nwin} windows, {N} tiles x {T}, W={W}, L={L}")

    tiles_d = jax.device_put(tiles)
    tseq_d = jax.device_put(tile_seq)
    table = pipe.index.table
    bitmap = pipe.annotation.bitmap

    C = max(1, (1 << 17) // T)

    # ---- stage: hash lookup only
    def _lookup_all(tab, q):
        def body(carry, qq):
            nodes = graph_ops._hash_lookup(tab, qq.reshape(C * T, W))
            return carry, nodes.reshape(C, T)
        pad = (-N) % C
        qq = jnp.concatenate(
            [q, jnp.full((pad, T, W), jnp.iinfo(jnp.uint32).max, q.dtype)]) \
            if pad else q
        _, nodes = jax.lax.scan(body, 0, qq.reshape(-1, C, T, W))
        return nodes.reshape(-1, T)

    # timing variant returns a scalar so the relay readback isn't the thing
    # being measured
    stage_lookup_sum = jax.jit(
        lambda tab, q: _lookup_all(tab, q).sum(dtype=jnp.int64))
    dt, _ = timeit(stage_lookup_sum, table, tiles_d)
    print(f"hash lookup only:  {dt*1e3:7.1f} ms  {nwin/dt/1e6:7.1f} Mk/s")

    nodes_d = jax.device_put(
        np.asarray(jax.jit(_lookup_all)(table, tiles_d))[:N])

    # ---- stage: annotation gather only
    @jax.jit
    def stage_gather(bm, nodes):
        def body(carry, nn):
            hit = nn > 0
            rows = jnp.where(hit, nn - 1, 0)
            words = anno_ops.gather_anno_rows(bm, rows, L) \
                * hit[..., None].astype(jnp.uint32)
            # cheap consume (xor-reduce over T) so the gather can't be DCEd
            return carry, jax.lax.reduce(
                words, np.uint32(0), jax.lax.bitwise_xor, (1,))
        pad = (-nodes.shape[0]) % C
        nn = jnp.concatenate([nodes, jnp.zeros((pad, T), nodes.dtype)]) \
            if pad else nodes
        _, acc = jax.lax.scan(body, 0, nn.reshape(-1, C, T))
        return acc

    dt, _ = timeit(stage_gather, bitmap, nodes_d)
    print(f"anno gather only:  {dt*1e3:7.1f} ms  {nwin/dt/1e6:7.1f} Mk/s")

    # ---- stage: count variants (gather + count, no lookup)
    def make_count(count_fn):
        @jax.jit
        def run(bm, nodes, tseq):
            pad = (-nodes.shape[0]) % C
            nn = jnp.concatenate([nodes, jnp.zeros((pad, T), nodes.dtype)]) \
                if pad else nodes
            ts = jnp.concatenate([tseq, jnp.zeros(pad, tseq.dtype)]) \
                if pad else tseq

            def body(carry, x):
                tc, th = count_fn(bm, x, L)
                return carry, (tc, th)
            _, (tc, th) = jax.lax.scan(body, 0, nn.reshape(-1, C, T))
            nc = nn.shape[0]
            return _fold_tiles(tc.reshape(nc, L), th.reshape(nc), ts, S)

        @jax.jit
        def run_sum(bm, nodes, tseq):
            c, p = run(bm, nodes, tseq)
            return c.sum(dtype=jnp.int64) + p.sum(dtype=jnp.int64)
        return jax.jit(run), run_sum

    base_full, base_sum = make_count(_tile_label_counts_expand)
    csa_full, csa_sum = make_count(_tile_label_counts)
    dt, _ = timeit(base_sum, bitmap, nodes_d, tseq_d)
    print(f"gather+count int8: {dt*1e3:7.1f} ms  {nwin/dt/1e6:7.1f} Mk/s")
    dt, _ = timeit(csa_sum, bitmap, nodes_d, tseq_d)
    print(f"gather+count CSA:  {dt*1e3:7.1f} ms  {nwin/dt/1e6:7.1f} Mk/s")
    r_base = base_full(bitmap, nodes_d, tseq_d)
    r_csa = csa_full(bitmap, nodes_d, tseq_d)
    same = (np.array_equal(np.asarray(r_base[0]), np.asarray(r_csa[0]))
            and np.array_equal(np.asarray(r_base[1]), np.asarray(r_csa[1])))
    print(f"count variants identical: {same}")

    # ---- full epoch (counts matrix stays on device; scalar readback)
    from metagraph_tpu.query.device import query_epoch_tiled

    @jax.jit
    def full_sum(tab, bm, q, ts):
        c, p, nodes = query_epoch_tiled(tab, bm, q, ts, S, L)
        return c.sum(dtype=jnp.int64) + p.sum(dtype=jnp.int64)

    dt, _ = timeit(full_sum, table, bitmap, tiles_d, tseq_d)
    print(f"full epoch (CSA):  {dt*1e3:7.1f} ms  {nwin/dt/1e6:7.1f} Mk/s")


if __name__ == "__main__":
    main()
