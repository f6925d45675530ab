#!/usr/bin/env python
"""Experiment (r4 roofline attack): one combined gather per window.

The measured epoch is gather-ISSUE bound (~110M gathers/s on v5e via the
relay), not byte bound.  Inlining the annotation row words into each hash
bucket slot turns the epoch's two gathers/window (bucket row + anno row)
into one.  Tests BUCKET = 16/8/4 and int8-expand vs CSA counting.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from metagraph_tpu.seq_io.fasta import read_fasta
from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
from metagraph_tpu.annotation.column import ColumnMajorAnnotation
from metagraph_tpu.query.device import (DeviceQueryPipeline, tile_layout,
                                        _csa_add, _fold_tiles, TILE)
from metagraph_tpu.succinct import ops as graph_ops
from metagraph_tpu.annotation import ops as anno_ops


def _force(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    return int(np.asarray(leaf).reshape(-1)[:1][0])


def timeit(fn, *args, reps=4, warm=2):
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


def build_combined(keys, ids, bitmap_flat, Lw, bucket, load=0.45):
    """(N, W) keys + ids + (R, Lw) anno bitmap -> combined table
    (n_buckets, bucket*(W+1+Lw)) uint32: slot = [key | id | anno row]."""
    N, W = keys.shape
    n_buckets = max(2, int(2 ** np.ceil(np.log2(max(N, 1) / (bucket * load)))))
    while True:
        table = np.full((n_buckets, bucket, W + 1 + Lw), 0xFFFFFFFF,
                        dtype=np.uint32)
        fill = np.zeros(n_buckets, dtype=np.int32)
        remaining = np.arange(N)
        h = graph_ops._hash_words(keys, n_buckets, 1)
        ok_all = True
        for _ in range(bucket):
            if remaining.size == 0:
                break
            hh = h[remaining]
            order = np.argsort(hh, kind="stable")
            s = hh[order]
            first = np.ones(len(s), dtype=bool)
            first[1:] = s[1:] != s[:-1]
            cand = order[first]
            b = hh[cand]
            okm = fill[b] < bucket
            cand, b = cand[okm], b[okm]
            sel = remaining[cand]
            table[b, fill[b], :W] = keys[sel]
            table[b, fill[b], W] = ids[sel]
            rows = ids[sel].astype(np.int64) - 1
            table[b, fill[b], W + 1:] = bitmap_flat[rows]
            fill[b] += 1
            placed = np.zeros(len(remaining), dtype=bool)
            placed[cand] = True
            remaining = remaining[~placed]
        if remaining.size == 0:
            return table.reshape(n_buckets, bucket * (W + 1 + Lw))
        n_buckets *= 2


def main():
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache_bench_graph.npz")
    recs = read_fasta("/root/reference/metagraph/tests/data/transcripts_1000.fa")
    seqs = [r.seq for r in recs]
    g = DBGSuccinct.load(cache)
    anno = ColumnMajorAnnotation.load(cache[:-4] + "_anno.npz")
    pipe = DeviceQueryPipeline(g, anno)
    L = pipe.annotation.num_labels
    Lw = (L + 31) // 32
    print(f"device: {jax.devices()[0].platform}")

    seqs_big = seqs * rep
    S = len(seqs_big)
    queries_all, sids_all, _ = pipe.prepare_batch(seqs_big)
    tiles, tile_seq = tile_layout(queries_all, sids_all, S)
    N, T, W = tiles.shape
    nwin = len(queries_all)
    print(f"workload: {nwin} windows, {N} tiles x {T}, W={W}, Lw={Lw}")

    # host-side flat bitmap (R, Lw) for inlining
    bitmap_flat = anno_ops.pack_annotation_bitmap(anno, g.max_index())

    tiles_d = jax.device_put(tiles)
    tseq_d = jax.device_put(tile_seq)
    C = max(1, (1 << 17) // T)

    # ---- baseline epoch (two gathers, int8 / CSA)
    from metagraph_tpu.query.device import query_epoch_tiled

    @jax.jit
    def base_sum(tab, bm, q, ts):
        c, p, _ = query_epoch_tiled(tab, bm, q, ts, S, L)
        return c.sum() + p.sum()

    dt, _ = timeit(base_sum, pipe.index.table, pipe.annotation.bitmap,
                   tiles_d, tseq_d)
    print(f"two-gather int8 epoch:   {dt*1e3:7.1f} ms  "
          f"{nwin/dt/1e6:6.1f} Mk/s")

    # reference counts for correctness
    c_ref, p_ref, _ = query_epoch_tiled(
        pipe.index.table, pipe.annotation.bitmap, tiles_d, tseq_d, S, L)
    c_ref = np.asarray(c_ref)
    p_ref = np.asarray(p_ref)

    # ---- combined single-gather epochs
    def make_epoch(bucket, slot_w, use_csa):
        @functools.partial(jax.jit, static_argnums=())
        def run(tab2, q, ts):
            pad = (-N) % C
            qq = jnp.concatenate(
                [q, jnp.full((pad, T, W), jnp.iinfo(jnp.uint32).max,
                             q.dtype)]) if pad else q
            tss = jnp.concatenate([ts, jnp.zeros(pad, ts.dtype)]) \
                if pad else ts
            n_buckets = tab2.shape[0]

            def body(carry, x):
                qr = x.reshape(C * T, W)
                b = graph_ops._hash_words(qr, n_buckets, 1)
                rows = tab2[b].reshape(C * T, bucket, slot_w)
                eq = jnp.all(rows[:, :, :W] == qr[:, None, :], axis=-1)
                hit = jnp.any(eq, axis=-1)
                equ = eq.astype(jnp.uint32)
                words = jnp.sum(rows[:, :, W + 1:] * equ[:, :, None],
                                axis=1).reshape(C, T, Lw)
                hit = hit.reshape(C, T)
                words = words * hit[..., None].astype(jnp.uint32)
                if use_csa:
                    num = [words]
                    while num[0].shape[1] > 1:
                        t = num[0].shape[1]
                        A = [p2.reshape(C, t // 2, 2, Lw)[:, :, 0]
                             for p2 in num]
                        B = [p2.reshape(C, t // 2, 2, Lw)[:, :, 1]
                             for p2 in num]
                        num = _csa_add(A, B)
                    shifts = jnp.arange(32, dtype=jnp.uint32)
                    tc = jnp.zeros((C, Lw * 32), jnp.int32)
                    for pi, pl_ in enumerate(num):
                        bits = ((pl_[:, 0, :, None] >> shifts) & 1
                                ).astype(jnp.int32)
                        tc = tc + (bits << pi).reshape(C, Lw * 32)
                    tc = tc[:, :L]
                else:
                    shifts = jnp.arange(32, dtype=jnp.uint32)
                    bits = ((words[..., None] >> shifts) & 1).astype(jnp.int8)
                    tc = bits.sum(axis=1, dtype=jnp.int32).reshape(
                        C, Lw * 32)[:, :L]
                th = hit.sum(axis=1, dtype=jnp.int32)
                return carry, (tc, th)
            nc = qq.shape[0] // C
            _, (tc, th) = jax.lax.scan(body, 0, qq.reshape(nc, C, T, W))
            return _fold_tiles(tc.reshape(nc * C, L), th.reshape(nc * C),
                               tss, S)

        @jax.jit
        def run_sum(tab2, q, ts):
            c, p = run(tab2, q, ts)
            return c.sum() + p.sum()
        return run, run_sum

    keys = np.asarray(pipe.index_keys)
    ids = np.asarray(pipe.index_ids)
    for bucket in (16, 8, 4):
        tab2 = build_combined(keys, ids, bitmap_flat, Lw, bucket)
        slot_w = W + 1 + Lw
        rowB = tab2.shape[1] * 4
        memMB = tab2.nbytes / 1e6
        tab2_d = jax.device_put(tab2)
        for use_csa in (False, True):
            run, run_sum = make_epoch(bucket, slot_w, use_csa)
            dt, _ = timeit(run_sum, tab2_d, tiles_d, tseq_d)
            c2, p2 = run(tab2_d, tiles_d, tseq_d)
            same = (np.array_equal(np.asarray(c2), c_ref)
                    and np.array_equal(np.asarray(p2), p_ref))
            tag = "CSA " if use_csa else "int8"
            print(f"combined B={bucket:2d} {tag} ({rowB:5d} B rows, "
                  f"{memMB:5.0f} MB): {dt*1e3:7.1f} ms  "
                  f"{nwin/dt/1e6:6.1f} Mk/s  identical={same}")


if __name__ == "__main__":
    main()
