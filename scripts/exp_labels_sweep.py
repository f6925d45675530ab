#!/usr/bin/env python
"""Epoch cost vs label count (VERDICT r5 tasks 3+8).

Measures, at L = 1k / 16k / 64k labels over the bench graph's real mapped
rows (5.9M windows):
  - dense-bitmap count epoch (count_epoch_tiled; the r4 production path)
  - block-sparse count epoch (annotation/sparse_device.py; O(nnz) memory)
with byte-identity checks between the two.

The synthetic annotation draws ~4 labels per row plus 500 dense rows
(~30% density) — the core-genome skew shape that breaks naive sparse
schemes.
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
    from metagraph_tpu.query.device import (DeviceQueryPipeline, tile_layout,
                                            count_epoch_tiled)
    from metagraph_tpu.query.pipeline import QueryEngine
    from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
    from metagraph_tpu.annotation.column import ColumnMajorAnnotation
    from metagraph_tpu.annotation import ops as anno_ops
    from metagraph_tpu.annotation.sparse_device import (
        DeviceBlockSparseAnno, sparse_count_epoch)

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache_bench_graph.npz")
    recs = read_fasta(
        "/root/reference/metagraph/tests/data/transcripts_1000.fa")
    seqs = [r.seq for r in recs]
    g = DBGSuccinct.load(cache)
    anno0 = ColumnMajorAnnotation.load(cache[:-4] + "_anno.npz")
    eng = QueryEngine(AnnotatedDBG(g, anno0), use_device=True)
    seqs_big = seqs * 4
    S = len(seqs_big)
    nodes_list = eng.map_batch(seqs_big)
    flat = np.concatenate(nodes_list)
    seq_ids = np.repeat(np.arange(S, dtype=np.int32),
                        [len(n) for n in nodes_list])
    rows1 = np.where(flat > 0, flat, 0).astype(np.int32)
    tiles, tile_seq = tile_layout(rows1, seq_ids, S, fill=0)
    R = g.max_index()
    nwin = int((rows1 > 0).sum())
    print(f"workload: {len(flat)} windows ({nwin} hits), R={R}, S={S}")

    rng = np.random.default_rng(0)
    import os as _os
    Ls = tuple(int(x) for x in _os.environ.get(
        "SWEEP_LS", "1000,16384,65536").split(","))
    for L in Ls:
        if L not in (1000, 16384, 65536):
            continue
        rng = np.random.default_rng(L)
        # ~4 labels/row + 500 dense rows at ~30% density
        n_per = rng.geometric(1 / 4.0, R).clip(1, 16)
        rr = np.repeat(np.arange(R), n_per)
        cc = rng.integers(0, L, len(rr))
        dense_rows = rng.choice(R, 500, replace=False)
        dl = max(int(L * 0.3), 1)
        rr = np.concatenate([rr, np.repeat(dense_rows, dl)])
        cc = np.concatenate([cc, rng.integers(0, L, 500 * dl)])
        Lw = -(-L // 32)
        bitmap = np.zeros((R, Lw), np.uint32)
        bitmap[rr, cc // 32] |= np.uint32(1) << (cc % 32).astype(np.uint32)
        nnz_blocks = int((bitmap != 0).sum())
        print(f"\nL={L}: nnz blocks {nnz_blocks} "
              f"({nnz_blocks/R:.1f}/row), dense bitmap "
              f"{R*Lw*4/1e9:.2f} GB", flush=True)

        class _M:                      # packed shim over the bitmap
            num_labels = L
            num_rows = R

            def get_rows_words(self, rows):
                return bitmap[rows]

            def get_rows_mask(self, rows):
                w = bitmap[rows]
                return np.unpackbits(w.view(np.uint8), axis=1,
                                     bitorder="little")[:, :L]

        t0 = time.perf_counter()
        sp = DeviceBlockSparseAnno.from_matrix(_M(), R)
        conv_dt = time.perf_counter() - t0
        print(f"  sparse conversion: {conv_dt:.1f} s, "
              f"{sp.nbytes/1e6:.0f} MB device (tau {sp.tau}, dense side "
              f"{sp.dense8.shape[0]-1} patterns)", flush=True)
        td = jnp.asarray(tiles)
        ts = jnp.asarray(tile_seq)
        dt_s, r_s = timeit(lambda a, b: sparse_count_epoch(sp, a, b, S, L),
                           td, ts)
        print(f"  sparse epoch: {dt_s*1e3:7.1f} ms  "
              f"{len(flat)/dt_s/1e6:5.1f} Mk/s", flush=True)
        # dense comparison (fits HBM up to 64k labels at this R)
        try:
            bm = anno_ops.DeviceAnnotation.from_bitmap(bitmap, L)
            dt_d, r_d = timeit(
                lambda a, b: count_epoch_tiled(bm.bitmap, a, b, S, L),
                td, ts)
            same = (np.array_equal(np.asarray(r_s[0]), np.asarray(r_d[0]))
                    and np.array_equal(np.asarray(r_s[1]),
                                       np.asarray(r_d[1])))
            print(f"  dense epoch:  {dt_d*1e3:7.1f} ms  "
                  f"{len(flat)/dt_d/1e6:5.1f} Mk/s  "
                  f"sparse/dense {dt_s/dt_d:.2f}x  identical={same}",
                  flush=True)
            del bm
        except Exception as e:
            print(f"  dense epoch: failed ({str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()
