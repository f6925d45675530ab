#!/usr/bin/env python
"""Does pipelining sub-batches through the axon relay overlap upload,
compute, and readback?  Compare: monolithic batch vs 2/4-way split with
async enqueue, plus single-buffer upload."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
    from metagraph_tpu.annotation.column import ColumnMajorAnnotation
    from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
    from metagraph_tpu.seq_io.fasta import read_fasta
    from metagraph_tpu.query.pipeline import QueryEngine, _thresholds
    from metagraph_tpu.query.device import (TILE, query_epoch_codes2,
                                            pad_tile_rows)
    from metagraph_tpu import native

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache_bench_graph.npz")
    g = DBGSuccinct.load(cache)
    anno = ColumnMajorAnnotation.load(cache[:-4] + "_anno.npz")
    recs = read_fasta("/root/reference/metagraph/tests/data/transcripts_1000.fa")
    seqs = [r.seq for r in recs] * 4
    engine = QueryEngine(AnnotatedDBG(g, anno), use_device=True)
    engine._build_device_index()
    danno = engine._build_device_annotation()
    table = engine._device_index.table
    L = danno.num_labels
    k = g.k

    def prep(sub, rep):
        S = len(sub)
        Spad = 1 << max(int(np.ceil(np.log2(max(S, 1)))), 3)
        tiles2, validb, tile_seq, nwins = native.tile_pack2(
            sub, k, TILE, n_threads=8)
        n = len(tiles2)
        C = max(1, (1 << 17) // TILE)
        npad = pad_tile_rows(n, C)
        tiles2 = np.concatenate(
            [tiles2, np.zeros((npad - n, tiles2.shape[1]), tiles2.dtype)])
        validb = np.concatenate(
            [validb, np.zeros((npad - n, validb.shape[1]), validb.dtype)])
        tile_seq = np.concatenate(
            [tile_seq, np.zeros(npad - n, tile_seq.dtype)])
        dsel, selmin = _thresholds(nwins, 1.0, 0.0, Spad)
        tiles2 = np.roll(tiles2, rep, axis=0)
        return tiles2, validb, tile_seq, dsel, selmin, Spad, S

    def run_chunked(parts, rep):
        outs = []
        t0 = time.perf_counter()
        for sub in parts:
            tiles2, validb, tile_seq, dsel, selmin, Spad, S = prep(sub, rep)
            m = query_epoch_codes2(
                table, danno.bitmap, jnp.asarray(tiles2), jnp.asarray(validb),
                jnp.asarray(tile_seq), jnp.asarray(dsel), jnp.asarray(selmin),
                Spad, L, k, TILE + k - 1)[0]
            outs.append((m, S))           # no block: enqueue next immediately
        tot = 0
        for m, S in outs:
            tot += int(np.asarray(m)[:S].sum())
        return time.perf_counter() - t0, tot

    for nsplit in (1, 2, 4):
        q = len(seqs) // nsplit
        parts = [seqs[i * q:(i + 1) * q] for i in range(nsplit)]
        # warm compile for this shape set
        run_chunked(parts, 99)
        ts = []
        for rep in range(3):
            dt, tot = run_chunked(parts, rep)
            ts.append(dt)
        print(f"split={nsplit}: {min(ts)*1e3:6.1f} ms "
              f"({[f'{x*1e3:.0f}' for x in ts]})  checksum={tot}", flush=True)


if __name__ == "__main__":
    main()
