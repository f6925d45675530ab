#!/usr/bin/env python
"""Break down cmd_query --device (query_batch_fused) wall time on the TPU:
host pack, upload, dispatch, selection download, payload assembly."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from metagraph_tpu.seq_io.fasta import read_fasta
    from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
    from metagraph_tpu.annotation.column import ColumnMajorAnnotation
    from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
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
    S = len(seqs)

    engine = QueryEngine(AnnotatedDBG(g, anno), use_device=True)
    engine._build_device_index()
    danno = engine._build_device_annotation()
    L = danno.num_labels
    k = g.k
    Spad = 1 << max(int(np.ceil(np.log2(max(S, 1)))), 3)

    # warm
    _ = engine.query_batch_fused(seqs, "labels", 2 ** 63, 1.0, 0.0)

    for rep in range(3):
        t = {}
        t0 = time.perf_counter()
        packed = native.tile_pack2(seqs, k, TILE,
                                   n_threads=min(os.cpu_count() or 1, 8))
        t["pack"] = time.perf_counter() - t0

        tiles2, validb, tile_seq, nwins = packed
        t0 = time.perf_counter()
        n = len(tiles2)
        C = max(1, (1 << 17) // TILE)
        npad = pad_tile_rows(n, C)
        if npad != n:
            tiles2 = np.concatenate(
                [tiles2, np.zeros((npad - n, tiles2.shape[1]), tiles2.dtype)])
            validb = np.concatenate(
                [validb, np.zeros((npad - n, validb.shape[1]), validb.dtype)])
            tile_seq = np.concatenate(
                [tile_seq, np.zeros(npad - n, tile_seq.dtype)])
        dsel, selmin = _thresholds(nwins, 1.0, 0.0, Spad)
        t["pad+thr"] = time.perf_counter() - t0

        # roll bytes so the relay can't serve a cached execution
        tiles2 = np.roll(tiles2, rep, axis=0)
        validb = np.roll(validb, rep, axis=0)
        t0 = time.perf_counter()
        dt2 = jax.device_put(tiles2)
        dvb = jax.device_put(validb)
        dts = jax.device_put(tile_seq)
        dds = jax.device_put(dsel)
        dsm = jax.device_put(selmin)
        jax.block_until_ready((dt2, dvb, dts, dds, dsm))
        t["upload"] = time.perf_counter() - t0
        nbytes = tiles2.nbytes + validb.nbytes + tile_seq.nbytes
        t0 = time.perf_counter()
        mask, counts, present, nodes_t = query_epoch_codes2(
            engine._device_index.table, danno.bitmap, dt2, dvb, dts,
            dds, dsm, Spad, L, k, TILE + k - 1)
        jax.block_until_ready(mask)
        t["dispatch"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        mask_h = np.asarray(mask)[:S]
        t["mask_dl"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        rows, cols, vals = engine._hits_from_mask(mask_h, counts, L, False)
        t["hits"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        payloads = engine._payloads_from_hits(
            rows, cols, vals, lambda i: None, nwins, "labels", 2 ** 63)
        t["payload"] = time.perf_counter() - t0
        total = sum(t.values())
        print(f"rep{rep}: total={total*1e3:.0f}ms  "
              + "  ".join(f"{kk}={v*1e3:.0f}ms" for kk, v in t.items())
              + f"  (upload {nbytes/1e6:.1f} MB)", flush=True)
    print(f"tiles {tiles2.shape} validb {validb.shape} S={S}")


if __name__ == "__main__":
    main()
