#!/usr/bin/env python
"""Stage timing of the wire epoch: extract+valid, +probe, +gather, +count."""
import functools
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
    from metagraph_tpu.query.pipeline import QueryEngine
    from metagraph_tpu.query.device import TILE, pad_tile_rows, \
        wire_words_layout
    from metagraph_tpu.succinct import ops as graph_ops
    from metagraph_tpu.annotation import ops as anno_ops
    from metagraph_tpu import native

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache_bench_graph.npz")
    g = DBGSuccinct.load(cache)
    anno = ColumnMajorAnnotation.load(cache[:-4] + "_anno.npz")
    recs = read_fasta("/root/reference/metagraph/tests/data/transcripts_1000.fa")
    seqs = [r.seq for r in recs] * 4
    engine = QueryEngine(AnnotatedDBG(g, anno), use_device=True)
    idx2 = engine._build_device_index2()
    danno = engine._build_device_annotation()
    bitmap = danno.bitmap
    L = danno.num_labels
    k = g.k
    T = TILE

    tiles2, validb, tile_seq, nwins = native.tile_pack2(seqs, k, T,
                                                        n_threads=8)
    n = len(tiles2)
    C = max(1, (1 << 17) // T)
    npad = pad_tile_rows(n, C)
    words_h, vwords_h = wire_words_layout(tiles2, validb, k, T, npad)
    nc = npad // C
    NW = words_h.shape[1]
    NV = vwords_h.shape[1]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    print(f"{npad} tiles, NW={NW} NV={NV}", flush=True)

    def stage_body(stage, x):
        wd, vw = x
        keys = graph_ops.extract_windows2(wd, k, T)
        valid = graph_ops.window_valid2(vw, k, T)
        if stage == 0:
            return keys.sum(dtype=jnp.uint32) + valid.sum(dtype=jnp.uint32)
        nodes = graph_ops._hash_lookup(idx2.table, keys.reshape(C * T, 2))
        nodes = jnp.where(valid, nodes.reshape(C, T), 0)
        if stage == 1:
            return nodes.sum(dtype=jnp.int32)
        hit = nodes > 0
        rows = jnp.where(hit, nodes - 1, 0)
        words_a = anno_ops.gather_anno_rows(bitmap, rows, L) \
            * hit[..., None].astype(jnp.uint32)
        if stage == 2:
            return words_a.sum(dtype=jnp.uint32)
        bits = ((words_a[..., None] >> shifts) & 1).astype(jnp.int8)
        tc = bits.sum(axis=1, dtype=jnp.int32).reshape(C, -1)
        return tc.sum(dtype=jnp.int32)

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_stage(wd, vw, stage):
        def body(acc, x):
            return acc + stage_body(stage, x).astype(jnp.int32), None
        acc, _ = jax.lax.scan(
            body, jnp.int32(0),
            (wd.reshape(nc, C, NW), vw.reshape(nc, C, NV)))
        return acc

    names = ["extract+valid", "+probe", "+annogather", "+count"]
    for stage in range(4):
        ts = []
        for rep in range(3):
            wd = jax.device_put(np.roll(words_h, rep + 1, axis=0))
            vw = jax.device_put(np.roll(vwords_h, rep + 1, axis=0))
            jax.block_until_ready((wd, vw))
            t0 = time.perf_counter()
            r = run_stage(wd, vw, stage)
            _ = int(np.asarray(r))
            ts.append(time.perf_counter() - t0)
        print(f"stage {stage} ({names[stage]}): {min(ts)*1e3:.1f} ms "
              f"(all: {[f'{x*1e3:.0f}' for x in ts]})", flush=True)


if __name__ == "__main__":
    main()
