#!/usr/bin/env python
"""Profiling utility for the device query path.

    python scripts/profile.py epoch      # stage-by-stage fused-epoch timing
    python scripts/profile.py pipeline   # sub-batch relay pipelining sweep

Both subcommands expect the bench graph cache (.cache_bench_graph.npz +
_anno.npz) produced by a prior `python bench.py` run at the repo root.
"""
import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load():
    from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
    from metagraph_tpu.annotation.column import ColumnMajorAnnotation
    from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
    from metagraph_tpu.seq_io.fasta import read_fasta
    from metagraph_tpu.query.pipeline import QueryEngine
    cache = os.path.join(REPO, ".cache_bench_graph.npz")
    g = DBGSuccinct.load(cache)
    anno = ColumnMajorAnnotation.load(cache[:-4] + "_anno.npz")
    recs = read_fasta(
        "/root/reference/metagraph/tests/data/transcripts_1000.fa")
    seqs = [r.seq for r in recs] * 4
    engine = QueryEngine(AnnotatedDBG(g, anno), use_device=True)
    engine._build_device_index()
    return g, engine, seqs


def cmd_epoch():
    """Stage-by-stage timing of the fused query epoch on the TPU:
    unpack+pack, +hash probe, +annotation gather, +count."""
    import jax
    import jax.numpy as jnp
    from metagraph_tpu.query.device import TILE, pad_tile_rows
    from metagraph_tpu.succinct import ops as graph_ops
    from metagraph_tpu.annotation import ops as anno_ops
    from metagraph_tpu import native

    g, engine, seqs = _load()
    danno = engine._build_device_annotation()
    table = engine._device_index.table
    bitmap = danno.bitmap
    L = danno.num_labels
    k = K = g.k
    TK = TILE + k - 1

    tiles2, validb, tile_seq, nwins = native.tile_pack2(
        seqs, k, TILE, n_threads=8)
    n = len(tiles2)
    C = max(1, (1 << 17) // TILE)
    npad = pad_tile_rows(n, C)
    tiles2 = np.concatenate(
        [tiles2, np.zeros((npad - n, tiles2.shape[1]), tiles2.dtype)])
    validb = np.concatenate(
        [validb, np.zeros((npad - n, validb.shape[1]), validb.dtype)])
    print(f"{npad} tiles x {TILE}, {npad*TILE/1e6:.1f}M window slots",
          flush=True)

    sh2 = jnp.arange(0, 8, 2, dtype=jnp.uint8)
    sh1 = jnp.arange(8, dtype=jnp.uint8)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    nc = len(tiles2) // C

    def stage_body(stage, x):
        p2, vb = x
        c4 = ((p2[..., None] >> sh2) & 3).reshape(C, -1)[:, :TK]
        v8 = ((vb[..., None] >> sh1) & 1).reshape(C, -1)[:, :TK]
        chunk = jnp.where(v8 == 1, c4.astype(jnp.int32) + 1, 5)
        pk, valid = graph_ops.device_pack_windows(chunk, K)
        if stage == 0:
            return pk.sum(dtype=jnp.uint32) + valid.sum(dtype=jnp.uint32)
        W = pk.shape[-1]
        nodes = graph_ops._hash_lookup(table, pk.reshape(C * TILE, W))
        nodes = jnp.where(valid, nodes.reshape(C, TILE), 0)
        if stage == 1:
            return nodes.sum(dtype=jnp.int32)
        hit = nodes > 0
        rows = jnp.where(hit, nodes - 1, 0)
        words = anno_ops.gather_anno_rows(bitmap, rows, L) \
            * hit[..., None].astype(jnp.uint32)
        if stage == 2:
            return words.sum(dtype=jnp.uint32)
        bits = ((words[..., None] >> shifts) & 1).astype(jnp.int8)
        tc = bits.sum(axis=1, dtype=jnp.int32).reshape(C, -1)
        return tc.sum(dtype=jnp.int32)

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_stage(t2, vb, stage):
        def body(acc, x):
            return acc + stage_body(stage, x).astype(jnp.int64), None
        acc, _ = jax.lax.scan(
            body, jnp.int64(0),
            (t2.reshape(nc, C, -1), vb.reshape(nc, C, -1)))
        return acc

    names = ["unpack+pack", "+probe", "+annogather", "+count"]
    for stage in range(4):
        ts = []
        for rep in range(3):
            t2 = jax.device_put(np.roll(tiles2, rep + 1, axis=0))
            vb = jax.device_put(np.roll(validb, rep + 1, axis=0))
            jax.block_until_ready((t2, vb))
            t0 = time.perf_counter()
            r = run_stage(t2, vb, stage)
            _ = int(np.asarray(r))
            ts.append(time.perf_counter() - t0)
        # first rep includes compile
        print(f"stage {stage} ({names[stage]}): {min(ts)*1e3:.1f} ms "
              f"(all: {[f'{x*1e3:.0f}' for x in ts]})", flush=True)


def cmd_pipeline():
    """Does pipelining sub-batches through the relay overlap upload, compute,
    and readback?  Monolithic batch vs 2/4-way split with async enqueue."""
    import jax.numpy as jnp
    from metagraph_tpu.query.pipeline import _thresholds
    from metagraph_tpu.query.device import (TILE, query_epoch_codes2,
                                            pad_tile_rows)
    from metagraph_tpu import native

    g, engine, seqs = _load()
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
                table, danno.bitmap, jnp.asarray(tiles2),
                jnp.asarray(validb), jnp.asarray(tile_seq),
                jnp.asarray(dsel), jnp.asarray(selmin),
                Spad, L, k, TILE + k - 1)[0]
            outs.append((m, S))         # no block: enqueue next immediately
        tot = 0
        for m, S in outs:
            tot += int(np.asarray(m)[:S].sum())
        return time.perf_counter() - t0, tot

    for nsplit in (1, 2, 4):
        q = len(seqs) // nsplit
        parts = [seqs[i * q:(i + 1) * q] for i in range(nsplit)]
        run_chunked(parts, 99)          # warm compile for this shape set
        ts = []
        for rep in range(3):
            dt, tot = run_chunked(parts, rep)
            ts.append(dt)
        print(f"split={nsplit}: {min(ts)*1e3:6.1f} ms "
              f"({[f'{x*1e3:.0f}' for x in ts]})  checksum={tot}", flush=True)


if __name__ == "__main__":
    cmds = {"epoch": cmd_epoch, "pipeline": cmd_pipeline}
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        print(__doc__)
        sys.exit(2)
    cmds[sys.argv[1]]()
