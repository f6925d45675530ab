#!/usr/bin/env python
"""Interleaved same-run comparison: wire-split / wire-unsplit / codes2."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
    from metagraph_tpu.annotation.column import ColumnMajorAnnotation
    from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
    from metagraph_tpu.seq_io.fasta import read_fasta
    from metagraph_tpu.query import pipeline as qp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache_bench_graph.npz")
    g = DBGSuccinct.load(cache)
    anno = ColumnMajorAnnotation.load(cache[:-4] + "_anno.npz")
    recs = read_fasta("/root/reference/metagraph/tests/data/transcripts_1000.fa")
    base = [r.seq for r in recs] * 4
    nk = sum(max(len(s) - g.k + 1, 0) for s in base)

    def mk(wire, split):
        e = qp.QueryEngine(AnnotatedDBG(g, anno), use_device=True)
        if not wire:
            e._build_device_index2 = lambda: None
        e._split_override = split
        return e

    # patch the split heuristic via a wrapper
    orig = qp.QueryEngine.query_batch_fused

    engines = {
        "wire-split4": mk(True, 4),
        "wire-unsplit": mk(True, 1),
        "codes2": mk(False, 1),
    }

    import metagraph_tpu.query.pipeline as pl

    def run(e, seqs):
        if e._split_override == 1:
            e._build_device_annotation()
            st = e._fused_dispatch(seqs, "labels", 1.0, 0.0)
            return e._fused_collect(st, "labels", 2 ** 63)
        return orig(e, seqs, "labels", 2 ** 63, 1.0, 0.0)

    for name, e in engines.items():
        _ = run(e, base)
    res = {k: [] for k in engines}
    for rep in range(4):
        seqs = base[rep + 1:] + base[:rep + 1]
        for name, e in engines.items():
            t0 = time.perf_counter()
            p = run(e, seqs)
            res[name].append(time.perf_counter() - t0)
    for name, ts in res.items():
        print(f"{name:13s}: min {min(ts)*1e3:5.0f} ms "
              f"({[f'{x*1e3:.0f}' for x in ts]}) "
              f"-> {nk/min(ts)/1e6:.1f} Mk/s", flush=True)


if __name__ == "__main__":
    main()
