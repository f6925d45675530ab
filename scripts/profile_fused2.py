#!/usr/bin/env python
"""E2E query_batch_fused: wire path vs codes2 path, fresh inputs per rep."""
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
    from metagraph_tpu.query.pipeline import QueryEngine

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache_bench_graph.npz")
    g = DBGSuccinct.load(cache)
    anno = ColumnMajorAnnotation.load(cache[:-4] + "_anno.npz")
    recs = read_fasta("/root/reference/metagraph/tests/data/transcripts_1000.fa")
    base = [r.seq for r in recs] * 4
    nk = sum(max(len(s) - g.k + 1, 0) for s in base)

    for wire in (True, False):
        engine = QueryEngine(AnnotatedDBG(g, anno), use_device=True)
        if not wire:
            engine._build_device_index2 = lambda: None
        engine._build_device_annotation()
        _ = engine.query_batch_fused(base, "labels", 2 ** 63, 1.0, 0.0)
        ts = []
        for rep in range(5):
            seqs = base[rep:] + base[:rep]        # fresh byte layout
            t0 = time.perf_counter()
            p = engine.query_batch_fused(seqs, "labels", 2 ** 63, 1.0, 0.0)
            ts.append(time.perf_counter() - t0)
        lab = sum(len(x) for x in p)
        name = "wire " if wire else "codes2"
        print(f"{name}: min {min(ts)*1e3:.0f} ms "
              f"({[f'{x*1e3:.0f}' for x in ts]}) "
              f"-> {nk/min(ts)/1e6:.1f} Mk/s, {lab} labels", flush=True)


if __name__ == "__main__":
    main()
