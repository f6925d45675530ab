#!/usr/bin/env python
"""Time the production query_batch_fused call with internal phase stamps."""
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
    seqs = [r.seq for r in recs] * 4
    engine = QueryEngine(AnnotatedDBG(g, anno), use_device=True)
    engine._build_device_index()
    engine._build_device_annotation()
    warm = engine.query_batch_fused(seqs, "labels", 2 ** 63, 1.0, 0.0)
    assert warm is not None
    n_labels = sum(len(p) for p in warm)
    ts = []
    for rep in range(5):
        t0 = time.perf_counter()
        p = engine.query_batch_fused(seqs, "labels", 2 ** 63, 1.0, 0.0)
        ts.append(time.perf_counter() - t0)
    print(f"query_batch_fused: {min(ts)*1e3:.0f} ms "
          f"({[f'{x*1e3:.0f}' for x in ts]}), {n_labels} labels")


if __name__ == "__main__":
    main()
