import time, sys, os, numpy as np
import jax
from metagraph_tpu.seq_io.fasta import read_fasta
from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
from metagraph_tpu.annotation.column import ColumnMajorAnnotation
from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
from metagraph_tpu.query.pipeline import QueryEngine

cache = "/root/repo/.cache_bench_graph.npz"
recs = read_fasta("/root/reference/metagraph/tests/data/transcripts_1000.fa")
seqs = [r.seq for r in recs]
g = DBGSuccinct.load(cache)
anno = ColumnMajorAnnotation.load(cache[:-4] + "_anno.npz")
engine = QueryEngine(AnnotatedDBG(g, anno), use_device=True)
engine._build_device_index()
engine._build_device_annotation()
seqs_big = seqs * 4
warm = engine.query_batch_fused(seqs_big, "labels", 2**63, 1.0, 0.0)

# time sub-pieces
from metagraph_tpu import native
from metagraph_tpu.query.device import TILE
k = g.k
nthr = min(os.cpu_count() or 1, 8)
t0=time.perf_counter(); packed = native.tile_pack2(seqs_big, k, TILE, n_threads=nthr); t_pack=time.perf_counter()-t0
print("native tile_pack2:", round(t_pack*1e3,1), "ms")

for rep in range(3):
    rot = seqs_big[rep+1:] + seqs_big[:rep+1]
    t0=time.perf_counter()
    st = engine._fused_dispatch(rot, "labels", 1.0, 0.0)
    t1=time.perf_counter()
    out = engine._fused_collect(st, "labels", 2**63)
    t2=time.perf_counter()
    print(f"rep{rep}: dispatch {1e3*(t1-t0):.0f} ms, collect {1e3*(t2-t1):.0f} ms, total {1e3*(t2-t0):.0f} ms")
