import time, os, numpy as np, jax
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
engine._build_device_index(); engine._build_device_annotation()
seqs_big = seqs * 4
warm = engine.query_batch_fused(seqs_big, "labels", 2**63, 1.0, 0.0)
# correctness vs host
host = engine.anno_graph  # byte anchor compare on the first 50
nk = 5886508
best = np.inf
for rep in range(4):
    rot = seqs_big[rep+1:] + seqs_big[:rep+1]
    t0=time.perf_counter()
    payloads = engine.query_batch_fused(rot, "labels", 2**63, 1.0, 0.0)
    dt = time.perf_counter()-t0; best=min(best,dt)
    print(f"rep{rep}: {dt*1e3:.0f} ms -> {nk/dt/1e6:.1f} Mkmers/s, {sum(len(p) for p in payloads)} labels")
print("best:", round(nk/best/1e6,1), "Mkmers/s")
