"""End-to-end build workflows (ref workflows/metagraph_workflows — the
Snakemake build pipeline, snakemake/build.smk:12-244).

The same staged DAG as the reference, driven directly in Python:

  per sample:  build canonical (+counts) -> clean -> contigs
  joint:       build canonical from all cleaned contigs -> primarize
               -> build primary joint graph
  annotation:  one column per sample -> convert to the target representation

Each stage writes its artifact to disk and is skipped when the output is
newer than its inputs (re-entrant, like Snakemake).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np


@dataclass
class WorkflowConfig:
    samples: List[str]                    # FASTA paths, one per sample
    output_dir: str
    k: int = 31
    count_kmers: bool = True
    prune_tips: int = 1
    prune_unitigs: int = 1                # 0 = auto threshold
    fallback: int = 1
    annotation_format: str = "column"     # or flat/brwt/row_diff_brwt/...
    sample_names: Optional[List[str]] = None
    base_name: Optional[str] = None       # artifact base (default "joint")
    labels_source: str = "sequence_file_names"  # or "sequence_headers"


def _outdated(target: str, *sources: str) -> bool:
    if not os.path.exists(target):
        return True
    t = os.path.getmtime(target)
    return any(os.path.exists(s) and os.path.getmtime(s) > t for s in sources)


def run_build_workflow(cfg: WorkflowConfig, log=print) -> dict:
    from ..seq_io.fasta import read_fasta, read_kmer_counts, write_extended_fasta, write_fasta
    from ..graph.dbg_succinct import DBGSuccinct
    from ..graph.cleaning import clean_graph_contigs
    from ..graph import traversal
    from ..graph.canonical import CanonicalDBG
    from ..annotation.column import ColumnMajorAnnotation
    from ..annotation.annotated_dbg import AnnotatedDBG
    from ..annotation.matrix import StaticAnnotation, convert_annotation

    os.makedirs(cfg.output_dir, exist_ok=True)
    names = cfg.sample_names or [
        os.path.basename(p).split(".")[0] for p in cfg.samples]

    # ---- stage 1: per-sample canonical graph + cleaning -> contigs ---------
    contig_files = []
    for path, name in zip(cfg.samples, names):
        out = os.path.join(cfg.output_dir, f"{name}.contigs.fasta.gz")
        contig_files.append(out)
        if not _outdated(out, path):
            log(f"[workflow] {name}: contigs up to date")
            continue
        log(f"[workflow] {name}: build + clean")
        recs = read_fasta(path)
        g = DBGSuccinct.build([r.seq for r in recs], cfg.k, mode="canonical",
                              with_counts=cfg.count_kmers)
        seqs, counts = clean_graph_contigs(
            g, prune_tips=cfg.prune_tips, prune_unitigs=cfg.prune_unitigs,
            fallback=cfg.fallback)
        table = g.alphabet.decode_table
        fasta = [(str(i), table[s].tobytes()) for i, s in enumerate(seqs)]
        if counts is not None:
            write_extended_fasta(out, fasta, counts, cfg.k)
        else:
            write_fasta(out, fasta)

    # ---- stage 2: joint canonical graph -> primarize -> primary graph -----
    base = cfg.base_name or "joint"
    joint_path = os.path.join(cfg.output_dir, f"{base}.dbg.npz")
    if _outdated(joint_path, *contig_files):
        log("[workflow] joint canonical graph + primarization")
        all_seqs = []
        for f in contig_files:
            all_seqs.extend(r.seq for r in read_fasta(f))
        gc = DBGSuccinct.build(all_seqs, cfg.k, mode="canonical")
        contigs = traversal.call_sequences(gc.boss, kmers_in_single_form=True)
        table = gc.alphabet.decode_table
        gp = DBGSuccinct.build([table[c].tobytes() for c in contigs], cfg.k,
                               mode="primary")
        gp.save(joint_path)
    graph = DBGSuccinct.load(joint_path)

    # ---- stage 3: per-sample annotation columns ----------------------------
    anno_base = cfg.base_name or "annotation"
    anno_path = os.path.join(cfg.output_dir,
                             f"{anno_base}.column.annodbg.npz")
    if _outdated(anno_path, joint_path, *contig_files):
        log("[workflow] annotate columns")
        wrapped = CanonicalDBG(graph)
        anno = ColumnMajorAnnotation(graph.max_index())
        ag = AnnotatedDBG(wrapped, anno)
        if cfg.labels_source == "sequence_headers":
            # label by the ORIGINAL input record headers (ref
            # AnnotationLabelsSource.SEQUENCE_HEADERS, workflow_configs.py);
            # contigs carry synthetic names, so annotate from the samples
            for path in cfg.samples:
                for rec in read_fasta(path):
                    ag.annotate_sequence(rec.seq, [rec.name])
        else:
            for f, name in zip(contig_files, names):
                for rec in read_fasta(f):
                    ag.annotate_sequence(rec.seq, [name])
        anno.save(anno_path[:-4])
    anno = ColumnMajorAnnotation.load(anno_path)

    # ---- stage 4: convert to the target representation ---------------------
    final_anno = anno_path
    if cfg.annotation_format != "column":
        final_anno = os.path.join(
            cfg.output_dir, f"{anno_base}.{cfg.annotation_format}.annodbg")
        if _outdated(final_anno, anno_path):
            log(f"[workflow] convert annotation -> {cfg.annotation_format}")
            m = convert_annotation(anno, cfg.annotation_format, graph=graph)
            StaticAnnotation(m, anno.encoder,
                             cfg.annotation_format).save(final_anno)

    return {"graph": joint_path, "annotation": final_anno,
            "contigs": contig_files,
            "num_nodes": graph.num_nodes(),
            "num_labels": anno.num_labels}
