"""Command line interface (ref src/cli/ — main.cpp:24-91 dispatch, config.cpp
flags).  Subcommands mirror the reference's: build, annotate, query, stats,
align, assemble, clean, transform, transform_anno, server_query, concatenate,
merge, compare, extend.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _add_common(p):
    p.add_argument("-o", "--outfile-base", dest="out", default="graph")
    p.add_argument("-p", "--parallel", type=int, default=1)
    # ref config.cpp:190: threads per batch inside nested batch parallelism;
    # here both feed the engine's host thread count (the device dispatch is
    # already batch-parallel internally)
    p.add_argument("--parallel-each", type=int, default=1)
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--mmap", action="store_true",
                   help="memory-map graph arrays instead of loading them "
                        "(build: write the mmap on-disk layout) "
                        "(ref --mmap, src/cli/config/config.cpp:122)")


def _add_align_scoring_flags(p):
    """Scoring/extension knobs shared by `align` and `query --align`
    (ref cli/config/config.hpp:114-145; CLI stores penalties as positives,
    negated in initialize_aligner_config, align.cpp:33-70)."""
    p.add_argument("--align-match-score", type=int, default=2)
    p.add_argument("--align-mm-transition-penalty", type=int, default=3)
    p.add_argument("--align-mm-transversion-penalty", type=int, default=3)
    p.add_argument("--align-gap-open-penalty", type=int, default=6)
    p.add_argument("--align-gap-extension-penalty", type=int, default=2)
    p.add_argument("--align-end-bonus", type=int, default=5)
    p.add_argument("--align-xdrop", type=int, default=27)
    p.add_argument("--align-max-nodes-per-seq-char", type=float, default=5.0)
    p.add_argument("--align-max-num-seeds-per-locus", type=int, default=1000)
    p.add_argument("--align-max-ram", type=float, default=200.0)
    p.add_argument("--align-rel-score-cutoff", type=float, default=0.95)
    p.add_argument("--align-no-seed-complexity-filter", action="store_true")


def _aligner_scoring_kwargs(args):
    """args -> AlignerConfig kwargs for the shared scoring flags."""
    return dict(
        match_score_val=args.align_match_score,
        transition=-args.align_mm_transition_penalty,
        transversion=-args.align_mm_transversion_penalty,
        gap_opening_penalty=-args.align_gap_open_penalty,
        gap_extension_penalty=-args.align_gap_extension_penalty,
        left_end_bonus=args.align_end_bonus,
        right_end_bonus=args.align_end_bonus,
        xdrop=args.align_xdrop,
        max_nodes_per_seq_char=args.align_max_nodes_per_seq_char,
        max_num_seeds_per_locus=args.align_max_num_seeds_per_locus,
        max_ram_per_alignment=args.align_max_ram,
        rel_score_cutoff=args.align_rel_score_cutoff,
        seed_complexity_filter=not args.align_no_seed_complexity_filter,
        edit_distance=getattr(args, "align_edit_distance", False),
    )



def _load_annotation_for(graph_base: str, anno_path: str):
    """Load an annotation and attach staged row-diff routing sidecars
    (.rd_succ/.anchors next to the graph) when the matrix needs them
    (ref IRowDiff::load_anchor / load_fork_succ)."""
    from ..annotation.matrix import load_annotation
    anno = load_annotation(anno_path)
    if getattr(getattr(anno, "matrix", None), "needs_sidecars", False):
        anno.matrix.attach_sidecars(graph_base)
    return anno


def cmd_build(args):
    from ..seq_io.fasta import read_fasta, read_kmer_counts
    from ..graph.dbg_succinct import DBGSuccinct
    from ..utils.timer import PhaseTimer

    from ..seq_io.kmc import is_kmc_file, read_kmers

    _parse_timer = PhaseTimer("parse input").__enter__()
    # KMC databases fix k — resolve it BEFORE parsing any input so window
    # weights computed for FASTA inputs use the final k
    for f in args.input:
        if is_kmc_file(f):
            from ..seq_io.kmc import KMCReader
            kmc_k = KMCReader(f).k
            if kmc_k != args.k:
                print(f"warning: using k={kmc_k} from KMC database",
                      file=sys.stderr)
                args.k = kmc_k
            break
    seqs = []
    weights = []
    have_weights = False
    for f in args.input:
        if is_kmc_file(f):
            # KMC database input: each k-mer is a k-length sequence with count
            # (ref cli/build.cpp kmc path; expand rc unless canonical mode)
            chars, counts, kmc_k = read_kmers(
                f, both_from_canonical=(args.mode != "canonical"))
            assert kmc_k == args.k          # resolved in the pre-pass
            seqs.extend(chars[i].tobytes() for i in range(len(chars)))
            if args.count_kmers:
                have_weights = True
                weights.extend(np.array([c], dtype=np.uint64) for c in counts)
            else:
                weights.extend([None] * len(chars))
            continue
        recs = read_fasta(f)
        seqs.extend(r.seq for r in recs)
        counts = read_kmer_counts(f) if args.count_kmers else None
        if counts is not None:
            have_weights = True
            weights.extend(counts)
        elif args.count_kmers:
            # Logan-style per-sequence ka:f/km:f header abundances stand in
            # for per-window counts (ref string_utils.cpp:26-36 used by
            # parse_sequences.hpp for --count-kmers)
            from ..seq_io.fasta import parse_abundance
            got_any = False
            rec_w = []
            for r in recs:
                ab = parse_abundance(getattr(r, "comment", "") or r.name)
                if ab is not None:
                    got_any = True
                    rec_w.append(np.full(max(len(r.seq) - args.k + 1, 0),
                                         ab, dtype=np.uint64))
                else:
                    rec_w.append(None)
            if got_any:
                have_weights = True
                weights.extend(rec_w)
            else:
                weights.extend([None] * len(recs))
        else:
            weights.extend([None] * len(recs))
    if have_weights:
        k = args.k
        weights = [np.asarray(w, dtype=np.uint64) if w is not None
                   else np.ones(max(len(s) - k + 1, 0), dtype=np.uint64)
                   for s, w in zip(seqs, weights)]
    _parse_timer.__exit__()
    if args.suffix is not None:
        # suffix-sharded chunk build (ref build.cpp:110-158): keep only
        # k-mers whose node ends with the suffix; '$'-suffixes hold no
        # real k-mers in the set-based chunk format
        from ..kmer.alphabets import ALPHABETS
        from ..kmer.extractor import KmerExtractor
        ex = KmerExtractor(ALPHABETS[args.alphabet])
        collector_mode = {"basic": "basic", "canonical": "both",
                          "primary": "basic"}[args.mode]
        kmers, _ = ex.extract(seqs, args.k, mode=collector_mode)
        if "$" in args.suffix:
            kmers = kmers[:0]
        else:
            scodes = ex.encode(args.suffix)
            L = len(scodes)
            keep = np.all(kmers[:, args.k - 1 - L: args.k - 1]
                          == scodes[None, :], axis=1)
            kmers = kmers[keep]
        np.savez_compressed(f"{args.out}.{args.suffix}.chunk.npz",
                            kmers=kmers, k=args.k, mode=args.mode,
                            alphabet=args.alphabet)
        print(f"chunk {args.suffix}: {len(kmers)} k-mers", file=sys.stderr)
        return
    if getattr(args, "graph", "succinct") != "succinct":
        from ..graph import build_graph
        g = build_graph(args.graph, seqs, args.k, mode=args.mode)
        g.save(args.out)
        print(f"graph built: k={args.k} nodes={g.num_nodes()}",
              file=sys.stderr)
        return
    mem_cap = None if args.mem_cap_gb is None \
        else int(args.mem_cap_gb * (1 << 30))
    if getattr(args, "mesh_shards", 0):
        # mesh-sharded device construction (bit-identical to the host
        # pipeline; falls back on bucket-cap overflow)
        from ..kmer.alphabets import ALPHABETS
        from ..succinct.boss import BOSS
        from ..graph.dbg_succinct import DBGSuccinct as _DS
        if args.alphabet != "DNA" or args.count_kmers:
            raise SystemExit("[error] --mesh-shards supports the DNA "
                             "alphabet without counts (use the host "
                             "pipeline otherwise)")
        with PhaseTimer(f"construct BOSS (mesh x{args.mesh_shards})"):
            from ..parallel.build_device import sharded_build_boss_device
            mode_map = {"basic": "basic", "canonical": "both",
                        "primary": "basic"}
            try:
                arrays = sharded_build_boss_device(
                    seqs, args.k, n_devices=args.mesh_shards,
                    mode=mode_map[args.mode])
            except RuntimeError as e:
                print(f"warning: {e}; falling back to host pipeline",
                      file=sys.stderr)
                arrays = None
        if arrays is not None:
            g = _DS(BOSS(arrays), args.k, args.mode,
                    mask_dummy=args.mask_dummy)
            g.boss.state = args.state
            if getattr(args, "index_ranges", 0):
                g.boss.index_suffix_ranges(args.index_ranges)
            with PhaseTimer("serialize"):
                g.save(args.out,
                       mmap_layout=args.mmap or args.state == "fast")
            print(f"graph built: k={args.k} nodes={g.num_nodes()}",
                  file=sys.stderr)
            return
    with PhaseTimer("construct BOSS"):
        # dummy k-mers stay visible unless --mask-dummy, and the state tag
        # selects the artifact layout (ref build.cpp:340, boss.hpp:325)
        from ..kmer.alphabets import ALPHABETS
        if args.alphabet == "Protein" and args.mode != "basic":
            # no reverse complement for amino acids (ref: canonical modes are
            # not compiled for the Protein alphabet)
            raise SystemExit("[error] canonical/primary modes are not "
                             "supported for the Protein alphabet")
        g = DBGSuccinct.build(seqs, args.k, mode=args.mode,
                              alphabet=ALPHABETS[args.alphabet],
                              with_counts=args.count_kmers,
                              bits_per_count=args.count_width,
                              mask_dummy=args.mask_dummy,
                              window_weights=weights if have_weights else None,
                              disk_swap=args.disk_swap, mem_cap_bytes=mem_cap,
                              device=getattr(args, "device", False))
    g.boss.state = args.state
    if getattr(args, "index_ranges", 0):
        with PhaseTimer("index suffix ranges"):
            g.boss.index_suffix_ranges(args.index_ranges)
    with PhaseTimer("serialize"):
        g.save(args.out, mmap_layout=args.mmap or args.state == "fast")
    print(f"graph built: k={args.k} nodes={g.num_nodes()}", file=sys.stderr)


def cmd_clean(args):
    from ..graph.dbg_succinct import DBGSuccinct
    from ..graph.cleaning import clean_graph_contigs
    from ..seq_io.fasta import write_fasta, write_extended_fasta

    g = DBGSuccinct.load(args.input[0])
    seqs, counts = clean_graph_contigs(
        g, min_count=args.min_count, max_count=args.max_count,
        prune_tips=args.prune_tips, prune_unitigs=args.prune_unitigs,
        fallback=args.fallback, unitigs=args.unitigs,
        smoothing_window=args.smoothing_window,
        num_singleton_kmers=args.num_singletons)
    table = g.alphabet.decode_table
    recs = [(str(i), table[s].tobytes()) for i, s in enumerate(seqs)]
    out = args.out if args.out.endswith(".gz") else args.out + ".fasta.gz"
    if counts is not None:
        write_extended_fasta(out, recs, counts, g.k)
    else:
        write_fasta(out, recs)
    print(f"wrote {len(recs)} contigs to {out}", file=sys.stderr)


def cmd_stats(args):
    from ..graph.dbg_succinct import DBGSuccinct
    from ..annotation.column import ColumnMajorAnnotation

    files = list(args.input)
    if args.annotation:
        files.append(args.annotation)
    for f in files:
        if f.endswith(".seqs"):
            # CoordToHeader stats (ref cli/stats.cpp:373-427)
            from ..annotation.coord_to_header import CoordToHeader
            cth = CoordToHeader.load(f)
            print(f"Statistics for CoordToHeader mapping '{f}'")
            print("================ COORD-TO-HEADER STATS =================")
            print(f"columns: {cth.num_columns()}")
            total_seqs = sum(cth.num_sequences(c)
                             for c in range(cth.num_columns()))
            total_kmers = sum(int(cth.offsets[c][-1])
                              for c in range(cth.num_columns()))
            print(f"total sequences: {total_seqs}")
            print(f"total k-mers: {total_kmers}")
            if args.verbose:
                print("=================== PER-COLUMN STATS "
                      "===================")
                for c in range(cth.num_columns()):
                    n = cth.num_sequences(c)
                    km = int(cth.offsets[c][-1])
                    print(f"column {c}:")
                    print(f"  sequences: {n} "
                          f"({chr(9).join(cth.get_headers(c))})")
                    print(f"  k-mers: {km}")
                    print(f"  k-mers per sequence: "
                          f"{km / n if n else 0:.1f}")
                print("=" * 56)
            continue
        if f.endswith(".annodbg.npz") or f.endswith(".annodbg"):
            from ..annotation.matrix import load_annotation
            a = load_annotation(f)
            print(f"labels: {a.num_labels}")
            print(f"objects: {a.num_rows}")
            if hasattr(a, "column_rows"):
                nnz = sum(len(a.column_rows(c)) for c in range(a.num_labels))
            elif getattr(getattr(a, "matrix", None), "needs_sidecars",
                         False):
                nnz = None       # staged row-diff: needs the graph to walk
            else:
                # row-batched scan: bounds memory to CHUNK x labels instead
                # of a dense rows x labels matrix
                import numpy as _np
                CHUNK = 1 << 16
                nnz = 0
                for lo in range(0, a.num_rows, CHUNK):
                    rows = _np.arange(lo, min(lo + CHUNK, a.num_rows))
                    nnz += int(a.get_rows_mask(rows).sum())
            if nnz is not None:
                print(f"density: "
                      f"{nnz / max(a.num_labels * a.num_rows, 1):.6g}")
            print(f"representation: "
                  f"{getattr(a, 'representation', 'column')}")
            codecs = getattr(a, "column_codecs", None)
            if codecs:
                from collections import Counter
                per = ", ".join(f"{k}: {v}"
                                for k, v in sorted(Counter(codecs).items()))
                print(f"column vectors: {per}")
            from ..annotation.matrix import BRWT
            if isinstance(getattr(a, "matrix", None), BRWT):
                # Multi-BRWT tree stats (ref stats.cpp:175-184)
                nodes, arity_sum, internal, rate_sum = 0, 0, 0, 0.0
                stack = [a.matrix.root]
                while stack:
                    n = stack.pop()
                    nodes += 1
                    if n.children:
                        internal += 1
                        arity_sum += len(n.children)
                        # mean index-bitmap density over internal nodes
                        # (ref brwt.cpp:553-566 shrinking_rate)
                        rate_sum += float(n.bitmap.sum()) / max(
                            len(n.bitmap), 1)
                        stack.extend(n.children)
                print("=================== Multi-BRWT STATS "
                      "===================")
                print(f"num nodes: {nodes}")
                print(f"avg arity: "
                      f"{arity_sum / max(internal, 1):.6g}")
                print(f"shrinkage: {rate_sum / max(internal, 1):.6g}")
            if args.print_col_names:
                print("column names:")
                for name in a.encoder.labels:
                    print(name)
            quantiles = [float(x) for x in
                         (args.count_quantiles or "").split()]
            if quantiles or args.print_counts_hist:
                # per-column count quantiles/histogram over the stored
                # k-mer count values (ref stats.cpp:304-366)
                print("===================== COUNTS STATS "
                      "=====================")
                if not getattr(a, "has_values", False):
                    print("[error] Printing statistics for counts is only "
                          "supported for column annotations with counts",
                          file=sys.stderr)
                    raise SystemExit(1)
                if any(q < 0.0 or q > 1.0 for q in quantiles):
                    print("[error] Count quantiles must be in interval "
                          "[0, 1]", file=sys.stderr)
                    raise SystemExit(1)
                hdr = "Column-index\tLabel\tNum-counts"
                hdr += "".join(f"\tQuantile({q:g})" for q in quantiles)
                if args.print_counts_hist:
                    hdr += "\tHistogram(count:multiplicity[,...])"
                print(hdr)
                a.freeze()
                for j in range(a.num_labels):
                    vals = np.asarray(a._values[j])
                    line = f"{j}\t{a.encoder.decode(j)}\t{len(vals)}"
                    hv, hc = (np.unique(vals, return_counts=True)
                              if len(vals) else (np.zeros(0), np.zeros(0)))
                    cum = np.cumsum(hc)
                    for q in quantiles:
                        if len(hv):
                            # first value whose cumulative multiplicity
                            # reaches q*total (ref algorithms.hpp:361-385)
                            i = int(np.searchsorted(cum, q * cum[-1]))
                            line += f"\t{int(hv[min(i, len(hv) - 1)])}"
                        else:
                            line += "\tnan"
                    if args.print_counts_hist:
                        line += "\t" + ",".join(
                            f"{int(v)}:{int(c)}" for v, c in zip(hv, hc))
                    print(line)
                print("=" * 56)
            continue
        g = DBGSuccinct.load(f)
        print(f"k: {g.k}")
        print(f"nodes (k): {g.num_nodes()}")
        print(f"mode: {g.mode}")
        if getattr(g, "boss", None) is not None:
            # representation state tag (ref stats.cpp:40)
            print(f"state: {g.boss.state}")
        print(f"max index (k): {g.max_index()}")
        if getattr(g, "boss", None) is not None \
                and g.boss.weights is not None:
            w = g.boss.weights[g.boss.valid > 0]
            nnz = int((w > 0).sum())
            print(f"nnz weights: {nnz}")
            print(f"avg weight: {float(w.sum()) / max(nnz, 1):.6g}")
            if args.print_counts_hist:
                # node-weight histogram (ref stats.cpp:124-135)
                hv, hc = np.unique(w[w > 0], return_counts=True)
                print("weights histogram:")
                print(",".join(f"{int(v)}:{int(c)}"
                               for v, c in zip(hv, hc)))
        if args.verbose and getattr(g, "boss", None) is not None:
            # W / last distributions (ref cli/stats.cpp:33-178)
            boss = g.boss
            W_vals, W_counts = np.unique(boss.W[1:], return_counts=True)
            print("W stats: {'" + "', '".join(
                f"{int(v)}': {int(c)}" for v, c in zip(W_vals, W_counts))
                + "}")
            print(f"last 1s: {int(boss.last.sum())} / {boss.num_edges}")
            print(f"dummy edges: "
                  f"{int(boss.num_edges - g.num_nodes())}")


def cmd_annotate(args):
    from ..seq_io.fasta import read_fasta
    from ..graph.dbg_succinct import DBGSuccinct
    from ..annotation.column import ColumnMajorAnnotation
    from ..annotation.annotated_dbg import AnnotatedDBG
    import os

    g = DBGSuccinct.load(args.infile_base)
    base_rows = g.max_index()
    if g.mode == "primary":
        # PRIMARY graphs are annotated/queried through the canonical view
        # (ref cli/load/load_annotated_graph.cpp:68-123)
        from ..graph.canonical import CanonicalDBG
        g = CanonicalDBG(g)
    # --index-header-coords needs the files in column order in ONE pass, so
    # it overrides --separately (ref cli/annotate.cpp:478)
    if getattr(args, "separately", False) \
            and not getattr(args, "index_header_coords", False):
        # one annotation per input file, files processed in parallel
        # (ref cli/annotate.cpp:487-511: output = outfbase/<input basename>)
        from concurrent.futures import ThreadPoolExecutor
        os.makedirs(args.out, exist_ok=True)
        outs = [os.path.join(args.out, os.path.basename(f))
                for f in args.input]
        if len(set(outs)) != len(outs):
            # two inputs with the same basename would silently overwrite
            # each other's annotation
            raise SystemExit("[error] --separately requires unique input "
                             "file basenames")
        with ThreadPoolExecutor(max_workers=max(args.parallel, 1)) as pool:
            list(pool.map(
                lambda fo: _annotate_files(g, base_rows, args, [fo[0]],
                                           fo[1]),
                zip(args.input, outs)))
        return
    _annotate_files(g, base_rows, args, list(args.input), args.out)


def _annotate_files(g, base_rows, args, files, out_base):
    """Annotate `files` into one annotation artifact at `out_base`."""
    from ..seq_io.fasta import read_fasta
    from ..annotation.column import ColumnMajorAnnotation
    from ..annotation.annotated_dbg import AnnotatedDBG

    anno = ColumnMajorAnnotation(base_rows)
    if getattr(args, "disk_swap", None) is not None \
            or getattr(args, "mem_cap_gb", None) is not None:
        # bounded-RAM column building (ref annotate.cpp --disk-swap /
        # --mem-cap-gb: ColumnCompressed buffer swap)
        cap_gb = 0.25 if args.mem_cap_gb is None else args.mem_cap_gb
        anno.enable_disk_swap(args.disk_swap, int(cap_gb * (1 << 30)))
    ag = AnnotatedDBG(g, anno)
    coord_offsets = {}
    header_index = {}
    for f in files:
        # reference uses the path as given for filename labels
        # (ref cli/annotate.cpp: config->refpath handling; tests pass paths)
        fname_label = f
        for rec in read_fasta(f):
            if args.anno_label:
                labels = [args.anno_label]
            elif args.anno_header:
                labels = [rec.name]
            else:
                labels = [fname_label]
            if args.coordinates:
                # per-label offsets advance by the sequence's window count
                # (ref annotated_dbg.cpp annotate_kmer_coords usage)
                off = coord_offsets.get(labels[0], 0)
                ag.annotate_kmer_coords(rec.seq, labels, off)
                coord_offsets[labels[0]] = off + max(
                    len(rec.seq) - g.k + 1, 0)
            else:
                ag.annotate_sequence(rec.seq, labels)
            if args.count_kmers:
                from ..seq_io.fasta import parse_abundance
                ab = parse_abundance(rec.comment) if rec.comment else None
                ag.annotate_kmer_counts(rec.seq, labels, abundance=ab or 1)
            if getattr(args, "index_header_coords", False) \
                    and len(rec.seq) >= g.k:
                # only sequences long enough to hold a k-mer are indexed
                header_index.setdefault(labels[0], []).append(
                    (rec.name, len(rec.seq) - g.k + 1))
    anno.save(out_base + ".column.annodbg",
              codec=getattr(args, "anno_codec", "sorted"))
    if getattr(args, "index_header_coords", False):
        # per-column (header, num_kmers) index (ref cli/annotate.cpp:278,
        # coord_to_header.hpp)
        from ..annotation.coord_to_header import CoordToHeader
        anno.freeze()
        cols = [anno.encoder.decode(c) for c in range(anno.num_labels)]
        cth = CoordToHeader(
            [[h for h, _ in header_index.get(lab, [])] for lab in cols],
            [[n for _, n in header_index.get(lab, [])] for lab in cols])
        cth.save(out_base)
        print(f"CoordToHeader mapping serialized to {out_base}.seqs",
              file=sys.stderr)
    print(f"annotated: {anno.num_labels} labels", file=sys.stderr)


def _load_as_column(path):
    """Load any annotation and materialize it as ColumnMajorAnnotation so it
    can be re-converted (ref convert<> between static types)."""
    import numpy as np
    from ..annotation.column import ColumnMajorAnnotation
    from ..annotation.matrix import load_annotation
    try:
        return ColumnMajorAnnotation.load(path)
    except Exception:
        pass
    a = load_annotation(path)
    if isinstance(a, ColumnMajorAnnotation):
        return a
    out = ColumnMajorAnnotation(a.num_rows)
    for c in range(a.num_labels):
        out._col(a.encoder.decode(c))
    # row-batched scan bounds memory to CHUNK x labels
    CHUNK = 1 << 16
    for lo in range(0, a.num_rows, CHUNK):
        rows = np.arange(lo, min(lo + CHUNK, a.num_rows))
        mask = a.get_rows_mask(rows)
        for c in range(a.num_labels):
            hit = np.flatnonzero(mask[:, c])
            if len(hit):
                out._rows[c].append((lo + hit).astype(np.int64))
    out.freeze()
    return out


def _merge_columns(annos):
    """Horizontally concatenate the columns (and values) of already-loaded
    annotations into one ColumnMajorAnnotation."""
    from ..annotation.column import ColumnMajorAnnotation

    merged = None
    for a in annos:
        a.freeze()
        if merged is None:
            merged = ColumnMajorAnnotation(a.num_rows)
        elif a.num_rows != merged.num_rows:
            raise SystemExit("[error] annotations to merge must have the "
                             "same number of rows")
        for c in range(a.num_labels):
            rows = a.column_rows(c)
            merged.add_labels(rows, [a.encoder.decode(c)])
            if a.has_values:
                vals = a._values[c]
                nz = vals > 0
                if nz.any():
                    merged.add_label_counts(rows[nz], vals[nz],
                                            [a.encoder.decode(c)])
    merged.freeze()
    return merged


def _load_merged_columns(paths):
    """Load one or more annotation files as a single ColumnMajorAnnotation.
    Conversion targets accept any number of column files and merge their
    label sets (ref transform_annotation.cpp: the snakemake workflow feeds
    the whole columns.txt list to one transform_anno call)."""
    if len(paths) == 1:
        return _load_as_column(paths[0])
    return _merge_columns([_load_as_column(p) for p in paths])


def cmd_transform_anno(args):
    import numpy as np
    from ..graph.dbg_succinct import DBGSuccinct
    from ..annotation.column import ColumnMajorAnnotation
    from ..annotation.matrix import (StaticAnnotation, convert_annotation,
                                     load_annotation)

    if args.anno_type == "devsparse":
        # prebuild the device query working structure (the label-sparse
        # annotation) by COLUMN STREAMING — the scalable conversion; a
        # per-row conversion from a loaded compressed matrix runs at ~1k
        # rows/s host-side.  Write to -o verbatim so `query --device -a
        # <artifact>` finds it as <artifact>.devsparse.npz.
        from ..annotation.sparse_device import DeviceBlockSparseAnno
        from ..utils.timer import PhaseTimer
        anno = load_annotation(args.input[0])
        if not isinstance(anno, ColumnMajorAnnotation):
            raise SystemExit("ERROR: --anno-type devsparse streams COLUMN "
                             "annotations (convert the compressed matrix's "
                             "source columns)")
        anno.freeze()
        with PhaseTimer("devsparse conversion"):
            sp = DeviceBlockSparseAnno.from_columns(
                (anno.column_rows(c) for c in range(anno.num_labels)),
                anno.num_rows, anno.num_labels)
        sp.save(args.out)
        print(f"device sparse annotation written to {args.out} "
              f"({sp.nbytes/1e6:.0f} MB, tau {sp.tau}, "
              f"{sp.dense8.shape[0]-1} dense patterns)", file=sys.stderr)
        return
    if getattr(args, "to_ref_format", False):
        # emit a .column.annodbg the reference binary can load
        # (ref annotate_column_compressed.cpp serialize)
        from ..seq_io.refwrite import save_reference_column_annotation
        anno = load_annotation(args.input[0])
        if not isinstance(anno, ColumnMajorAnnotation):
            raise SystemExit("ERROR: --to-ref-format requires a column "
                             "(ColumnMajor) annotation input")
        out = save_reference_column_annotation(anno, args.out)
        print(f"reference-format annotation written to {out}",
              file=sys.stderr)
        return
    if getattr(args, "dump_text_anno", False):
        # per-column text dump: "<rows> <set bits>" then one set-row index
        # per line, file <out>.<j>.text.annodbg
        # (ref annotate_column_compressed.cpp:1168-1191)
        anno = load_annotation(args.input[0])
        R = anno.num_rows
        for j in range(anno.num_labels):
            if hasattr(anno, "column_rows"):
                rows = np.asarray(anno.column_rows(j))
            elif hasattr(getattr(anno, "matrix", None), "get_column"):
                # get_column returns set-row indices (ref binary_matrix.hpp)
                rows = np.asarray(anno.matrix.get_column(j))
            else:
                raise SystemExit("[error] Dumping columns for this type "
                                 "not implemented")
            with open(f"{args.out}.{j}.text.annodbg", "w") as f:
                f.write(f"{R} {len(rows)}\n")
                f.write("".join(f"{int(r)}\n" for r in rows))
        print(f"dumped {anno.num_labels} text columns", file=sys.stderr)
        return
    if getattr(args, "rename_cols", None):
        # whitespace-separated "<old> <new>" pairs
        # (ref transform_annotation.cpp:360-392)
        toks = open(args.rename_cols).read().split()
        if len(toks) % 2:
            raise SystemExit(f"[error] Wrong format of the rules for "
                             f"renaming annotation columns passed in file "
                             f"'{args.rename_cols}'")
        mapping = dict(zip(toks[::2], toks[1::2]))
        anno = load_annotation(args.input[0])
        try:
            anno.encoder.rename(mapping)
        except ValueError as e:
            raise SystemExit(f"[error] {e}")
        anno.save(args.out + (".column.annodbg"
                              if isinstance(anno, ColumnMajorAnnotation)
                              else f".{anno.representation}.annodbg"))
        print(f"renamed {len(mapping)} labels", file=sys.stderr)
        return
    if getattr(args, "compute_overlap", None):
        # inner product of columns (ref transform_annotation.cpp:556-590)
        base = load_annotation(args.compute_overlap)
        for f in args.input:
            other = load_annotation(f)
            for c in range(base.num_labels):
                base_label = base.encoder.decode(c)
                rows = base.column_rows(c) if hasattr(base, "column_rows")                     else np.flatnonzero(base.get_rows_mask(
                        np.arange(base.num_rows))[:, c])
                col = [(int(r), 1) for r in rows]
                row_sum = other.sum_rows(col, max(args.min_count, 1))
                line = f"({args.compute_overlap}<{base_label}>, {f}<*>):"
                for j, total in row_sum:
                    line += f"\t<{other.encoder.decode(j)}>:{total}"
                print(line)
        return

    if getattr(args, "aggregate_columns", False):
        # sum columns into one mask column with value/count filters,
        # aggregated across ALL input annotations
        # (ref transform_annotation.cpp:415-553)
        total = None
        max_value = args.max_value if args.max_value is not None else 2 ** 63
        min_value = max(args.min_value, 1)
        filter_values = min_value > 1 or max_value < 2 ** 63
        for path in args.input:
            anno = ColumnMajorAnnotation.load(path)
            anno.freeze()
            num_rows = anno.num_rows
            if total is None:
                total = np.zeros(num_rows, dtype=np.int64)
            elif len(total) != num_rows:
                raise SystemExit("[error] aggregated annotations must have "
                                 "the same number of rows")
            if (filter_values or args.count_kmers) and not anno.has_values:
                raise SystemExit("[error] value filters/--count-kmers "
                                 "require annotations built with k-mer "
                                 "counts")
            for c in range(anno.num_labels):
                rows = anno.column_rows(c)
                if filter_values or args.count_kmers:
                    vals = anno._values[c]
                    keep = (vals >= min_value) & (vals <= max_value)
                    if args.count_kmers:
                        total[rows[keep]] += vals[keep]
                    else:
                        total[rows[keep]] += 1
                else:
                    total[rows] += 1
        max_count = args.max_count if args.max_count is not None else 2 ** 63
        # rows with zero sum are never selected (ref behavior: threshold >= 1)
        mask = (total >= max(args.min_count, 1)) & (total <= max_count)
        out = ColumnMajorAnnotation(num_rows)
        label = args.anno_label or "mask"
        out._col(label)
        out._rows[0].append(np.flatnonzero(mask).astype(np.int64))
        out.save(args.out + ".column.annodbg")
        print(f"aggregated {anno.num_labels} columns -> "
              f"{int(mask.sum())} rows", file=sys.stderr)
        return

    stage = getattr(args, "row_diff_stage", None)
    if stage is not None and args.anno_type.startswith("row_diff"):
        # staged row-diff pipeline (ref row_diff_builder.hpp:15-42,
        # transform_annotation.cpp:290): stage 0 builds the successor
        # routing, stage 1 assigns anchors, stage 2 diffs the columns;
        # routing lives in .rd_succ/.anchors next to the graph
        from ..annotation.matrix import MATRIX_TYPES, RowDiff, RowFlat
        graph = DBGSuccinct.load(args.infile_base)
        base = args.infile_base
        max_len = getattr(args, "max_path_length", 100)
        if stage == 0:
            succ, _ = RowDiff.build_routing(graph, max_len)
            np.savez_compressed(base + ".rd_succ.npz", succ=succ)
            import os
            os.replace(base + ".rd_succ.npz", base + ".rd_succ")
            print(f"row-diff successors serialized to {base}.rd_succ",
                  file=sys.stderr)
            return
        if stage == 1:
            _, anchors = RowDiff.build_routing(graph, max_len)
            np.savez_compressed(base + ".anchors.npz", anchors=anchors)
            import os
            os.replace(base + ".anchors.npz", base + ".anchors")
            print(f"row-diff anchors serialized to {base}.anchors",
                  file=sys.stderr)
            return
        # stage 2: build diffs against the serialized routing
        succ = np.load(base + ".rd_succ")["succ"]
        anchors = np.load(base + ".anchors")["anchors"]
        anno = _load_merged_columns(args.input)
        anno.freeze()
        columns = [anno.column_rows(c) for c in range(anno.num_labels)]
        from ..annotation.matrix import _row_diff_inner
        m = RowDiff.from_annotation(columns, anno.num_rows, anno.num_labels,
                                    graph, routing=(succ, anchors),
                                    external_routing=True,
                                    inner_type=_row_diff_inner(
                                        args.anno_type))
        out = StaticAnnotation(m, anno.encoder, args.anno_type)
        out.save(f"{args.out}.{args.anno_type}.annodbg")
        print(f"converted to {args.anno_type} (staged): "
              f"{m.num_labels} labels", file=sys.stderr)
        return

    anno = _load_merged_columns(args.input)
    graph = DBGSuccinct.load(args.infile_base) if args.infile_base else None
    m = convert_annotation(anno, args.anno_type, graph=graph,
                           out_base=args.out,
                           max_path_length=getattr(args, "max_path_length",
                                                   100))
    out = StaticAnnotation(m, anno.encoder, args.anno_type)
    out.save(f"{args.out}.{args.anno_type}.annodbg")
    print(f"converted to {args.anno_type}: {m.num_labels} labels",
          file=sys.stderr)


def cmd_query(args):
    from ..seq_io.fasta import read_fasta
    from ..graph.dbg_succinct import DBGSuccinct
    from ..annotation.matrix import load_annotation
    from ..annotation.annotated_dbg import AnnotatedDBG
    from ..query.pipeline import QueryEngine

    g = DBGSuccinct.load(args.infile_base)
    if g.mode == "primary":
        from ..graph.canonical import CanonicalDBG
        g = CanonicalDBG(g)
    anno = _load_annotation_for(args.infile_base, args.annotation)
    cth = None
    if not getattr(args, "no_coord_mapping", False):
        import os
        from ..annotation.coord_to_header import CoordToHeader
        seqs_path = args.annotation
        for ext in (".column.annodbg.npz", ".column.annodbg",
                    ".annodbg.npz", ".annodbg"):
            if seqs_path.endswith(ext):
                seqs_path = seqs_path[: -len(ext)]
                break
        if os.path.exists(seqs_path + ".seqs"):
            cth = CoordToHeader.load(seqs_path + ".seqs")
    engine = QueryEngine(AnnotatedDBG(g, anno, coord_to_header=cth),
                         use_device=args.device,
                         n_threads=max(args.parallel,
                                       getattr(args, "parallel_each", 1)))
    # the block-sparse device conversion is an expensive one-time pass at
    # scale (~1 h at 4.6e7 rows x 1e5 labels): cache the converted
    # structure next to the annotation artifact, like the reference's aux
    # index sidecars
    engine.device_anno_cache = args.annotation + ".devsparse.npz"

    aligner_config = None
    if args.align:
        from ..align.config import AlignerConfig
        alpha = getattr(engine._base, "alphabet", None)
        aligner_config = AlignerConfig(
            min_exact_match=args.align_min_exact_match,
            protein=alpha is not None and alpha.name == "Protein",
            **_aligner_scoring_kwargs(args))

    out = sys.stdout
    num_top = args.num_top_labels if args.num_top_labels is not None else 2 ** 63
    for f in args.input:
        records = read_fasta(f)
        for res in engine.query_records(
                records, args.query_mode, num_top,
                args.min_kmers_fraction_label, args.min_kmers_fraction_graph,
                fwd_and_reverse=args.fwd_and_reverse,
                batch_size_bp=args.batch_size,
                aligner_config=aligner_config,
                batch_align=args.batch_align,
                max_hull_forks=args.max_hull_forks,
                max_hull_depth=args.max_hull_depth,
                max_nodes_per_seq_char=args.align_max_nodes_per_seq_char):
            if args.json:
                out.write(res.to_json(args.verbose_output, g.k) + "\n")
            else:
                out.write(res.to_string(":", args.suppress_unlabeled,
                                        args.verbose_output, g.k) + "\n")


def cmd_align(args):
    from ..seq_io.fasta import read_fasta
    from ..graph.dbg_succinct import DBGSuccinct
    from ..align.config import AlignerConfig
    from ..align.aligner import DBGAligner, format_alignments_tsv

    g = DBGSuccinct.load(args.infile_base)
    if args.map:
        # --map --count-kmers: print #matched/#total/#unique-matched
        # (ref cli/align.cpp:110-165 map_sequences_in_file; --align-length
        # below k maps sub-k-mers via BOSS suffix ranges)
        for f in args.input:
            for rec in read_fasta(f):
                L = args.align_length or g.k
                if L == g.k:
                    nodes = g.map_to_nodes(rec.seq)
                else:
                    nodes = []
                    for i in range(len(rec.seq) - L + 1):
                        hits, _ = \
                            g.call_nodes_with_suffix_matching_longest_prefix(
                                rec.seq[i: i + L], L)
                        nodes.append(hits[0] if hits else 0)
                    nodes = np.array(nodes, dtype=np.int64)
                matched = int((nodes > 0).sum())
                if getattr(args, "query_presence", False):
                    # >= ceil-complement threshold (ref align.cpp:139-151)
                    min_disc = len(nodes) - int(
                        len(nodes) * (1 - args.align_min_kmers_fraction))
                    found = matched >= min_disc
                    if getattr(args, "filter_present", False):
                        if found:
                            sys.stdout.write(
                                f">{rec.name}\n{rec.seq.decode()}\n")
                    else:
                        print(int(found))
                elif args.count_kmers:
                    uniq = len(set(nodes[nodes > 0].tolist()))
                    print(f"{rec.name}\t{matched}/{len(nodes)}/{uniq}")
                else:
                    # per-k-mer node mapping (ref align.cpp:168-173)
                    s = rec.seq.decode()
                    for i, n in enumerate(nodes):
                        print(f"{s[i: i + L]}: {int(n)}")
        return

    if args.out and args.out.endswith(".gfa"):
        # append GFA P-lines for query paths (ref align.cpp:181-252)
        from ..graph import traversal
        is_end = set()
        for path, seq in traversal.call_paths(g.boss, True, False, True):
            is_end.add(path[-1])
        out_path = args.out[:-4] + ".path.gfa"
        with open(out_path, "w") as f:
            for fi in args.input:
                for i, rec in enumerate(read_fasta(fi)):
                    nodes = g.map_to_nodes_sequentially(rec.seq)
                    nodes = [int(x) for x in nodes]
                    if not nodes:
                        continue
                    parts, cigs = [], []
                    ov = g.k - 1
                    for n in nodes[:-1]:
                        if args.compacted and n not in is_end:
                            continue
                        parts.append(f"{n}+")
                        cigs.append(f"{ov}M")
                    last = nodes[-1]
                    while args.compacted and last not in is_end:
                        nxt = [nn for nn, _ in g.call_outgoing_kmers(last)]
                        if not nxt:
                            break
                        last = nxt[-1]
                    parts.append(f"{last}+")
                    f.write(f"P\t{i + 1}\t{','.join(parts)}\t"
                            f"{','.join(cigs)}\n")
        print(f"wrote {out_path}", file=sys.stderr)
        return

    base_g = g.graph if hasattr(g, "get_base_node") else g
    cfg = AlignerConfig(
        min_exact_match=args.align_min_exact_match,
        min_seed_length=args.align_min_seed_length,
        max_seed_length=args.align_max_seed_length,
        min_path_score=args.align_min_path_score,
        num_alternative_paths=args.align_alternative_alignments,
        forward_and_reverse_complement=not args.align_only_forwards,
        post_chain_alignments=getattr(args, "align_post_chain", False),
        protein=getattr(base_g, "alphabet", None) is not None
        and base_g.alphabet.name == "Protein",
        **_aligner_scoring_kwargs(args),
    )
    if getattr(args, "align_chain", False) and not args.annotation:
        print("ERROR: Chaining only supported for seeds with coordinates. "
              "Skipping seed chaining.", file=sys.stderr)
        raise SystemExit(1)
    if args.annotation:
        from ..annotation.annotated_dbg import AnnotatedDBG
        from ..align.aligner import (LabeledAligner,
                                     format_labeled_alignments_tsv)
        anno = _load_annotation_for(args.infile_base, args.annotation)
        ag = AnnotatedDBG(g, anno)
        if getattr(args, "align_chain", False):
            # ref dbg_aligner.cpp:546-550: chaining needs coordinates
            if not getattr(anno, "_coords", None) \
                    or not any(len(c) for c in anno._coords):
                print("ERROR: Chaining only supported for seeds with "
                      "coordinates. Skipping seed chaining.", file=sys.stderr)
                raise SystemExit(1)
            from ..align.aligner import DBGAligner as _DA
            from ..align.seed_chainer import align_chained_seeds
            aligner = _DA(g, cfg)
            for f in args.input:
                for rec in read_fasta(f):
                    alns = align_chained_seeds(aligner, ag, rec.seq)
                    sys.stdout.write(format_labeled_alignments_tsv(
                        rec.name, rec.seq, alns, anno.encoder,
                        cfg.min_path_score))
            return
        # CoordToHeader index (ref cli/align.cpp:462): resolves coordinate
        # labels to per-sequence headers unless --no-coord-mapping
        cth = None
        if not getattr(args, "no_coord_mapping", False):
            import os
            from ..annotation.coord_to_header import CoordToHeader
            seqs_path = args.annotation
            for ext in (".column.annodbg.npz", ".column.annodbg",
                        ".annodbg.npz", ".annodbg"):
                if seqs_path.endswith(ext):
                    seqs_path = seqs_path[: -len(ext)]
                    break
            seqs_path += ".seqs"
            if os.path.exists(seqs_path):
                cth = CoordToHeader.load(seqs_path)
        aligner = LabeledAligner(ag, cfg)
        for f in args.input:
            for rec in read_fasta(f):
                alns = aligner.align(rec.seq)
                sys.stdout.write(format_labeled_alignments_tsv(
                    rec.name, rec.seq, alns, anno.encoder,
                    cfg.min_path_score, k=g.k, cth=cth))
        return
    aligner = DBGAligner(g, cfg)
    backend = "device" if getattr(args, "device", False) else "numpy"
    for f in args.input:
        recs = read_fasta(f)
        # lockstep batch: all reads' extension waves are scored together
        # (align/batch.py); per-read output identical to sequential align()
        for rec, alns in zip(recs,
                             aligner.align_batch(
                                 [r.seq for r in recs], backend=backend,
                                 processes=max(args.parallel, 1))):
            if getattr(args, "json", False):
                # one GA4GH-style JSON line per alignment
                # (ref alignment.cpp Alignment::to_json, align.cpp:295-302)
                import json as _json
                if not alns:
                    sys.stdout.write(_json.dumps(
                        {"name": rec.name, "read_mapped": False}) + "\n")
                    continue
                for rank, a in enumerate(alns):
                    qlen = max(len(rec.seq), 1)
                    obj = {
                        "name": rec.name,
                        "sequence": rec.seq.decode(),
                        "annotation": {
                            "ref_sequence": a.sequence.decode(),
                            "cigar": a.cigar.to_string(),
                        },
                        "score": int(a.score),
                        "identity": a.cigar.get_num_matches()
                        / max(len(a.query_view()), 1),
                        "read_mapped": True,
                    }
                    if a.get_clipping():
                        obj["query_position"] = int(a.get_clipping())
                        obj["soft_clipped"] = True
                    if rank:
                        obj["is_secondary"] = True
                    if a.orientation:
                        obj["read_on_reverse_strand"] = True
                    sys.stdout.write(_json.dumps(obj) + "\n")
                continue
            sys.stdout.write(format_alignments_tsv(
                rec.name, rec.seq, alns, cfg.min_path_score))


def cmd_assemble(args):
    import json as _json
    from ..graph.dbg_succinct import DBGSuccinct
    from ..graph import traversal
    from ..graph.masked import run_differential_assembly
    from ..seq_io.fasta import write_fasta

    g = DBGSuccinct.load(args.input[0])
    table = g.alphabet.decode_table
    if args.to_gfa:
        # ref cli/assemble.cpp:220-266
        if not args.unitigs:
            raise SystemExit("Flag '--unitigs' must be set for GFA output")
        out = args.out if args.out.endswith(".gfa") else args.out + ".gfa"
        k = g.k
        overlap = k - 1
        with open(out, "w") as f:
            f.write("H\tVN:Z:1.0\n")
            paths, tix = traversal.call_paths(g.boss, True, False, True,
                                              return_index=True)
            for path, seq in paths:
                if not traversal._keep_unitig(g.boss, tix, path, seq,
                                              args.prune_tips):
                    continue
                unitig = table[np.array(seq, dtype=np.uint8)].tobytes().decode()
                if args.compacted:
                    f.write(f"S\t{path[-1]}\t{unitig}\n")
                    for node, c in g.call_incoming_kmers(path[0]):
                        if c != "$":
                            f.write(f"L\t{node}\t+\t{path[-1]}\t+\t{overlap}M\n")
                else:
                    for i in range(len(path)):
                        f.write(f"S\t{path[i]}\t{unitig[i:i+k]}\n")
                        if i:
                            f.write(f"L\t{path[i-1]}\t+\t{path[i]}\t+\t{overlap}M\n")
                    for node, c in g.call_incoming_kmers(path[0]):
                        if c != "$":
                            f.write(f"L\t{node}\t+\t{path[0]}\t+\t{overlap}M\n")
        print(f"wrote GFA to {out}", file=sys.stderr)
        return
    recs = []
    if args.diff_assembly_rules:
        from ..annotation.matrix import load_annotation
        from ..annotation.annotated_dbg import AnnotatedDBG
        anno = load_annotation(args.annotation)
        ag = AnnotatedDBG(g, anno)
        import re as _re
        with open(args.diff_assembly_rules) as f:
            raw = f.read()
        # jsoncpp tolerates trailing commas; python json does not
        rules = _json.loads(_re.sub(r",\s*([\]}])", r"\1", raw))
        for name, masked in run_differential_assembly(ag, rules):
            contigs = masked.call_sequences(
                unitigs=args.unitigs or args.prune_tips > 1,
                min_tip_size=args.prune_tips)
            for c in contigs:
                recs.append((name, table[c].tobytes()))
    else:
        contigs = traversal.call_sequences(
            g.boss, unitigs=args.unitigs or args.prune_tips > 1,
            min_tip_size=args.prune_tips,
            kmers_in_single_form=(g.mode == "canonical"))
        for i, c in enumerate(contigs):
            recs.append((args.header or str(i), table[c].tobytes()))
    out = args.out if args.out.endswith(".gz") else args.out + ".fasta.gz"
    write_fasta(out, recs)
    print(f"wrote {len(recs)} contigs to {out}", file=sys.stderr)



def cmd_server_query(args):
    from ..seq_io.fasta import read_fasta
    from ..graph.dbg_succinct import DBGSuccinct
    from ..annotation.matrix import load_annotation
    from ..annotation.annotated_dbg import AnnotatedDBG
    from ..server.server import MetaGraphServer

    g = DBGSuccinct.load(args.infile_base)
    if g.mode == "primary":
        from ..graph.canonical import CanonicalDBG
        g = CanonicalDBG(g)
    anno = _load_annotation_for(args.infile_base, args.annotation)
    server = MetaGraphServer(AnnotatedDBG(g, anno),
                             use_device=getattr(args, "device", False))
    print(f"[Server] listening on {args.host}:{args.port}", file=sys.stderr)
    server.serve(args.host, args.port)



def cmd_extend(args):
    """Augment a graph with new sequences (ref cli/augment.cpp): build a
    small graph of the new input, then sorted-table-merge it with the
    existing edge set (linear; no contig re-extraction of the old graph —
    the batch analog of BOSS dynamic add_sequence, boss.hpp:192)."""
    from ..seq_io.fasta import read_fasta
    from ..graph.dbg_succinct import DBGSuccinct

    g = DBGSuccinct.load(args.infile_base)
    with_counts = g.boss.weights is not None
    new_seqs = []
    for f in args.input:
        new_seqs.extend(r.seq for r in read_fasta(f))
    g_new = DBGSuccinct.build(new_seqs, g.k, mode=g.mode,
                              alphabet=g.alphabet, with_counts=with_counts)
    g2 = DBGSuccinct.merge([g, g_new])
    g2.save(args.out)
    print(f"extended: {g2.num_nodes()} nodes", file=sys.stderr)


def cmd_compare(args):
    """Compare two graphs (ref cli/stats.cpp:430-480)."""
    from ..graph.dbg_succinct import DBGSuccinct

    a = DBGSuccinct.load(args.input[0])
    b = DBGSuccinct.load(args.input[1])
    print(f"Loaded {args.input[0]}")
    print(f"Loaded {args.input[1]}")
    same = (a.k == b.k and a.max_index() == b.max_index()
            and np.array_equal(a.boss.W, b.boss.W)
            and np.array_equal(a.boss.last, b.boss.last)
            and np.array_equal(a.boss.valid, b.boss.valid))
    print("Graphs are identical" if same else "Graphs are not identical")
    return 0 if same else 1


def cmd_merge(args):
    """Merge graphs (ref cli/merge.cpp / BOSS::merge): sorted-table merge of
    the inputs' edge sets — linear, no contig re-extraction."""
    from ..graph.dbg_succinct import DBGSuccinct

    graphs = [DBGSuccinct.load(f) for f in args.input]
    g2 = DBGSuccinct.merge(graphs)
    g2.save(args.out)
    print(f"merged: {g2.num_nodes()} nodes", file=sys.stderr)


def cmd_concatenate(args):
    """Assemble a graph from suffix-partitioned chunks (ref cli/build.cpp:360,
    BOSS::Chunk concatenation)."""
    import glob as _glob
    from ..graph.dbg_succinct import DBGSuccinct
    from ..kmer import packing

    chunks = sorted(_glob.glob(args.infile_base + ".*.chunk.npz"))
    if not chunks:
        raise SystemExit(f"no chunks found at {args.infile_base}.*.chunk.npz")
    parts = []
    k = mode = None
    alpha_name = "DNA"
    for c in chunks:
        z = np.load(c, allow_pickle=True)
        k = int(z["k"])
        mode = str(z["mode"])
        if "alphabet" in z.files:
            alpha_name = str(z["alphabet"])
        if len(z["kmers"]):
            parts.append(z["kmers"])
    from ..kmer.alphabets import ALPHABETS
    alpha = ALPHABETS[alpha_name]
    bits = packing.bits_for_alphabet(alpha.sigma)
    kmers = np.concatenate(parts, axis=0) if parts         else np.zeros((0, k), dtype=np.uint8)
    order = packing.boss_priority_order(k)
    upacked, _ = packing.unique_rows(packing.pack_codes(kmers, order,
                                                        bits=bits))
    kmers = packing.unpack_codes(upacked, k, order, bits=bits)
    from ..succinct.construct import build_boss_arrays
    from ..succinct.boss import BOSS
    arrays = build_boss_arrays(kmers, alph_size=alpha.sigma)
    g = DBGSuccinct(BOSS(arrays), k, mode if args.mode is None else args.mode,
                    alphabet=alpha,
                    mask_dummy=getattr(args, "clear_dummy", False))
    g.save(args.out)
    print(f"concatenated {len(chunks)} chunks: {g.num_nodes()} nodes",
          file=sys.stderr)



def cmd_merge_anno(args):
    """Merge annotation columns (ref cli/merge_annotations / merge_anno)."""
    from ..annotation.column import ColumnMajorAnnotation

    merged = _merge_columns([ColumnMajorAnnotation.load(f)
                             for f in args.input])
    merged.save(args.out + ".column.annodbg")
    print(f"merged {len(args.input)} annotations: {merged.num_labels} labels",
          file=sys.stderr)


def cmd_relax_brwt(args):
    """Rebalance a BRWT annotation (ref cli/transform_annotation.cpp
    --relax-arity).  Plain brwt rebuilds the cluster tree from the decoded
    rows; row_diff_brwt rebuilds the INNER brwt over the diff rows, keeping
    the row-diff routing untouched (ref relax_row_diff_brwt rule)."""
    from ..annotation.matrix import (BRWT, RowDiff, StaticAnnotation,
                                     load_annotation)

    a = load_annotation(args.input[0])
    m = getattr(a, "matrix", None)
    is_rd = isinstance(m, RowDiff) and isinstance(m.inner, BRWT)
    if not is_rd and not isinstance(m, BRWT):
        raise SystemExit("relax_brwt requires a brwt annotation")
    inner = m.inner if is_rd else m
    parts = [[] for _ in range(inner.num_labels)]
    CHUNK = 1 << 16              # bound memory to CHUNK x labels
    for lo in range(0, inner.num_rows, CHUNK):
        rows = np.arange(lo, min(lo + CHUNK, inner.num_rows))
        mask = inner.get_rows_mask(rows)
        for c in range(inner.num_labels):
            hit = np.flatnonzero(mask[:, c])
            if len(hit):
                parts[c].append(lo + hit)
    cols = [np.concatenate(p) if p else np.zeros(0, np.int64)
            for p in parts]
    rebuilt = BRWT.from_columns(cols, inner.num_rows, inner.num_labels,
                                arity=args.relax_arity)
    if is_rd:
        out = RowDiff(rebuilt, m.succ if not m.needs_sidecars else None,
                      m.anchors if not m.needs_sidecars else None,
                      m.num_labels)
        StaticAnnotation(out, a.encoder, "row_diff_brwt").save(
            args.out + ".row_diff_brwt.annodbg")
    else:
        StaticAnnotation(rebuilt, a.encoder, "brwt").save(
            args.out + ".brwt.annodbg")
    print(f"relaxed brwt (arity {args.relax_arity})", file=sys.stderr)


def cmd_transform(args):
    from ..graph.dbg_succinct import DBGSuccinct
    from ..seq_io.fasta import write_fasta
    from ..graph import traversal

    g = DBGSuccinct.load(args.input[0])
    if getattr(args, "index_ranges", 0):
        # ref transform_graph.cpp:96: index suffix ranges on an existing
        # graph.  Composes with the other transform actions below (the
        # indexed graph flows on); standalone, it re-serializes here.
        g.boss.index_suffix_ranges(args.index_ranges)
        print(f"suffix ranges of length {args.index_ranges} indexed",
              file=sys.stderr)
        other = any(getattr(args, f, None) for f in (
            "to_ref_format", "to_adj_list", "state", "mode", "to_fasta",
            "unitigs", "primary_kmers", "initialize_bloom"))
        if not other:
            g.save(args.out)
            return
    if getattr(args, "to_ref_format", False):
        # emit a .dbg the reference metagraph binary can load (state SMALL;
        # ref dbg_succinct.cpp:787-833) + .edgemask dummy mask sidecar
        from ..seq_io.refwrite import save_reference_boss
        out = save_reference_boss(g, args.out)
        print(f"reference-format graph written to {out}", file=sys.stderr)
        return
    if getattr(args, "to_adj_list", False):
        # ref transform_graph.cpp:101-111 / BOSS::print_adj_list:1203-1209
        boss = g.boss
        out = args.out + ".adjlist"
        with open(out, "w") as f:
            for edge in range(1, len(boss.W)):
                f.write(f"{1 + boss.rank_last_scalar(boss.fwd_scalar(edge) - 1)} ")
                if boss.last[edge]:
                    f.write("\n")
        print(f"adjacency list written to {out}", file=sys.stderr)
        return
    if getattr(args, "state", None):
        # switch representation state: re-serialize under the new tag ('fast'
        # -> raw mmap layout, others -> compressed npz); the in-memory
        # batch-array layout is state-independent (ref transform_graph.cpp
        # --state / BOSS::switch_state boss.cpp:325)
        g.boss.state = args.state
        g.save(args.out, mmap_layout=args.state == "fast")
        print(f"graph re-serialized in state {args.state}", file=sys.stderr)
        return
    if getattr(args, "mode", None) == "primary":
        # relabel basic -> primary without rebuilding; idempotent on
        # already-primary graphs, which are re-serialized unchanged
        # (ref transform_graph.cpp:114-136)
        if g.mode == "basic":
            print("Changing graph mode from basic to primary",
                  file=sys.stderr)
            print("FYI: This doesn't rebuild the graph. Apply with caution"
                  " and only to graphs constructed from primary contigs!",
                  file=sys.stderr)
            g.mode = "primary"
        g.save(args.out)
        return
    if args.initialize_bloom:
        # ref cli/transform_graph.cpp --initialize-bloom
        from ..kmer.bloom import KmerBloomFilter
        from ..graph import traversal
        n = g.num_nodes()
        if args.bloom_fpp < 1.0:
            bloom = KmerBloomFilter.from_fpp(
                g.k, g.mode == "canonical", n, args.bloom_fpp)
        else:
            bloom = KmerBloomFilter(
                g.k, g.mode == "canonical",
                int(args.bloom_bpk * n), n)
        table = g.alphabet.decode_table
        for c in traversal.call_sequences(g.boss):
            bloom.add_sequence(table[c].tobytes())
        out = args.out if args.out.endswith(".bloom.npz") \
            else args.out + ".bloom.npz"
        bloom.save(out)
        print(f"bloom filter written to {out} "
              f"({bloom.filter.size} bits, {bloom.filter.num_hash} hashes)",
              file=sys.stderr)
        return
    if args.to_fasta:
        contigs = traversal.call_sequences(
            g.boss, unitigs=args.unitigs,
            kmers_in_single_form=(args.primary_kmers
                                  or g.mode == "canonical"))
        table = g.alphabet.decode_table
        recs = [(str(i), table[c].tobytes()) for i, c in enumerate(contigs)]
        out = args.out if args.out.endswith(".gz") else args.out + ".fasta.gz"
        write_fasta(out, recs)
        print(f"wrote {len(recs)} contigs", file=sys.stderr)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="metagraph-tpu")
    ap.add_argument("--version", action="version",
                    version="metagraph-tpu 0.2.0")
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("build")
    _add_common(p)
    p.add_argument("-k", type=int, required=True)
    p.add_argument("--mode", choices=["basic", "canonical", "primary"],
                   default="basic")
    p.add_argument("--graph", default="succinct",
                   choices=["succinct", "bitmap", "hash", "hashfast",
                            "hashstr", "sshash"])
    p.add_argument("--count-kmers", action="store_true")
    p.add_argument("--count-width", type=int, default=8)
    p.add_argument("--mask-dummy", action="store_true")
    p.add_argument("--in-ram", action="store_true")
    p.add_argument("--state", default="stat",
                   choices=["stat", "small", "fast", "dynamic"],
                   help="representation state tag (ref boss.hpp:325); "
                        "'fast' selects the raw mmap-able artifact layout")
    p.add_argument("--alphabet", default="DNA",
                   choices=["DNA", "DNA5", "Protein", "DNA_CASE"],
                   help="k-mer alphabet (a runtime flag here; the reference "
                        "selects it at compile time, kmer_extractor.hpp:32)")
    p.add_argument("--suffix", default=None,
                   help="build only the chunk for this node-suffix")
    p.add_argument("--disk-swap", default=None, metavar="DIR",
                   help="directory for external-memory k-mer sort "
                        "spill chunks (bounded-RAM build)")
    p.add_argument("--index-ranges", type=int, default=0, metavar="L",
                   help="index all BOSS node ranges for suffixes of this "
                        "length (ref config.cpp:382 --index-ranges)")
    p.add_argument("--mesh-shards", type=int, default=0, metavar="N",
                   help="build over an N-device mesh: range-partitioned "
                        "device sort + collective-routed dummy generation "
                        "and emission (parallel/build_device.py; the "
                        "suffix-shard scale-out of ref build.cpp:110-158 "
                        "as one SPMD program)")
    p.add_argument("--mem-cap-gb", type=float, default=None,
                   help="RAM cap for the k-mer buffer; implies "
                        "disk spill when exceeded")
    p.add_argument("--device", action="store_true",
                   help="single-chip TPU construction (extraction, BOSS "
                        "sort, dedupe, dummy discovery and emission on "
                        "device; succinct/device_build.py) — basic-mode "
                        "DNA, k <= 21; arrays bit-identical to the host "
                        "pipeline, silently falls back otherwise")
    p.add_argument("input", nargs="+")
    p.set_defaults(func=cmd_build)

    p = sub.add_parser("stats")
    _add_common(p)
    p.add_argument("-a", "--annotation", default=None)
    p.add_argument("--print-col-names", action="store_true")
    p.add_argument("--count-quantiles", default=None, metavar="Q...",
                   help="space-separated quantiles in [0,1] of each "
                        "column's k-mer counts (ref stats.cpp:304-366)")
    p.add_argument("--print-counts-hist", action="store_true",
                   help="graph: node-weight histogram; annotation: "
                        "per-column count histogram")
    p.add_argument("input", nargs="*")
    p.set_defaults(func=cmd_stats)

    p = sub.add_parser("annotate")
    _add_common(p)
    p.add_argument("-i", "--infile-base", required=True)
    p.add_argument("--anno-header", action="store_true")
    p.add_argument("--anno-filename", action="store_true")
    p.add_argument("--anno-label", default=None)
    p.add_argument("--anno-type", default="column")
    p.add_argument("--anno-codec", default="sorted",
                   choices=["sorted", "smallest"],
                   help="column storage: raw sorted row indices or the"
                        " smallest sd/rrr/stat bit vector per column")
    p.add_argument("--count-kmers", action="store_true")
    p.add_argument("--coordinates", action="store_true")
    p.add_argument("--index-header-coords", action="store_true")
    p.add_argument("--separately", action="store_true",
                   help="annotate each input file into its own annotation "
                        "under the output directory "
                        "(ref cli/annotate.cpp:487-511)")
    p.add_argument("--disk-swap", default=None, metavar="DIR",
                   help="spill directory for bounded-RAM column building "
                        "(ref annotate.cpp --disk-swap)")
    p.add_argument("--mem-cap-gb", type=float, default=None,
                   help="RAM cap for the column builder buffers")
    p.add_argument("input", nargs="+")
    p.set_defaults(func=cmd_annotate)

    p = sub.add_parser("query")
    _add_common(p)
    p.add_argument("-i", "--infile-base", required=True)
    p.add_argument("-a", "--annotation", required=True)
    p.add_argument("--query-mode", default="labels",
                   choices=["labels", "matches", "counts", "counts-sum",
                            "signature", "coords"])
    p.add_argument("--min-kmers-fraction-label", type=float, default=0.7)
    p.add_argument("--min-kmers-fraction-graph", type=float, default=0.0)
    p.add_argument("--no-coord-mapping", action="store_true")
    p.add_argument("--num-top-labels", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=100_000_000)
    p.add_argument("--fwd-and-reverse", action="store_true")
    p.add_argument("--align", action="store_true")
    p.add_argument("--align-min-exact-match", type=float, default=0.7)
    _add_align_scoring_flags(p)
    # ref config.cpp:261-264,297: hull-expanded per-batch alignment graph
    p.add_argument("--batch-align", action="store_true",
                   help="align against a per-batch hull graph instead of "
                        "the full index (ref query.cpp construct_query_graph)")
    p.add_argument("--max-hull-forks", type=int, default=4)
    p.add_argument("--max-hull-depth", type=int, default=None)
    p.add_argument("--json", action="store_true")
    p.add_argument("--suppress-unlabeled", action="store_true")
    p.add_argument("--verbose-output", action="store_true")
    p.add_argument("--device", action="store_true",
                   help="run the full device (TPU) query pipeline: "
                        "hash-index mapping + batched label counting")
    p.add_argument("input", nargs="+")
    p.set_defaults(func=cmd_query)

    p = sub.add_parser("transform")
    _add_common(p)
    p.add_argument("--to-fasta", action="store_true")
    p.add_argument("--unitigs", action="store_true")
    p.add_argument("--primary-kmers", action="store_true")
    p.add_argument("--initialize-bloom", action="store_true")
    p.add_argument("--to-adj-list", action="store_true")
    p.add_argument("--to-ref-format", action="store_true",
                   help="write a .dbg loadable by the reference metagraph "
                        "binary (sdsl state SMALL)")
    p.add_argument("--index-ranges", type=int, default=0, metavar="L",
                   help="index BOSS suffix ranges of this length and "
                        "re-serialize (ref transform_graph.cpp:96)")
    p.add_argument("--mode", default=None,
                   choices=["basic", "canonical", "primary"])
    p.add_argument("--state", default=None,
                   choices=["stat", "small", "fast", "dynamic"],
                   help="re-serialize the graph under a new state tag "
                        "(ref transform_graph.cpp --state)")
    p.add_argument("--bloom-fpp", type=float, default=1.0)
    p.add_argument("--bloom-bpk", type=float, default=4.0)
    p.add_argument("input", nargs="+")
    p.set_defaults(func=cmd_transform)

    p = sub.add_parser("extend")
    _add_common(p)
    p.add_argument("-i", "--infile-base", required=True)
    p.add_argument("input", nargs="+")
    p.set_defaults(func=cmd_extend)

    p = sub.add_parser("compare")
    _add_common(p)
    p.add_argument("input", nargs=2)
    p.set_defaults(func=cmd_compare)

    p = sub.add_parser("merge")
    _add_common(p)
    p.add_argument("input", nargs="+")
    p.set_defaults(func=cmd_merge)

    p = sub.add_parser("concatenate")
    _add_common(p)
    p.add_argument("-i", "--infile-base", required=True)
    p.add_argument("--len-suffix", type=int, default=1)
    p.add_argument("--mode", default=None)
    p.add_argument("--graph", default="succinct")
    p.add_argument("--clear-dummy", action="store_true",
                   help="mark dummy k-mers after concatenation "
                        "(ref build.cpp:405-409)")
    p.set_defaults(func=cmd_concatenate)

    p = sub.add_parser("merge_anno")
    _add_common(p)
    p.add_argument("input", nargs="+")
    p.set_defaults(func=cmd_merge_anno)

    p = sub.add_parser("relax_brwt")
    _add_common(p)
    p.add_argument("--relax-arity", type=int, default=2)
    p.add_argument("input", nargs="+")
    p.set_defaults(func=cmd_relax_brwt)

    p = sub.add_parser("server_query")
    _add_common(p)
    p.add_argument("-i", "--infile-base", required=True)
    p.add_argument("-a", "--annotation", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--address", dest="host",
                   help="interface to listen on (reference flag name; "
                        "alias of --host, ref config.cpp)")
    p.add_argument("--port", type=int, default=5555)
    p.add_argument("--threads-each", type=int, default=1,
                   help="threads per request (accepted for reference-CLI "
                        "compatibility; requests batch internally)")
    p.add_argument("--device", action="store_true",
                   help="serve queries through the device (TPU) pipeline")
    p.set_defaults(func=cmd_server_query)

    p = sub.add_parser("assemble")
    _add_common(p)
    p.add_argument("-a", "--annotation", default=None)
    p.add_argument("--diff-assembly-rules", default=None)
    p.add_argument("--unitigs", action="store_true")
    p.add_argument("--prune-tips", type=int, default=1)
    p.add_argument("--header", default="")
    p.add_argument("--to-gfa", action="store_true")
    p.add_argument("--compacted", action="store_true")
    p.add_argument("input", nargs="+")
    p.set_defaults(func=cmd_assemble)

    p = sub.add_parser("transform_anno")
    _add_common(p)
    p.add_argument("-i", "--infile-base", default=None,
                   help="graph (required for row_diff targets)")
    p.add_argument("--anno-type", default="column")
    p.add_argument("--to-ref-format", action="store_true",
                   help="write a .column.annodbg loadable by the reference "
                        "metagraph binary")
    p.add_argument("--compute-overlap", default=None)
    p.add_argument("--aggregate-columns", action="store_true")
    p.add_argument("--count-kmers", action="store_true")
    p.add_argument("--min-count", type=int, default=1)
    p.add_argument("--max-count", type=int, default=None)
    p.add_argument("--min-value", type=int, default=1)
    p.add_argument("--max-value", type=int, default=None)
    p.add_argument("--anno-label", default=None)
    p.add_argument("--row-diff-stage", type=int, default=None)
    p.add_argument("--max-path-length", type=int, default=100,
                   help="row-diff anchor spacing: longest diff chain before "
                        "a forced anchor (ref row_diff_builder --max-length)")
    p.add_argument("--greedy", action="store_true",
                   help="greedy agglomerative column clustering for BRWT "
                        "targets (ref annotation_converters.cpp "
                        "convert_to_greedy_BRWT; the default here)")
    p.add_argument("--rename-cols", default=None, metavar="FILE",
                   help="whitespace-separated '<old> <new>' label pairs "
                        "(ref transform_annotation.cpp:360)")
    p.add_argument("--dump-text-anno", action="store_true",
                   help="dump each column as <out>.<j>.text.annodbg "
                        "(ref annotate_column_compressed.cpp:1168)")
    p.add_argument("--linkage", action="store_true",
                   help="accepted for reference-CLI compatibility (column "
                        "linkage is computed internally)")
    p.add_argument("input", nargs="+")
    p.set_defaults(func=cmd_transform_anno)

    p = sub.add_parser("align")
    _add_common(p)
    p.add_argument("-i", "--infile-base", required=True)
    p.add_argument("-a", "--annotation", default=None)
    p.add_argument("--align-only-forwards", action="store_true")
    p.add_argument("--align-min-exact-match", type=float, default=0.7)
    p.add_argument("--align-min-seed-length", type=int, default=19)
    p.add_argument("--align-max-seed-length", type=int, default=2 ** 63)
    p.add_argument("--align-min-path-score", type=int, default=0)
    p.add_argument("--align-alternative-alignments", type=int, default=1)
    p.add_argument("--align-edit-distance", action="store_true")
    _add_align_scoring_flags(p)
    p.add_argument("--align-post-chain", action="store_true")
    p.add_argument("--align-chain", action="store_true")
    p.add_argument("--no-coord-mapping", action="store_true")
    p.add_argument("--map", action="store_true")
    p.add_argument("--align-length", type=int, default=None)
    p.add_argument("--count-kmers", action="store_true")
    p.add_argument("--query-presence", action="store_true",
                   help="with --map: print 1/0 per sequence by discovery "
                        "threshold (ref align.cpp:139-151)")
    p.add_argument("--filter-present", action="store_true",
                   help="with --query-presence: emit matching sequences "
                        "as FASTA instead of 1/0")
    p.add_argument("--align-min-kmers-fraction",
                   "--min-kmers-fraction-label",
                   type=float, default=0.7,
                   help="discovery fraction for --query-presence "
                        "(ref config.hpp:136 discovery_fraction, "
                        "default 0.7)")
    p.add_argument("--json", action="store_true")
    p.add_argument("--compacted", action="store_true")
    p.add_argument("input", nargs="+")
    p.add_argument("--device", action="store_true",
                   help="score extension waves on the device backend")
    p.set_defaults(func=cmd_align)

    p = sub.add_parser("clean")
    _add_common(p)
    p.add_argument("--to-fasta", action="store_true")
    p.add_argument("--min-count", type=int, default=1)
    p.add_argument("--max-count", type=int, default=2 ** 63)
    p.add_argument("--prune-tips", type=int, default=1)
    p.add_argument("--prune-unitigs", type=int, default=1,
                   help="min unitig median abundance; 0 = auto estimate")
    p.add_argument("--fallback", type=int, default=1)
    p.add_argument("--unitigs", action="store_true")
    p.add_argument("--smoothing-window", type=int, default=1)
    p.add_argument("--num-singletons", type=int, default=0)
    p.add_argument("input", nargs="+")
    p.set_defaults(func=cmd_clean)

    args = ap.parse_args(argv)
    if getattr(args, "mmap", False):
        from ..graph import dbg_succinct as _dbgmod
        _dbgmod.DEFAULT_MMAP = True
    from ..utils.timer import Timer, get_peak_rss, set_trace, trace
    set_trace(bool(getattr(args, "verbose", False)))
    total = Timer()
    try:
        ret = args.func(args)
        trace(f"{args.command}: finished in {total.elapsed():.3f} sec, "
              f"peak RSS {get_peak_rss() / 1e6:.0f} MB")
        return ret
    except BrokenPipeError:
        sys.exit(0)
    except FileNotFoundError as e:
        # error lines name the offending path (ref integration error contract)
        path = getattr(e, "filename", None) or str(e)
        print(f"[error] File not found: {path}", file=sys.stderr)
        sys.exit(1)
    except PermissionError as e:
        path = getattr(e, "filename", None) or str(e)
        print(f"[error] Permission denied, cannot read: {path}",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    sys.exit(main())
