"""Workflow command line driver (ref workflows/metagraph_workflows/cli.py:
`metagraph-workflows build <output_dir> --seqs-file-list-path/--seqs-dir-path
...`).  Same interface; the staged DAG runs in-process (pipeline.py) instead
of through Snakemake, which is not available in this environment."""

from __future__ import annotations

import argparse
import os
import sys

from .pipeline import WorkflowConfig, run_build_workflow

SEQ_EXTS = (".fa", ".fasta", ".fa.gz", ".fasta.gz", ".fq", ".fastq",
            ".fq.gz", ".fastq.gz")

ANNOTATION_FORMATS = ("column", "flat", "row_diff", "row_diff_brwt",
                      "row_diff_flat", "brwt", "rb_brwt", "rbfish",
                      "bin_rel_wt", "row_sparse", "row_disk")

LABEL_SOURCES = ("sequence_headers", "sequence_file_names")


def _collect_samples(args) -> list[str]:
    if args.seqs_file_list_path:
        with open(args.seqs_file_list_path) as f:
            return [ln.strip() for ln in f if ln.strip()]
    files = sorted(
        os.path.join(args.seqs_dir_path, f)
        for f in os.listdir(args.seqs_dir_path)
        if f.lower().endswith(SEQ_EXTS))
    if not files:
        raise SystemExit(f"[error] no sequence files found in "
                         f"{args.seqs_dir_path}")
    return files


def init_build(args) -> int:
    samples = _collect_samples(args)
    fmt = args.annotation_format[-1] if args.annotation_format else "column"
    cfg = WorkflowConfig(
        samples=samples,
        output_dir=str(args.output_dir),
        k=args.k if args.k is not None else 31,
        annotation_format=fmt,
        base_name=args.base_name,
        labels_source=args.annotation_labels_source,
    )
    log = (lambda *a: print(*a, file=sys.stderr)) if args.verbose \
        else (lambda *a: None)
    if args.dryrun:
        print(f"[dryrun] build workflow: {len(samples)} samples -> "
              f"{cfg.output_dir} (k={cfg.k}, annotation={fmt})",
              file=sys.stderr)
        for s in samples:
            print(f"[dryrun]   sample: {s}", file=sys.stderr)
        return 0
    if args.force:
        # invalidate stage outputs so every stage re-runs
        for f in os.listdir(cfg.output_dir) if os.path.isdir(cfg.output_dir) \
                else []:
            if f.endswith((".npz", ".fasta.gz")):
                os.unlink(os.path.join(cfg.output_dir, f))
    res = run_build_workflow(cfg, log=log)
    print(f"workflow done: graph={res['graph']} "
          f"annotation={res['annotation']} nodes={res['num_nodes']} "
          f"labels={res['num_labels']}", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="metagraph-workflows")
    sub = ap.add_subparsers(dest="command", required=True)
    p = sub.add_parser("build")
    p.add_argument("output_dir")
    gx = p.add_mutually_exclusive_group(required=True)
    gx.add_argument("--seqs-file-list-path",
                    help="text file with one sequence-file path per line")
    gx.add_argument("--seqs-dir-path",
                    help="directory containing sequence files")
    p.add_argument("-k", type=int, default=None)
    p.add_argument("--base-name", default=None)
    p.add_argument("--build-primary-graph", action="store_true",
                   help="accepted for compatibility; the workflow always "
                        "builds the primary joint graph")
    p.add_argument("--annotation-format", action="append", default=[],
                   choices=ANNOTATION_FORMATS)
    p.add_argument("--annotation-labels-source",
                   default="sequence_file_names", choices=LABEL_SOURCES)
    p.add_argument("--threads", type=int, default=None,
                   help="accepted for compatibility; stages are "
                        "batch-vectorized rather than threaded")
    p.add_argument("--force", action="store_true")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--dryrun", action="store_true")
    p.set_defaults(func=init_build)
    args = ap.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
