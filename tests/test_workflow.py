"""Build workflow tests (ref workflows/ snakemake pipeline semantics)."""

import os

import numpy as np
import pytest

from metagraph_tpu.workflows.pipeline import WorkflowConfig, run_build_workflow


class TestWorkflow:
    def test_end_to_end(self, tmp_path):
        rng = np.random.default_rng(0)
        samples = []
        for i in range(2):
            p = tmp_path / f"sample{i}.fa"
            with open(p, "w") as f:
                for j in range(3):
                    f.write(f">r{j}\n"
                            + "".join(rng.choice(list("ACGT"), 400)) + "\n")
            samples.append(str(p))
        cfg = WorkflowConfig(samples=samples, output_dir=str(tmp_path / "out"),
                             k=21, annotation_format="row_diff_brwt")
        res = run_build_workflow(cfg, log=lambda *a: None)
        assert os.path.exists(res["graph"])
        assert os.path.exists(res["annotation"])
        assert res["num_labels"] == 2
        assert res["num_nodes"] > 0

        # re-run is a no-op (re-entrant)
        logs = []
        run_build_workflow(cfg, log=lambda *a: logs.append(a))
        assert any("up to date" in str(l) for l in logs)

        # query through the built index finds the right sample
        from metagraph_tpu.annotation.annotated_dbg import AnnotatedDBG
        from metagraph_tpu.annotation.matrix import load_annotation
        from metagraph_tpu.graph.canonical import CanonicalDBG
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        from metagraph_tpu.seq_io.fasta import read_fasta
        g = CanonicalDBG(DBGSuccinct.load(res["graph"]))
        anno = load_annotation(res["annotation"])
        ag = AnnotatedDBG(g, anno)
        q = read_fasta(samples[0])[0].seq
        labels = ag.get_labels(q, 0.9)
        assert labels == ["sample0"]


class TestWorkflowCLI:
    """metagraph-workflows build CLI (ref workflows/metagraph_workflows/cli.py)."""

    def _seqs_dir(self, tmp_path):
        import numpy as np
        d = tmp_path / "seqs"
        d.mkdir()
        rng = np.random.default_rng(1)
        for i in range(2):
            with open(d / f"s{i}.fa", "w") as f:
                for j in range(3):
                    f.write(f">r{j}\n"
                            + "".join(rng.choice(list("ACGT"), 300)) + "\n")
        return d

    def test_build_cli_dryrun_and_run(self, tmp_path):
        import os
        import subprocess
        import sys
        d = self._seqs_dir(tmp_path)
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
        base = [sys.executable, "-m", "metagraph_tpu.workflows.cli", "build",
                str(tmp_path / "out"), "--seqs-dir-path", str(d), "-k", "15"]
        r = subprocess.run(base + ["--dryrun"], capture_output=True,
                           text=True, env=env, cwd=tmp_path)
        assert r.returncode == 0 and "2 samples" in r.stderr
        assert not (tmp_path / "out").exists()
        r = subprocess.run(base, capture_output=True, text=True, env=env,
                           cwd=tmp_path)
        assert r.returncode == 0, r.stderr
        assert "workflow done" in r.stderr
        assert (tmp_path / "out" / "joint.dbg.npz").exists()
        # mutually exclusive inputs enforced
        r = subprocess.run(base + ["--seqs-file-list-path", "x"],
                           capture_output=True, text=True, env=env,
                           cwd=tmp_path)
        assert r.returncode != 0


class TestWorkflowLabelSources:
    def test_sequence_headers_label_source(self, tmp_path):
        """--annotation-labels-source sequence_headers labels by input
        record headers (ref AnnotationLabelsSource)."""
        import os
        import subprocess
        import sys
        d = tmp_path / "seqs"
        d.mkdir()
        (d / "s0.fa").write_text(
            ">recA\nACGTACGTACGTACGTACGTACG\n"
            ">recB\nTTTTGGGGCCCCAAAATTTTGGG\n")
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
        r = subprocess.run(
            [sys.executable, "-m", "metagraph_tpu.workflows.cli", "build",
             str(tmp_path / "out"), "--seqs-dir-path", str(d), "-k", "11",
             "--annotation-labels-source", "sequence_headers"],
            capture_output=True, text=True, env=env, cwd=tmp_path)
        assert r.returncode == 0, r.stderr
        r = subprocess.run(
            [sys.executable, "-m", "metagraph_tpu.cli", "stats", "-a",
             str(tmp_path / "out" / "annotation.column.annodbg"),
             "--print-col-names"],
            capture_output=True, text=True, env=env)
        assert "recA" in r.stdout and "recB" in r.stdout
        assert "s0" not in r.stdout.split("column names:")[1]


class TestSnakefile:
    """Snakemake-compatible workflow (metagraph_tpu/workflows/snakemake/):
    mirrors the reference rule DAG (ref snakemake/Snakefile + build.smk)
    with shells driving this package's CLI.  snakemake itself is not
    installed here, so the contract is checked two ways: every subcommand
    and long flag the Snakefile's shell blocks use must exist in the CLI,
    and the basic-path rule chain must run end-to-end via those commands."""

    SNAKEFILE = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metagraph_tpu", "workflows", "snakemake", "Snakefile")

    def test_shell_blocks_match_cli_surface(self):
        import re
        text = open(self.SNAKEFILE).read()
        # reference rule-DAG parity: the stage names users script against
        for rule in ("build", "annotate", "generate_column_list",
                     "transform_rd_stage", "transform_annotation",
                     "relax_brwt", "relax_row_diff_brwt",
                     "build_joint_primary", "primarize"):
            assert rule in text, rule
        shells = re.findall(r'"\{metagraph_cmd\}\s+(\w+)', text)
        assert shells, "no shell commands found"
        cli_text = open(os.path.join(os.path.dirname(self.SNAKEFILE),
                                     "..", "..", "cli", "main.py")).read()
        cli_cmds = set(re.findall(r'sub\.add_parser\("(\w+)"', cli_text))
        for cmd in set(shells):
            assert cmd in cli_cmds, f"Snakefile uses unknown CLI cmd {cmd}"
        for flag in set(re.findall(r"(--[a-z][a-z0-9-]+)", text)):
            if flag == "--config":
                continue  # snakemake's own flag, from the docstring
            assert flag in cli_text, f"Snakefile uses unknown flag {flag}"

    def test_basic_rule_chain_end_to_end(self, tmp_path):
        import subprocess
        import sys
        (tmp_path / "s0.fa").write_text(">r0\nACGTACGTACGTACGTACGTACG\n")
        (tmp_path / "s1.fa").write_text(">r0\nTTTTGGGGCCCCAAAATTTTGGG\n")
        flist = tmp_path / "files.txt"
        flist.write_text(f"{tmp_path}/s0.fa\n{tmp_path}/s1.fa\n")
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
        cli = [sys.executable, "-m", "metagraph_tpu.cli"]

        def run(args):
            r = subprocess.run(cli + args, capture_output=True, text=True,
                               env=env, cwd=tmp_path)
            assert r.returncode == 0, (args, r.stderr)

        # rule build -> rule annotate -> rule generate_column_list ->
        # rule transform_annotation_brwt (the Snakefile's shell commands);
        # relative inputs as the reference workflow stages them
        run(["build", "-k", "11", "-o", str(tmp_path / "g"),
             "s0.fa", "s1.fa"])
        cols = tmp_path / "columns"
        cols.mkdir()
        run(["annotate", "-i", str(tmp_path / "g.dbg.npz"),
             "--anno-filename", "--separately", "-o", str(cols),
             "s0.fa", "s1.fa"])
        col_files = sorted(str(p) for p in cols.glob("*.column.annodbg*"))
        assert len(col_files) == 2
        run(["transform_anno", "--anno-type", "brwt",
             "-i", str(tmp_path / "g.dbg.npz"),
             "-o", str(tmp_path / "g")] + col_files)
        from metagraph_tpu.annotation.matrix import load_annotation
        anno = load_annotation(str(tmp_path / "g.brwt.annodbg"))
        assert sorted(anno.encoder._labels) == ["s0.fa", "s1.fa"]
