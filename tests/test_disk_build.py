"""Bounded-RAM external-memory construction (ref SortedSetDisk,
src/common/sorted_sets/sorted_set_disk_base.hpp:34 + Elias-Fano chunk spill).

The spill path must produce byte-identical BOSS arrays to the in-RAM build
while actually spilling chunks under the RAM cap."""

import os

import numpy as np
import pytest

from metagraph_tpu.graph.dbg_succinct import DBGSuccinct
from metagraph_tpu.kmer.disk_sort import SortedSetDisk
from metagraph_tpu.kmer.extractor import KmerExtractor
from metagraph_tpu.kmer import packing

REF = "/root/reference/metagraph/tests/data"


@pytest.fixture(scope="module")
def seqs():
    from metagraph_tpu.seq_io.fasta import read_fasta
    return [r.seq for r in read_fasta(f"{REF}/transcripts_100.fa")]


class TestSortedSetDisk:
    def test_spill_and_merge_equals_ram(self, tmp_path):
        rng = np.random.default_rng(5)
        keys = rng.integers(0, 50, (30000, 2)).astype(np.uint64)
        sink = SortedSetDisk(ram_cap_bytes=1 << 16, tmp_dir=str(tmp_path),
                             with_counts=True)
        for i in range(0, len(keys), 3000):
            sink.insert(keys[i: i + 3000])
        merged, counts = sink.merge_all()
        assert sink.spilled_bytes > 0          # the cap actually forced spill
        sink.cleanup()
        exp, expc = packing.unique_rows(keys, np.ones(len(keys), np.uint64))
        assert np.array_equal(merged, exp)
        assert np.array_equal(counts, expc)

    def test_extract_disk_equals_extract(self, seqs, tmp_path):
        ex = KmerExtractor()
        a, ca = ex.extract(seqs, 20, with_counts=True)
        b, cb = ex.extract_disk(seqs, 20, with_counts=True,
                                ram_cap_bytes=1 << 18,
                                tmp_dir=str(tmp_path))
        assert np.array_equal(a, b)
        assert np.array_equal(ca, cb)


class TestBoundedRamBuild:
    def test_mem_cap_build_equals_ram(self, seqs, tmp_path):
        g_ram = DBGSuccinct.build(seqs, 20)
        g_disk = DBGSuccinct.build(seqs, 20, disk_swap=str(tmp_path),
                                   mem_cap_bytes=1 << 18)
        for name in ("W", "last", "F", "valid"):
            assert np.array_equal(getattr(g_ram.boss, name),
                                  getattr(g_disk.boss, name)), name
        assert g_disk.num_nodes() == 46960     # ref anchor

    def test_cli_disk_swap(self, tmp_path):
        from tests.test_cli import run_cli
        r = run_cli(["build", "--mask-dummy", "-k", "20",
                     "--disk-swap", str(tmp_path), "--mem-cap-gb", "0.0003",
                     "-o", "g", f"{REF}/transcripts_100.fa"], tmp_path)
        assert r.returncode == 0, r.stderr
        out = run_cli(["stats", "g.dbg.npz"], tmp_path).stdout
        assert "nodes (k): 46960" in out


class TestMergeStaysOnDisk:
    def test_merge_decodes_chunks_to_scratch_memmaps(self, tmp_path):
        """merge() must not materialize all chunks in RAM: each chunk is
        decoded once into a disk scratch .npy and then block-sliced."""
        import glob
        rng = np.random.default_rng(9)
        sink = SortedSetDisk(ram_cap_bytes=1 << 16, tmp_dir=str(tmp_path))
        for i in range(0, 40000, 4000):
            sink.insert(rng.integers(0, 1000, (4000, 2)).astype(np.uint32))
        gen = sink.merge(block_rows=512)
        first_k, _ = next(gen)
        scratch = glob.glob(os.path.join(sink.dir, "*.keys.npy"))
        assert scratch, "no scratch memmaps were created"
        km = np.load(scratch[0], mmap_mode="r")
        assert isinstance(km, np.memmap)
        # stream the rest; output stays sorted unique across blocks
        prev = first_k
        for k, _ in gen:
            assert packing.rows_lex_gt(k[:1], prev[-1:])[0]
            prev = k
        sink.cleanup()
