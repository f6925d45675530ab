"""VCF parser tests — vectors from tests/test_vcf_parser.cpp."""

import pytest

from metagraph_tpu.seq_io.vcf import VCFParser

REF = "/root/reference/metagraph/tests/data/test_vcfparse.fa"
VCF1 = "/root/reference/metagraph/tests/data/test_vcfparse_1.vcf"
VCF2 = "/root/reference/metagraph/tests/data/test_vcfparse_2.vcf"

ANNOTS = ["AC_AFR", "AC_AMR", "AC_ASJ", "AC_EAS", "AC_FIN", "AC_NFE",
          "AC_OTH", "AC_SAS"]


class TestVCFParse:
    def test_kmer_no_annot(self):
        vcf = VCFParser(REF, VCF1, 3)
        assert sorted(vcf.call_sequences()) == ["TGCGCGC"]

    def test_kmer_annotated(self):
        vcf = VCFParser(REF, VCF1, 3)
        out = [(s, sorted(a)) for s, a in vcf.call_annotated_sequences(ANNOTS)]
        assert out == [("TGCGCGC", ["A", "B", "C", "test"])]

    def test_kmer_edge(self):
        vcf = VCFParser(REF, VCF1, 4)
        assert [s for s, _ in vcf.call_annotated_sequences(ANNOTS)] \
            == ["ATGCGCGCG"]

    def test_kmer_over_left_edge(self):
        vcf = VCFParser(REF, VCF1, 5)
        assert [s for s, _ in vcf.call_annotated_sequences(ANNOTS)] \
            == ["ATGCGCGCGC"]

    def test_kmer_over_both_edges(self):
        vcf = VCFParser(REF, VCF1, 16)
        assert [s for s, _ in vcf.call_annotated_sequences(ANNOTS)] \
            == ["ATGCGCGCGCGCTCTCGCGCA"]

    def test_copy_number_alleles(self):
        vcf = VCFParser(REF, VCF2, 3)
        out = sorted((s, tuple(sorted(a)))
                     for s, a in vcf.call_annotated_sequences(ANNOTS))
        assert out == [
            ("TGCCCGC", ("AC_AMR", "test")),
            ("TGCTTCGC", ("test",)),
            ("TGCTTTTCGC", ("test",)),
        ]

    def test_gzip_input(self):
        vcf = VCFParser(
            REF,
            "/root/reference/metagraph/tests/data/test_vcfparse_1.good.vcf.gz",
            3)
        assert sorted(vcf.call_sequences()) == ["TGCGCGC"]
