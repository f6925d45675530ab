"""VCF parser: applies variants to a reference and emits k-mer context
sequences with labels (ref src/seq_io/vcf_parser.{hpp,cpp}; the reference
uses htslib — semantics re-derived and verified against
tests/test_vcf_parser.cpp vectors)."""

from __future__ import annotations

import gzip
import re
from typing import Dict, Iterator, List, Tuple

from .fasta import read_fasta


class VCFParser:
    def __init__(self, reference_file: str, vcf_file: str, k: int):
        self.k = k
        self.reference: Dict[str, bytes] = {
            rec.name: rec.seq for rec in read_fasta(reference_file)}
        opener = gzip.open if vcf_file.endswith(".gz") else open
        self._lines: List[str] = []
        self.samples: List[str] = []
        with opener(vcf_file, "rt") as f:
            for line in f:
                line = line.rstrip("\n")
                if line.startswith("##"):
                    continue
                if line.startswith("#CHROM"):
                    cols = line.split("\t")
                    if len(cols) > 9:
                        self.samples = cols[9:]
                    continue
                if line.strip():
                    self._lines.append(line)

    def _allele_sequences(self, chrom: str, pos: int, ref: str, alt: str):
        """sequence for one ALT allele with k-char context on both sides."""
        contig = self.reference.get(chrom)
        if contig is None:
            return None
        i = pos - 1
        if contig[i: i + len(ref)].decode().upper() != ref.upper():
            return None
        m = re.fullmatch(r"<CN(\d+)>", alt)
        if m:
            alt_seq = ref * int(m.group(1))
        elif alt.startswith("<"):
            return None
        else:
            alt_seq = alt
        prefix = contig[max(0, i - self.k): i].decode()
        suffix = contig[i + len(ref): i + len(ref) + self.k].decode()
        return prefix + alt_seq + suffix

    def call_annotated_sequences(self, annots: List[str] = ()
                                 ) -> Iterator[Tuple[str, List[str]]]:
        """yields (sequence, labels): labels = contig name + samples carrying
        the allele + requested INFO keys with nonzero per-allele values."""
        for line in self._lines:
            cols = line.split("\t")
            if len(cols) < 8:
                continue
            chrom, pos, _, ref, alts, _, _, info = cols[:8]
            pos = int(pos)
            fmt = cols[8].split(":") if len(cols) > 8 else []
            sample_cols = cols[9:] if len(cols) > 9 else []
            info_map = {}
            for kv in info.split(";"):
                if "=" in kv:
                    key, v = kv.split("=", 1)
                    info_map[key] = v.split(",")
            for ai, alt in enumerate(alts.split(",")):
                seq = self._allele_sequences(chrom, pos, ref, alt)
                if seq is None:
                    continue
                labels = [chrom]
                if "GT" in fmt:
                    gt_i = fmt.index("GT")
                    for name, col in zip(self.samples, sample_cols):
                        vals = col.split(":")
                        if gt_i < len(vals):
                            alleles = re.split(r"[|/]", vals[gt_i])
                            if str(ai + 1) in alleles:
                                labels.append(name)
                for key in annots:
                    vals = info_map.get(key)
                    if vals is None:
                        continue
                    v = vals[ai] if ai < len(vals) else vals[0]
                    try:
                        if float(v) > 0:
                            labels.append(key)
                    except ValueError:
                        labels.append(key)
                yield seq, labels

    def call_sequences(self) -> Iterator[str]:
        for seq, _ in self.call_annotated_sequences():
            yield seq
