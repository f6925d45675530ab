"""FASTA / FASTQ reading and writing (ref: src/seq_io/sequence_io.hpp:135,349).

A minimal, fast, numpy-backed parser: the whole file (or gzip stream) is read
into memory and split on record markers.  Handles FASTA ('>') and FASTQ ('@')
with multi-line sequences and gzip transparently.  The reference's kseq-based
parser has the same observable behavior for these formats.
"""

from __future__ import annotations

import gzip
import io
import os
from dataclasses import dataclass
from typing import Iterator, List, Sequence, Tuple


@dataclass
class FastaRecord:
    name: str
    seq: bytes
    quality: bytes | None = None
    comment: str = ""          # header text after the first token


def parse_abundance(comment: str):
    """ka:f:/km:f: k-mer abundance from a Logan-style header
    (ref common/utils/string_utils.cpp:26-36); None if absent."""
    import re
    m = re.search(r"(ka|km):f:([0-9.eE+-]+)", comment)
    if not m:
        return None
    try:
        v = float(m.group(2))
        # llround semantics: half rounds AWAY from zero (Python's round is
        # banker's — diverges on x.5, e.g. 12.5)
        import math
        return max(1, int(math.floor(v + 0.5)) if v >= 0
                   else int(math.ceil(v - 0.5)))
    except ValueError:
        return None


def _open(path: str) -> bytes:
    with open(path, "rb") as f:
        head = f.read(2)
        f.seek(0)
        if head == b"\x1f\x8b":
            return gzip.decompress(f.read())
        return f.read()


def read_fasta(path: str) -> List[FastaRecord]:
    data = _open(path).lstrip()
    if not data:
        return []
    if data[:1] == b">":
        return _parse_fasta(data)
    if data[:1] == b"@":
        return _parse_fastq(data)
    raise ValueError(f"{path}: not FASTA/FASTQ (starts with {data[:1]!r})")


def _parse_fasta(data: bytes) -> List[FastaRecord]:
    records = []
    for chunk in data.split(b"\n>"):
        chunk = chunk.lstrip(b">")
        if not chunk.strip():
            continue
        nl = chunk.find(b"\n")
        if nl < 0:
            header, body = chunk, b""
        else:
            header, body = chunk[:nl], chunk[nl + 1:]
        parts = header.split(None, 1)
        name = parts[0].decode() if parts else ""
        comment = parts[1].decode() if len(parts) > 1 else ""
        records.append(FastaRecord(
            name, body.replace(b"\n", b"").replace(b"\r", b""),
            comment=comment))
    return records


def _parse_fastq(data: bytes) -> List[FastaRecord]:
    """kseq-style FASTQ: multi-line sequences and qualities are allowed; the
    quality block ends once its length reaches the sequence length
    (ref kseq.h semantics used by FastaParser)."""
    lines = data.split(b"\n")
    records = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if not line:
            i += 1
            continue
        if not line.startswith(b"@"):
            raise ValueError(f"malformed FASTQ: expected '@' header, got "
                             f"{line[:30]!r}")
        toks = line[1:].split(None, 1)
        name = toks[0].decode() if toks else ""
        comment = toks[1].decode() if len(toks) > 1 else ""
        i += 1
        seq_parts = []
        while i < n and not lines[i].startswith(b"+"):
            seq_parts.append(lines[i].strip())
            i += 1
        seq = b"".join(seq_parts)
        i += 1                                   # the '+' separator line
        qual_parts, qlen = [], 0
        while i < n and qlen < len(seq):
            q = lines[i].strip()
            qual_parts.append(q)
            qlen += len(q)
            i += 1
        qual = b"".join(qual_parts) if qual_parts else None
        records.append(FastaRecord(name, seq, qual, comment=comment))
    return records


def iter_sequences(paths: Sequence[str]) -> Iterator[Tuple[str, bytes]]:
    for p in paths:
        for rec in read_fasta(p):
            yield rec.name, rec.seq


def write_extended_fasta(path: str, records: Sequence[Tuple[str, bytes | str]],
                         kmer_counts: Sequence, k: int) -> None:
    """FASTA + per-k-mer count sidecar (ref ExtendedFastaWriter,
    seq_io/sequence_io.hpp:135: '<base>.fasta.gz' + '<base>.kmer_counts.gz';
    we store the counts as a compressed npz next to the fasta)."""
    write_fasta(path, records)
    import numpy as np
    counts_path = _counts_sidecar(path)
    flat = (np.concatenate([np.asarray(c, dtype=np.uint32) for c in kmer_counts])
            if len(kmer_counts) else np.zeros(0, np.uint32))
    offs = np.cumsum([0] + [len(c) for c in kmer_counts]).astype(np.int64)
    tmp = counts_path + ".tmp"
    import io as _io
    buf = _io.BytesIO()
    import numpy as _np
    _np.savez_compressed(buf, counts=flat, offsets=offs, k=k)
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, counts_path)


def _counts_sidecar(path: str) -> str:
    base = path
    for suf in (".gz", ".fasta", ".fa"):
        if base.endswith(suf):
            base = base[: -len(suf)]
    return base + ".kmer_counts.npz"


def read_kmer_counts(path: str):
    """Load the count sidecar for a FASTA file, or None."""
    import numpy as np
    counts_path = _counts_sidecar(path)
    if not os.path.exists(counts_path):
        return None
    z = np.load(counts_path)
    flat, offs = z["counts"], z["offsets"]
    return [flat[offs[i]: offs[i + 1]] for i in range(len(offs) - 1)]


def write_fasta(path: str, records: Sequence[Tuple[str, bytes | str]],
                gzip_out: bool | None = None) -> None:
    if gzip_out is None:
        gzip_out = path.endswith(".gz")
    buf = io.BytesIO()
    for name, seq in records:
        if isinstance(seq, str):
            seq = seq.encode()
        buf.write(b">" + name.encode() + b"\n" + seq + b"\n")
    payload = buf.getvalue()
    if gzip_out:
        payload = gzip.compress(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
