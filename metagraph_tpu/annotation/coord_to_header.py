"""CoordToHeader: per-column mapping from global k-mer coordinates to
sequence headers (ref src/annotation/coord_to_header.{hpp,cpp}).

A column built with `annotate --anno-filename --coordinates` collapses all
sequences of a FASTA file into one label with consecutive global
coordinates; this index remembers each sequence's header and k-mer count so
query/align output can report per-sequence labels
(`annotate --index-header-coords`, stored as `<anno>.seqs`)."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

EXTENSION = ".seqs"


class CoordToHeader:
    def __init__(self, headers: List[List[str]],
                 num_kmers: List[List[int]]):
        self.headers = headers
        # cumulative k-mer offsets per column: offsets[c][i] = first global
        # coord of sequence i (ref coord_offsets_ sd_vector)
        self.offsets = [np.concatenate([[0], np.cumsum(nk)]).astype(np.int64)
                        for nk in num_kmers]

    def num_columns(self) -> int:
        return len(self.headers)

    def num_sequences(self, col: int) -> int:
        return len(self.headers[col])

    def num_kmers_in_sequence(self, col: int, seq_id: int) -> int:
        return int(self.offsets[col][seq_id + 1] - self.offsets[col][seq_id])

    def get_headers(self, col: int) -> List[str]:
        return self.headers[col]

    def map_single_coord(self, col: int, coord: int) -> Tuple[int, int]:
        """global coord -> (seq_id, local coord) (ref coord_to_header.hpp:53)."""
        off = self.offsets[col]
        seq_id = int(np.searchsorted(off, coord, side="right")) - 1
        return seq_id, int(coord - off[seq_id])

    # ------------------------------------------------------------- storage
    def save(self, path_base: str):
        path = path_base if path_base.endswith(EXTENSION) \
            else path_base + EXTENSION
        np.savez_compressed(
            path + ".npz" if not path.endswith(".npz") else path,
            n_cols=len(self.headers),
            **{f"h{c}": np.array(self.headers[c]) for c in
               range(len(self.headers))},
            **{f"o{c}": self.offsets[c] for c in range(len(self.headers))})
        import os
        os.replace(path + ".npz", path)

    @classmethod
    def load(cls, path: str) -> "CoordToHeader":
        z = np.load(path, allow_pickle=False)
        n = int(z["n_cols"])
        obj = cls.__new__(cls)
        obj.headers = [[str(x) for x in z[f"h{c}"]] for c in range(n)]
        obj.offsets = [z[f"o{c}"].astype(np.int64) for c in range(n)]
        return obj


def format_alignment_coords(alignment, encoder, k: int,
                            cth: CoordToHeader | None = None) -> str:
    """ref Alignment::format_coords (alignment.cpp:20-92): without the
    index, `label:coord+1-coord+len` per coordinate; with it, the range is
    split across sequence boundaries into `header:start-end` 1-based
    inclusive local ranges, ';'-joined."""
    if not getattr(alignment, "label_coordinates", None):
        return ""
    L = len(alignment.sequence)
    parts = []
    if cth is None:
        for col, coords in zip(alignment.label_columns,
                               alignment.label_coordinates):
            s = encoder.decode(col)
            for coord in coords:
                s += f":{coord + 1}-{coord + L}"
            parts.append(s)
        return ";".join(parts)
    seq_ranges = {}
    order = []
    for col, coords in zip(alignment.label_columns,
                           alignment.label_coordinates):
        n_seqs = cth.num_sequences(col)
        for coord in coords:
            seq_id, local = cth.map_single_coord(col, coord)
            remaining = L
            cur_seq, cur_local = seq_id, local
            while remaining:
                if cur_seq >= n_seqs:
                    break
                nt_len = cth.num_kmers_in_sequence(col, cur_seq) + k - 1
                span = min(remaining, nt_len - cur_local)
                if span > 0:
                    # zero-span stretches (empty sequences) would emit
                    # inverted 'header:1-0' ranges
                    key = (col, cur_seq)
                    if key not in seq_ranges:
                        seq_ranges[key] = []
                        order.append(key)
                    seq_ranges[key].append((cur_local, cur_local + span - 1))
                    remaining -= span
                cur_seq += 1
                cur_local = 0
    for key in order:
        col, seq_id = key
        s = cth.get_headers(col)[seq_id]
        for start, end in seq_ranges[key]:
            s += f":{start + 1}-{end + 1}"
        parts.append(s)
    return ";".join(parts)
