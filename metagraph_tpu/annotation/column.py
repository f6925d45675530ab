"""Column-major multi-label annotation (ref src/annotation/).

The build-time representation: one column per label, stored as a sorted array
of set row indices (the dense-array analog of the reference's compressed
column bit vectors, ref annotation/representation/column_compressed/
annotate_column_compressed.hpp:26).  Optional per-entry integer values
(k-mer counts, ref int_matrix) and coordinate multisets (ref tuple CSC).

All query ops are batch-vectorized; the device bitmap mirror lives in
annotation/ops.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np


class LabelEncoder:
    """label string <-> code (ref annotation/representation/base/annotation.hpp:90)."""

    def __init__(self, labels: Sequence[str] = ()):
        self._labels: List[str] = list(labels)
        self._index: Dict[str, int] = {l: i for i, l in enumerate(self._labels)}

    def insert_and_encode(self, label: str) -> int:
        code = self._index.get(label)
        if code is None:
            code = len(self._labels)
            self._index[label] = code
            self._labels.append(label)
        return code

    def encode(self, label: str) -> int:
        return self._index[label]

    def decode(self, code: int) -> str:
        return self._labels[code]

    def __len__(self):
        return len(self._labels)

    def rename(self, mapping: Dict[str, str]):
        """Rename labels in place (ref annotation.cpp rename_labels); raises
        on unknown source labels or duplicate target labels."""
        for old in mapping:
            if old not in self._index:
                raise ValueError(f"Label '{old}' not found in annotation")
        new_labels = [mapping.get(l, l) for l in self._labels]
        if len(set(new_labels)) != len(new_labels):
            raise ValueError("renaming produces duplicate labels")
        self._labels = new_labels
        self._index = {l: i for i, l in enumerate(self._labels)}

    @property
    def labels(self) -> List[str]:
        return self._labels


class ColumnMajorAnnotation:
    """Multi-label binary (+ values/coords) annotation in column-major form."""

    def __init__(self, num_rows: int):
        self.num_rows = num_rows
        self.encoder = LabelEncoder()
        # per label: accumulating lists during build, frozen numpy after
        self._rows: List[np.ndarray | list] = []
        self._values: List[np.ndarray | list] = []       # kmer counts
        self._coords: List[list] = []                    # (row, coord) pairs
        self._frozen = False
        self.has_values = False
        self.has_coords = False
        # bounded-RAM builder state (ref ColumnCompressed disk swap,
        # annotate_column_compressed.hpp:26): spill directory + RAM cap
        self._swap_dir = None
        self._swap_cap = 0
        self._acc_bytes = 0
        self._spills: List[str] = []

    # -------------------------------------------------------- disk swap
    def enable_disk_swap(self, tmp_dir: str, mem_cap_bytes: int):
        """Bound the builder's accumulation RAM: buffered (row[,value/coord])
        arrays spill to npz chunks once the cap is exceeded; freeze() streams
        them back one column at a time (the reference's --disk-swap /
        --mem-cap-gb behavior for `annotate`)."""
        import tempfile
        assert not self._frozen
        self._swap_dir = tempfile.mkdtemp(prefix="mg_annoswap_",
                                          dir=tmp_dir or None)
        self._swap_cap = max(int(mem_cap_bytes), 1 << 16)

    def _track(self, arr: np.ndarray):
        if self._swap_dir is None:
            return
        self._acc_bytes += arr.nbytes
        if self._acc_bytes >= self._swap_cap:
            self._spill()

    def _spill(self):
        import os
        payload = {}
        for c in range(len(self.encoder)):
            if self._rows[c]:
                payload[f"r{c}"] = np.concatenate(
                    [np.atleast_1d(a) for a in self._rows[c]])
                self._rows[c] = []
            if self._values[c]:
                payload[f"v{c}"] = np.concatenate(self._values[c], axis=0)
                self._values[c] = []
            if self._coords[c]:
                payload[f"c{c}"] = np.concatenate(self._coords[c], axis=0)
                self._coords[c] = []
        if not payload:
            return
        path = os.path.join(self._swap_dir,
                            f"chunk{len(self._spills)}.npz")
        np.savez(path, **payload)
        self._spills.append(path)
        self._acc_bytes = 0

    def _spilled_all(self, c: int):
        """(rows, values, coords) parts of column c across all spill chunks —
        each chunk archive is opened ONCE per column (npz members load
        lazily, so only this column's arrays are read)."""
        rs, vs, cs = [], [], []
        for path in self._spills:
            with np.load(path) as z:
                files = set(z.files)
                if f"r{c}" in files:
                    rs.append(z[f"r{c}"])
                if f"v{c}" in files:
                    vs.append(z[f"v{c}"])
                if f"c{c}" in files:
                    cs.append(z[f"c{c}"])
        return rs, vs, cs

    # ------------------------------------------------------------- building
    def _col(self, label: str) -> int:
        c = self.encoder.insert_and_encode(label)
        while len(self._rows) < len(self.encoder):
            self._rows.append([])
            self._values.append([])
            self._coords.append([])
        return c

    def add_labels(self, rows: np.ndarray, labels: Sequence[str]):
        assert not self._frozen
        for label in labels:
            a = np.asarray(rows, dtype=np.int64)
            self._rows[self._col(label)].append(a)
            self._track(a)

    def add_label_counts(self, rows: np.ndarray, counts: np.ndarray,
                         labels: Sequence[str]):
        """Accumulate k-mer count values (ref add_kmer_counts)."""
        assert not self._frozen
        self.has_values = True
        for label in labels:
            c = self._col(label)
            a = np.stack([np.asarray(rows, dtype=np.int64),
                          np.asarray(counts, dtype=np.int64)], axis=1)
            self._values[c].append(a)
            self._track(a)

    def add_label_coords(self, rows: np.ndarray, coords: np.ndarray,
                         labels: Sequence[str]):
        """Accumulate k-mer coordinates (ref add_kmer_coords)."""
        assert not self._frozen
        self.has_coords = True
        for label in labels:
            c = self._col(label)
            a = np.stack([np.asarray(rows, dtype=np.int64),
                          np.asarray(coords, dtype=np.int64)], axis=1)
            self._coords[c].append(a)
            self._track(a)

    def freeze(self):
        """Dedupe + sort all columns after building."""
        if self._frozen:
            return
        rows_out, vals_out, coords_out = [], [], []
        for c in range(len(self.encoder)):
            parts = self._rows[c]
            if self._spills:
                sp_r, sp_v, sp_c = self._spilled_all(c)
                parts = parts + sp_r
                self._values[c] = self._values[c] + sp_v
                self._coords[c] = self._coords[c] + sp_c
            r = (np.unique(np.concatenate(parts)) if parts
                 else np.zeros(0, dtype=np.int64))
            if self._values[c]:
                rv = np.concatenate(self._values[c], axis=0)
                # sum counts per row (multiple sources add up)
                order = np.argsort(rv[:, 0], kind="stable")
                rv = rv[order]
                uniq, start = np.unique(rv[:, 0], return_index=True)
                sums = np.add.reduceat(rv[:, 1], start)
                r = np.union1d(r, uniq)
                v = np.zeros(len(r), dtype=np.int64)
                v[np.searchsorted(r, uniq)] = sums
                vals_out.append(v)
            else:
                vals_out.append(np.zeros(len(r), dtype=np.int64))
            if self._coords[c]:
                rc = np.concatenate(self._coords[c], axis=0)
                order = np.lexsort((rc[:, 1], rc[:, 0]))
                coords_out.append(rc[order])
            else:
                coords_out.append(np.zeros((0, 2), dtype=np.int64))
            rows_out.append(r)
        self._rows = rows_out
        self._values = vals_out
        self._coords = coords_out
        self._frozen = True
        if self._swap_dir is not None:
            import shutil
            shutil.rmtree(self._swap_dir, ignore_errors=True)
            self._spills = []
            self._swap_dir = None

    # -------------------------------------------------------------- queries
    @property
    def num_labels(self) -> int:
        return len(self.encoder)

    def column_rows(self, code: int) -> np.ndarray:
        self.freeze()
        return self._rows[code]

    def get_rows_mask(self, rows: np.ndarray) -> np.ndarray:
        """(Q,) rows -> (Q, L) bool membership matrix."""
        self.freeze()
        Q = len(rows)
        out = np.zeros((Q, self.num_labels), dtype=bool)
        for c in range(self.num_labels):
            col = self._rows[c]
            if len(col):
                pos = np.searchsorted(col, rows)
                pos_c = np.minimum(pos, len(col) - 1)
                out[:, c] = (pos < len(col)) & (col[pos_c] == rows)
        return out

    def sum_rows(self, row_counts: Sequence[Tuple[int, int]],
                 min_count: int) -> List[Tuple[int, int]]:
        """[(row, multiplicity)] -> [(label code, total count >= min_count)]
        in code order (ref binary_matrix.hpp sum_rows)."""
        self.freeze()
        if not len(row_counts):
            return []
        rows = np.array([r for r, _ in row_counts], dtype=np.int64)
        mult = np.array([m for _, m in row_counts], dtype=np.int64)
        mask = self.get_rows_mask(rows)
        totals = mask.astype(np.int64).T @ mult
        return [(c, int(totals[c])) for c in range(self.num_labels)
                if totals[c] >= min_count]

    def get_row_values(self, rows: np.ndarray) -> List[List[Tuple[int, int]]]:
        """per row: [(label code, value)] (ref int_matrix get_row_values).
        For coordinate-only annotations the value is the number of
        coordinates (occurrences), as in the reference's tuple matrices."""
        self.freeze()
        if not self.has_values and self.has_coords:
            return [[(c, len(t)) for c, t in row]
                    for row in self.get_row_tuples(rows)]
        out = [[] for _ in range(len(rows))]
        for c in range(self.num_labels):
            col = self._rows[c]
            if not len(col):
                continue
            pos = np.searchsorted(col, rows)
            pos_c = np.minimum(pos, len(col) - 1)
            hit = (pos < len(col)) & (col[pos_c] == rows)
            for i in np.flatnonzero(hit):
                out[i].append((c, int(self._values[c][pos_c[i]])))
        return out

    def get_row_tuples(self, rows: np.ndarray) -> List[List[Tuple[int, List[int]]]]:
        """per row: [(label code, [coords...])] (ref MultiIntMatrix)."""
        self.freeze()
        out = [[] for _ in range(len(rows))]
        for c in range(self.num_labels):
            rc = self._coords[c]
            if not len(rc):
                continue
            lo = np.searchsorted(rc[:, 0], rows, side="left")
            hi = np.searchsorted(rc[:, 0], rows, side="right")
            for i in np.flatnonzero(hi > lo):
                out[i].append((c, rc[lo[i]:hi[i], 1].tolist()))
        return out

    def coords_triples(self):
        """All coordinates as three parallel int64 arrays (rows, labels,
        coords) sorted by (row, label, coord) — the vectorized bulk export
        the tuple-matrix converters build from (instead of per-row lists)."""
        self.freeze()
        parts_r, parts_l, parts_c = [], [], []
        for c in range(self.num_labels):
            rc = self._coords[c]
            if not len(rc):
                continue
            parts_r.append(rc[:, 0])
            parts_l.append(np.full(len(rc), c, dtype=np.int64))
            parts_c.append(rc[:, 1])
        if not parts_r:
            z = np.zeros(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        rows = np.concatenate(parts_r)
        labs = np.concatenate(parts_l)
        crd = np.concatenate(parts_c)
        order = np.lexsort((crd, labs, rows))
        return rows[order], labs[order], crd[order]

    def compressed_columns(self):
        """Per-label adaptive compressed bit vectors (the reference's
        ColumnCompressed storage unit, annotate_column_compressed.hpp:26
        holds one bit_vector per column; bit_vector_smallest picks
        sd / rrr / stat per column by predicted footprint)."""
        from ..succinct.bitvector import bit_vector_smallest
        self.freeze()
        return [bit_vector_smallest(positions=self._rows[c], n=self.num_rows)
                for c in range(self.num_labels)]

    # -------------------------------------------------------------- storage
    def save(self, path: str, codec: str = "sorted"):
        """codec="sorted": raw sorted row-index arrays (default).
        codec="smallest": each column as its smallest sd/rrr/stat bit vector
        (succinct/bitvector.py) — the on-disk analog of the reference's
        per-column bit_vector_smart serialization."""
        self.freeze()
        payload = {"num_rows": self.num_rows,
                   "labels": np.array(self.encoder.labels, dtype=object),
                   "has_values": self.has_values, "has_coords": self.has_coords}
        if codec == "smallest":
            payload["codec"] = "smallest"
            for c, v in enumerate(self.compressed_columns()):
                for k, arr in v.to_dict().items():
                    payload[f"col{c}_{k}"] = arr
        for c in range(self.num_labels):
            if codec != "smallest":
                payload[f"rows_{c}"] = self._rows[c]
            payload[f"vals_{c}"] = self._values[c]
            payload[f"coords_{c}"] = self._coords[c]
        np.savez_compressed(path, **payload, allow_pickle=True)

    @classmethod
    def load(cls, path: str) -> "ColumnMajorAnnotation":
        z = np.load(path if path.endswith(".npz") else path + ".npz",
                    allow_pickle=True)
        a = cls(int(z["num_rows"]))
        labels = [str(x) for x in z["labels"]]
        a.encoder = LabelEncoder(labels)
        if "codec" in z.files and str(z["codec"]) == "smallest":
            from ..succinct.bitvector import bitvector_from_dict
            a._rows = []
            a.column_codecs = []
            for c in range(len(labels)):
                pre = f"col{c}_"
                d = {k[len(pre):]: z[k] for k in z.files
                     if k.startswith(pre)}
                v = bitvector_from_dict(d)
                a.column_codecs.append(v.kind)
                m = v.num_set_bits
                a._rows.append(v.select1(np.arange(m, dtype=np.int64))
                               if m else np.zeros(0, np.int64))
        else:
            a._rows = [z[f"rows_{c}"] for c in range(len(labels))]
        a._values = [z[f"vals_{c}"] for c in range(len(labels))]
        a._coords = [z[f"coords_{c}"] for c in range(len(labels))]
        a.has_values = bool(z["has_values"])
        a.has_coords = bool(z["has_coords"])
        a._frozen = True
        return a
