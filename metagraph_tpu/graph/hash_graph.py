"""Hash- and bitmap-backed de Bruijn graphs
(ref src/graph/representation/hash/dbg_hash_ordered.hpp:12,
 dbg_hash_fast.hpp:12, dbg_hash_string.hpp:13, bitmap/dbg_bitmap.hpp).

DBGHashGraph — dynamic: k-mers in an insertion-ordered dict (node ids are
insertion ranks), supports add_sequence; the reference's query-batch graph.
DBGBitmapGraph — static: sorted packed k-mer array, node id = rank in sorted
order (the complete-space bitmap analog; rank == searchsorted).
Both expose the same DeBruijnGraph protocol as DBGSuccinct.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

from ..kmer import packing
from ..kmer.alphabets import DNA, Alphabet
from ..kmer.extractor import KmerExtractor

BASIC = "basic"
CANONICAL = "canonical"
PRIMARY = "primary"


class _KmerGraphBase:
    def __init__(self, k: int, mode: str = BASIC, alphabet: Alphabet = DNA):
        self.k = k
        self.mode = mode
        self.alphabet = alphabet
        self.extractor = KmerExtractor(alphabet)

    # ---- shared helpers ----------------------------------------------------
    def _windows(self, sequence):
        codes = self.extractor.encode(sequence)
        k = self.k
        if len(codes) < k:
            return codes, np.zeros((0, k), dtype=np.uint8), np.zeros(0, bool)
        wins = np.lib.stride_tricks.sliding_window_view(codes, k)
        bad = np.concatenate([[0], np.cumsum(codes >= self.alphabet.sigma)])
        valid = (bad[k:] - bad[:-k]) == 0
        return codes, wins, valid

    def _kmer_id(self, chars: np.ndarray) -> int:
        raise NotImplementedError

    def map_to_nodes_sequentially(self, sequence) -> np.ndarray:
        codes, wins, valid = self._windows(sequence)
        out = np.zeros(len(wins), dtype=np.int64)
        for i in np.flatnonzero(valid):
            out[i] = self._kmer_id(wins[i])
        return out

    def map_to_nodes(self, sequence) -> np.ndarray:
        if self.mode == CANONICAL:
            if isinstance(sequence, str):
                sequence = sequence.encode()
            fwd = self.map_to_nodes_sequentially(sequence)
            rc = _revcomp(sequence)
            bwd = self.map_to_nodes_sequentially(rc)[::-1]
            return np.where(fwd > 0, fwd, bwd)
        return self.map_to_nodes_sequentially(sequence)

    def get_node_sequence(self, node: int) -> bytes:
        return self.alphabet.decode_table[self._node_chars(node)].tobytes()

    def call_outgoing_kmers(self, node: int):
        chars = self._node_chars(node)
        out = []
        for c in range(1, self.alphabet.sigma):
            nxt = np.concatenate([chars[1:], [c]]).astype(np.uint8)
            nid = self._kmer_id(nxt)
            if nid:
                out.append((nid, chr(self.alphabet.decode_table[c])))
        return out

    def call_incoming_kmers(self, node: int):
        chars = self._node_chars(node)
        out = []
        for c in range(1, self.alphabet.sigma):
            prv = np.concatenate([[c], chars[:-1]]).astype(np.uint8)
            nid = self._kmer_id(prv)
            if nid:
                out.append((nid, chr(self.alphabet.decode_table[c])))
        return out

    def traverse(self, node: int, ch: str) -> int:
        c = int(self.extractor.encode(ch)[0])
        if c >= self.alphabet.sigma:
            return 0
        chars = self._node_chars(node)
        return self._kmer_id(np.concatenate([chars[1:], [c]]).astype(np.uint8))

    def has_multiple_outgoing(self, node: int) -> bool:
        return len(self.call_outgoing_kmers(node)) > 1

    def has_single_incoming(self, node: int) -> bool:
        return len(self.call_incoming_kmers(node)) == 1

    def outdegree(self, node: int) -> int:
        return len(self.call_outgoing_kmers(node))

    def indegree(self, node: int) -> int:
        return len(self.call_incoming_kmers(node))

    # ------------------------------------------------------------- storage
    GRAPH_TYPE = "hash"

    def node_kmers_and_ids(self):
        """(N, k) char matrix + node ids in id order (generic query index)."""
        import numpy as _np
        ids, chars = [], []
        for i, km in self.call_kmers():
            ids.append(i)
            chars.append(km)
        if not ids:
            return (_np.zeros((0, self.k), dtype=_np.uint8),
                    _np.zeros(0, dtype=_np.int64))
        return _np.stack(chars), _np.array(ids, dtype=_np.int64)

    def save(self, path: str):
        import numpy as _np
        chars, ids = self.node_kmers_and_ids()
        out = path if path.endswith(".npz") else path + ".dbg.npz"
        _np.savez_compressed(out, graph_type=self.GRAPH_TYPE, k=self.k,
                             mode=self.mode, kmers=chars, ids=ids,
                             alphabet=self.alphabet.name)

    @classmethod
    def load_generic(cls, z) -> "_KmerGraphBase":
        from . import GRAPH_CLASSES
        from ..kmer.alphabets import ALPHABETS
        gcls = GRAPH_CLASSES[str(z["graph_type"])]
        alpha = ALPHABETS[str(z["alphabet"])] if "alphabet" in z.files \
            else DNA
        g = gcls.rebuild(z["kmers"], z["ids"], int(z["k"]), str(z["mode"]),
                         alphabet=alpha)
        return g


class DBGHashGraph(_KmerGraphBase):
    """Dynamic insertion-ordered k-mer dict (DBGHashOrdered analog)."""

    def __init__(self, k: int, mode: str = BASIC, alphabet: Alphabet = DNA):
        super().__init__(k, mode, alphabet)
        self._index: Dict[bytes, int] = {}
        self._kmers: List[bytes] = []

    @classmethod
    def build(cls, sequences: Sequence, k: int, mode: str = BASIC,
              alphabet: Alphabet = DNA, **_) -> "DBGHashGraph":
        g = cls(k, mode, alphabet)
        for s in sequences:
            g.add_sequence(s)
        return g

    def add_sequence(self, sequence):
        codes, wins, valid = self._windows(sequence)
        both = self.mode == CANONICAL
        for i in np.flatnonzero(valid):
            self._insert(wins[i])
        if both and len(codes) >= self.k:
            comp = self.extractor.extended_complement_table()
            rc_codes = comp[codes[::-1]]
            rwins = np.lib.stride_tricks.sliding_window_view(rc_codes, self.k)
            for i in np.flatnonzero(valid[::-1]):
                self._insert(rwins[i])

    def _insert(self, chars: np.ndarray):
        key = chars.tobytes()
        if key not in self._index:
            self._index[key] = len(self._kmers) + 1
            self._kmers.append(key)

    def _kmer_id(self, chars: np.ndarray) -> int:
        return self._index.get(chars.tobytes(), 0)

    def _node_chars(self, node: int) -> np.ndarray:
        return np.frombuffer(self._kmers[node - 1], dtype=np.uint8)

    def num_nodes(self) -> int:
        return len(self._kmers)

    def max_index(self) -> int:
        return len(self._kmers)

    def call_kmers(self):
        for i, key in enumerate(self._kmers):
            yield i + 1, np.frombuffer(key, dtype=np.uint8)

    @classmethod
    def rebuild(cls, kmers, ids, k, mode,
                alphabet: Alphabet = DNA) -> "DBGHashGraph":
        g = cls(k, mode, alphabet)
        order = np.argsort(ids, kind="stable")
        for i in order:
            g._insert(np.asarray(kmers[i], dtype=np.uint8))
        return g


class DBGBitmapGraph(_KmerGraphBase):
    """Static sorted k-mer rank dictionary (DBGBitmap analog: node id =
    rank of the k-mer in the sorted complete space)."""

    def __init__(self, keys: np.ndarray, k: int, mode: str = BASIC,
                 alphabet: Alphabet = DNA):
        super().__init__(k, mode, alphabet)
        self._keys = keys     # (N, W) uint64 sorted lexicographic (colex order)

    @classmethod
    def build(cls, sequences: Sequence, k: int, mode: str = BASIC,
              alphabet: Alphabet = DNA, **_) -> "DBGBitmapGraph":
        ex = KmerExtractor(alphabet)
        collector_mode = "both" if mode == CANONICAL else "basic"
        chars, _ = ex.extract(sequences, k, mode=collector_mode)
        bits = packing.bits_for_alphabet(alphabet.sigma)
        keys = packing.sort_rows(packing.pack_codes(chars, bits=bits))
        return cls(keys, k, mode, alphabet)

    @property
    def _bits(self) -> int:
        return packing.bits_for_alphabet(self.alphabet.sigma)

    def _kmer_id(self, chars: np.ndarray) -> int:
        if not len(self._keys):
            return 0
        key = packing.pack_codes(chars[None, :], bits=self._bits)
        pos = packing.searchsorted_rows(self._keys, key)[0]
        if pos < len(self._keys) and (self._keys[pos] == key[0]).all():
            return int(pos) + 1
        return 0

    def map_to_nodes_sequentially(self, sequence) -> np.ndarray:
        codes, wins, valid = self._windows(sequence)
        out = np.zeros(len(wins), dtype=np.int64)
        if valid.any() and len(self._keys):
            q = packing.pack_codes(wins[valid], bits=self._bits)
            pos = packing.searchsorted_rows(self._keys, q)
            pos_c = np.minimum(pos, len(self._keys) - 1)
            hit = (pos < len(self._keys)) & np.all(self._keys[pos_c] == q, axis=1)
            out[np.flatnonzero(valid)] = np.where(hit, pos_c + 1, 0)
        return out

    def _node_chars(self, node: int) -> np.ndarray:
        return packing.unpack_codes(self._keys[node - 1][None, :], self.k,
                                    bits=self._bits)[0]

    GRAPH_TYPE = "bitmap"

    def call_kmers(self):
        chars = packing.unpack_codes(self._keys, self.k, bits=self._bits)
        for i in range(len(chars)):
            yield i + 1, chars[i]

    @classmethod
    def rebuild(cls, kmers, ids, k, mode,
                alphabet: Alphabet = DNA) -> "DBGBitmapGraph":
        bits = packing.bits_for_alphabet(alphabet.sigma)
        keys = packing.sort_rows(packing.pack_codes(
            np.asarray(kmers, dtype=np.uint8), bits=bits))
        return cls(keys, k, mode, alphabet)

    def num_nodes(self) -> int:
        return len(self._keys)

    def max_index(self) -> int:
        return len(self._keys)


def _revcomp(seq: bytes) -> bytes:
    table = bytes.maketrans(b"ACGTacgtUu", b"TGCATGCAAA")
    return seq.translate(table)[::-1]
