"""Writers for the reference's on-disk formats — the emit side of
refformat.py, so artifacts produced by this engine can be loaded by the
reference `metagraph` binary (ref boss.cpp:262-340 serialize,
dbg_succinct.cpp:787-833, annotate_column_compressed.cpp serialize,
common/serialization.cpp).

Everything is serialized in the reference's BOSS state SMALL:
wt_huff<rrr_vector<63>> for W and bit_vector_small (adaptive tag 0 = RRR)
for `last` and the columns — the RRR representation is chosen because its
sdsl rank/select supports serialize zero bytes, so the files contain only
deterministic payload (no select_support_mcl layouts to reproduce).

The rrr sample directories (m_btnrp / m_rank, sample rate t_k=32) and the
combinadic block-offset convention are fitted byte-exactly against the
reference example artifacts (see tests/test_refformat.py round-trips).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

from .refformat import _binom_table, _rrr_space_for_bt


class Writer:
    def __init__(self):
        self.buf = bytearray()

    def be64(self, v: int):
        self.buf += struct.pack(">Q", v)

    def le64(self, v: int):
        self.buf += struct.pack("<Q", v)

    def u8(self, v: int):
        self.buf.append(v & 0xFF)

    def u16(self, v: int):
        self.buf += struct.pack("<H", v)

    def raw(self, b: bytes):
        self.buf += b

    def utf8_len(self, n: int):
        """encode_utf8 length prefix (ref serialization.cpp:172-178):
        classic extended UTF-8 of the integer, valid for any n < 2^31
        (chr(n).encode would reject surrogate-range and > 0x10FFFF values
        that are legal lengths here)."""
        if n < 0:
            raise ValueError(n)
        if n < 0x80:
            self.buf += bytes([n])
            return
        for length, limit in ((2, 0x800), (3, 0x10000), (4, 0x200000),
                              (5, 0x4000000), (6, 0x80000000)):
            if n < limit:
                break
        else:
            raise ValueError("Encoding value out of range for code.")
        lead = (0xFF << (8 - length)) & 0xFF
        out = [lead | (n >> (6 * (length - 1)))]
        for i in range(length - 2, -1, -1):
            out.append(0x80 | ((n >> (6 * i)) & 0x3F))
        self.buf += bytes(out)


def pack_words(values: np.ndarray, width: int) -> np.ndarray:
    """Pack ints LSB-first into little-endian u64 words (sdsl layout)."""
    n = len(values)
    bits = n * width
    words = np.zeros(bits // 64 + 2, dtype=np.uint64)
    if n:
        v = values.astype(np.uint64)
        off = np.arange(n, dtype=np.int64) * width
        wi = off >> 6
        sh = (off & 63).astype(np.uint64)
        np.bitwise_or.at(words, wi, v << sh)
        spill = (sh.astype(np.int64) + width) > 64
        np.bitwise_or.at(words, wi[spill] + 1,
                         v[spill] >> (np.uint64(64) - sh[spill]))
    return words[: (bits + 63) // 64]


def write_int_vector(w: Writer, values: np.ndarray, width: int,
                     fixed_width: bool = False):
    """sdsl::int_vector serialization: size-in-bits u64 LE, width byte for
    int_vector<0>, raw words."""
    values = np.asarray(values)
    w.le64(len(values) * width)
    if not fixed_width:
        w.u8(width)
    w.raw(pack_words(values, width).tobytes())


def write_bit_vector(w: Writer, bits: np.ndarray):
    """sdsl::bit_vector: size bits + words, no width byte."""
    bits = np.asarray(bits, dtype=bool)
    w.le64(len(bits))
    if len(bits):
        packed = np.packbits(bits, bitorder="little")
        pad = (-len(packed)) % 8
        w.raw(packed.tobytes() + b"\0" * pad)


def _rrr_rank_block(bits: np.ndarray, k: int, n: int = 63) -> int:
    """Combinadic block rank — exact inverse of refformat._rrr_decode_block."""
    C = _binom_table(n)
    nr = 0
    kk = k
    for i in range(n):
        if kk == 0:
            break
        if i < len(bits) and bits[i]:
            kk -= 1
        else:
            nr += C[n - 1 - i][kk - 1]
    if 2 * k <= n:
        nr = C[n][k] - 1 - nr
    return nr


def _rrr_rank_blocks(blocks: np.ndarray, bt: np.ndarray,
                     n: int = 63) -> np.ndarray:
    """_rrr_rank_block vectorized over ALL blocks (63 numpy steps total
    instead of 63 Python steps per block).  Ranks fit uint64 for n = 63
    (C(63, 31) - 1 < 2^63)."""
    C = np.array(_binom_table(n), dtype=np.uint64)       # (n+1, n+1)
    nb = len(bt)
    nr = np.zeros(nb, dtype=np.uint64)
    kk = bt.astype(np.int64).copy()
    for i in range(n):
        active = kk > 0
        bit = blocks[:, i]
        add = active & ~bit
        if add.any():
            nr[add] += C[n - 1 - i, kk[add] - 1]
        kk[active & bit] -= 1
    flip = 2 * bt <= n
    nr[flip] = C[n, bt[flip]] - np.uint64(1) - nr[flip]
    return nr


def write_rrr_vector(w: Writer, bits: np.ndarray, block_size: int = 63,
                     t_k: int = 32):
    """sdsl::rrr_vector<63> (layout per refformat.read_rrr_vector plus the
    fitted m_btnrp / m_rank sample directories, rate t_k=32)."""
    bits = np.asarray(bits, dtype=bool)
    m_size = len(bits)
    nb = (m_size + block_size - 1) // block_size
    pad = np.zeros(nb * block_size, dtype=bool)
    pad[:m_size] = bits
    blocks = pad.reshape(nb, block_size) if nb else pad.reshape(0, block_size)
    bt = blocks.sum(axis=1).astype(np.int64)

    # offset stream: variable-width combinadic rank per block — fully
    # vectorized (the per-block/per-bit Python loops made every .dbg save
    # O(total bits) interpreted work)
    width_by_k = np.array([_rrr_space_for_bt(k, block_size)
                           for k in range(block_size + 1)], dtype=np.int64)
    widths = width_by_k[bt] if nb else np.zeros(0, dtype=np.int64)
    offs = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(widths, out=offs[1:])
    rank_cum = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(bt, out=rank_cum[1:])
    btnrp_samples = offs[:-1:t_k].tolist() if nb else [0]
    rank_samples = rank_cum[:-1:t_k].tolist() if nb else [0]
    if nb == 0:
        btnrp_samples, rank_samples = [0], [0]
    rank_samples.append(int(rank_cum[-1]))         # final total (fitted)
    total = int(offs[-1])
    if total:
        nr = _rrr_rank_blocks(blocks, bt, block_size)
        owner = np.repeat(np.arange(nb), widths)
        j = (np.arange(total, dtype=np.int64)
             - np.repeat(offs[:-1], widths)).astype(np.uint64)
        stream = ((nr[owner] >> j) & np.uint64(1)).astype(bool)
    else:
        stream = np.zeros(0, dtype=bool)
    btnr_bits = np.zeros(max(len(stream), 64), dtype=bool)
    btnr_bits[: len(stream)] = stream

    w.le64(m_size)
    bt_width = max(int(block_size).bit_length(), 1)   # hi(63)+1 = 6
    write_int_vector(w, bt, bt_width)
    write_bit_vector(w, btnr_bits)
    ptr_width = max(int(len(stream)).bit_length(), 1)  # sdsl: hi(btnr_pos)+1
    write_int_vector(w, np.array(btnrp_samples, dtype=np.int64), ptr_width)
    rank_width = max(int(m_size).bit_length(), 1)
    write_int_vector(w, np.array(rank_samples, dtype=np.int64), rank_width)


def write_bit_vector_small(w: Writer, bits: np.ndarray):
    """metagraph bit_vector_small/smart (bit_vector_adaptive): tag 0 (RRR)
    + the rrr vector (ref bit_vector_adaptive.hpp:48-56)."""
    w.be64(0)
    write_rrr_vector(w, bits)


# --------------------------------------------------------------- wt_huff
class _HuffNode:
    __slots__ = ("freq", "sym", "left", "right", "idx", "parent", "bv_pos",
                 "bv_pos_rank")

    def __init__(self, freq, sym=None, left=None, right=None):
        self.freq = freq
        self.sym = sym
        self.left = left
        self.right = right
        self.idx = 0xFFFF
        self.parent = 0xFFFF
        self.bv_pos = 0
        self.bv_pos_rank = 0


def write_wt_huff(w: Writer, symbols: np.ndarray):
    """sdsl::wt_huff<rrr_vector<63>> with a deterministic Huffman tree.

    The loader uses the *stored* tree/paths (wt_pc layout per
    refformat.read_wt_huff), so any self-consistent prefix tree round-trips;
    ties are broken by smallest symbol for determinism."""
    symbols = np.asarray(symbols, dtype=np.int64)
    m_size = len(symbols)
    syms, counts = np.unique(symbols, return_counts=True)
    sigma = len(syms)
    assert sigma >= 1 and (syms < 256).all()

    import heapq
    heap = [(int(c), int(s), _HuffNode(int(c), sym=int(s)))
            for s, c in zip(syms, counts)]
    heapq.heapify(heap)
    serial = 256
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (f1 + f2, serial, _HuffNode(f1 + f2, left=n1,
                                                         right=n2)))
        serial += 1
    root = heap[0][2]

    # BFS ordering: root = node 0 (wt_pc convention), streams laid out in
    # BFS order so bv_pos is monotone
    order: List[_HuffNode] = []
    queue = [root]
    while queue:
        node = queue.pop(0)
        node.idx = len(order)
        order.append(node)
        if node.left is not None:
            queue.append(node.left)
            queue.append(node.right)
    for node in order:
        if node.left is not None:
            node.left.parent = node.idx
            node.right.parent = node.idx

    # paths: len<<56 | bits (LSB-first, bit 1 -> right child)
    path = np.zeros(256, dtype=np.uint64)
    c_to_leaf = np.full(256, 0xFFFF, dtype=np.uint16)

    def assign(node, bits, depth):
        if node.sym is not None:
            c_to_leaf[node.sym] = node.idx
            path[node.sym] = (np.uint64(depth) << np.uint64(56)) \
                | np.uint64(bits)
            return
        assign(node.left, bits, depth + 1)
        assign(node.right, bits | (1 << depth), depth + 1)

    if root.sym is not None:                       # degenerate single-symbol
        c_to_leaf[root.sym] = 0
        path[root.sym] = 0
    else:
        assign(root, 0, 0)

    # route symbols to build each internal node's bit stream (BFS order)
    streams: Dict[int, np.ndarray] = {}
    idx_routes: Dict[int, np.ndarray] = {0: symbols}
    bv_parts = []
    bv_pos = 0
    ones_before = 0
    for node in order:
        if node.left is None:
            node.bv_pos = bv_pos
            node.bv_pos_rank = ones_before
            continue
        routed = idx_routes.pop(node.idx)
        depth_bit = np.zeros(len(routed), dtype=bool)
        # bit = next path bit of each symbol at this node's depth; compute
        # by membership in the right subtree
        right_syms = _subtree_syms(node.right)
        depth_bit = np.isin(routed, right_syms)
        node.bv_pos = bv_pos
        node.bv_pos_rank = ones_before
        bv_parts.append(depth_bit)
        bv_pos += len(depth_bit)
        ones_before += int(depth_bit.sum())
        idx_routes[node.left.idx] = routed[~depth_bit]
        idx_routes[node.right.idx] = routed[depth_bit]
    bv = np.concatenate(bv_parts) if bv_parts else np.zeros(0, dtype=bool)

    w.le64(m_size)
    w.le64(sigma)
    write_rrr_vector(w, bv)
    w.le64(len(order))
    for node in order:
        w.le64(node.bv_pos)
        w.le64(node.bv_pos_rank)
        w.u16(node.parent if node.parent != 0xFFFF else 0xFFFF)
        if node.left is not None:
            w.u16(node.left.idx)
            w.u16(node.right.idx)
        else:
            w.u16(0xFFFF)
            w.u16(0xFFFF)
    w.raw(c_to_leaf.tobytes())
    w.raw(path.astype("<u8").tobytes())


def _subtree_syms(node) -> np.ndarray:
    out = []
    stack = [node]
    while stack:
        n = stack.pop()
        if n.sym is not None:
            out.append(n.sym)
        else:
            stack.extend([n.left, n.right])
    return np.array(out, dtype=np.int64)


# ------------------------------------------------------------- label encoder
def write_label_encoder(w: Writer, labels: List[str]):
    """Legacy LabelEncoder layout (ref annotation.cpp:46-80 backward-compat
    branch): string-map keys + value int_vector + decode string vector."""
    w.be64(len(labels))
    for i, lab in enumerate(labels):
        b = lab.encode()
        w.utf8_len(len(b))
        w.raw(b)
    width = max(int(max(len(labels) - 1, 1)).bit_length(), 1)
    write_int_vector(w, np.arange(len(labels), dtype=np.int64), width)
    w.be64(len(labels))
    for lab in labels:
        b = lab.encode()
        w.utf8_len(len(b))
        w.raw(b)


# ------------------------------------------------------------------ toplevel
def save_reference_boss(graph, path: str):
    """Write a `.dbg` the reference can load (state SMALL), plus the
    `.dbg.edgemask` dummy-edge mask sidecar
    (ref dbg_succinct.cpp:787-833, boss.cpp:262-340)."""
    boss = graph.boss
    w = Writer()
    w.be64(len(boss.F))                            # serialize_number_vector_raw
    for v in boss.F:
        w.be64(int(v))
    w.be64(boss.k)                                 # BOSS k (node length)
    w.be64(1)                                      # state SMALL
    write_wt_huff(w, boss.W.astype(np.int64))
    logsigma = max(int(2 * boss.alph_size - 1).bit_length(), 1)
    w.be64(logsigma)
    write_bit_vector_small(w, boss.last.astype(bool))
    mode = {"basic": 0, "canonical": 1, "primary": 2}.get(
        getattr(graph, "mode", "basic"), 0)
    w.be64(mode)
    # suffix-range index: empty (loader rebuilds nothing; load_suffix_ranges
    # accepts length 0 + empty bit_vector, boss.cpp:402-430)
    w.be64(0)
    ww = Writer()
    write_bit_vector(ww, np.zeros(0, dtype=bool))
    w.raw(bytes(ww.buf))
    out = path if path.endswith(".dbg") else path + ".dbg"
    with open(out, "wb") as f:
        f.write(bytes(w.buf))
    # dummy-edge mask sidecar (state SMALL -> bit_vector_small)
    if boss.valid is not None:
        wm = Writer()
        write_bit_vector_small(wm, boss.valid.astype(bool))
        with open(out + ".edgemask", "wb") as f:
            f.write(bytes(wm.buf))
    return out


def save_reference_column_annotation(anno, path: str):
    """Write a `.column.annodbg` the reference can load
    (ref annotate_column_compressed.cpp serialize)."""
    anno.freeze()
    w = Writer()
    w.be64(anno.num_rows)
    labels = [anno.encoder.decode(i) for i in range(anno.num_labels)]
    write_label_encoder(w, labels)
    for c in range(anno.num_labels):
        col = np.zeros(anno.num_rows, dtype=bool)
        col[anno.column_rows(c)] = True
        write_bit_vector_small(w, col)
    out = path if path.endswith(".annodbg") else path + ".column.annodbg"
    with open(out, "wb") as f:
        f.write(bytes(w.buf))
    return out
