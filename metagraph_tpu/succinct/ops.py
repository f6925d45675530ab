"""Device (TPU) query kernels for the succinct graph.

Two engines, both jit-compiled, batch-first, fixed-depth (no data-dependent
control flow — everything is lax.fori_loop over gathers, which XLA maps to
vectorized dynamic-slices on TPU):

* ``DeviceBOSS`` — the BOSS table with blocked rank/select directories
  (128-wide blocks = one VPU lane row).  Batched `index` runs the reference's
  range-tightening node search (ref boss.hpp:682-718) in lockstep over the
  whole query batch: k-1 iterations x (2 rank + 2 select).

* ``DeviceKmerIndex`` — a device-resident sorted k-mer dictionary: the valid
  BOSS edges in table order with their edge ids.  Lookup is a 32-step
  vectorized multiword binary search (log2 N gathers per query).  This is the
  throughput path for map_to_nodes-style batch queries, the analog of the
  reference's batch query graph (ref query.cpp:893 construct_query_graph).

Arrays use int32 indices (graphs up to 2^31 edges per shard; larger graphs
shard by k-mer range across devices — see metagraph_tpu.parallel).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..kmer import packing

BLOCK = 128


def _ceil_div(a, b):
    return -(-a // b)


def _ceil_log2(n: int) -> int:
    return max(1, int(np.ceil(np.log2(max(n, 2)))))


# --------------------------------------------------------------------------
# packing helpers (host-side, uint32 words for device)
# --------------------------------------------------------------------------

def pack_codes32(chars: np.ndarray, order: np.ndarray | None = None,
                 bits: int = 4) -> np.ndarray:
    """(N, K) uint8 codes -> (N, W32) uint32 words (device layout).

    ``bits`` per code: 4 (8 chars/word, DNA-family) or 8 (4 chars/word,
    Protein and other wide alphabets)."""
    chars = np.asarray(chars)
    if chars.ndim == 1:
        chars = chars[None, :]
    N, K = chars.shape
    if order is not None:
        chars = chars[:, order]
    per = 32 // bits
    W = _ceil_div(K, per)
    out = np.zeros((N, W), dtype=np.uint32)
    for j in range(K):
        w, slot = divmod(j, per)
        out[:, w] |= chars[:, j].astype(np.uint32) \
            << np.uint32(32 - bits - bits * slot)
    return out


def pack_kmers32(chars: np.ndarray, bits: int = 4) -> np.ndarray:
    """Pack edge k-mer code matrices in BOSS comparison order."""
    K = chars.shape[1]
    return pack_codes32(chars, packing.boss_priority_order(K), bits=bits)


def pack_kmers2(chars: np.ndarray) -> np.ndarray:
    """(N, K) DNA BOSS codes (1..4) -> (N, 2) uint32 2-bit wire-order keys.

    Bit 2*i of the key holds char i's 2-bit code (code-1), little-endian
    across the two words — the exact layout native ``tile_pack2`` puts on the
    wire, so device-side window-key extraction is a funnel shift of the
    uploaded bytes (``extract_windows2``), with no per-char unpack/repack.
    Only equality matters for the hash index, so wire order (not BOSS
    priority order) is fine.  Requires 2 <= K <= 31 so word 1 has at most 30
    significant bits and can never equal the EMPTY_WORD slot sentinel.
    """
    chars = np.asarray(chars)
    N, K = chars.shape
    assert 2 <= K <= 31, K
    out = np.zeros((N, 2), dtype=np.uint32)
    c = (chars.astype(np.uint32) - 1) & np.uint32(3)
    for i in range(K):
        out[:, i >> 4] |= c[:, i] << np.uint32(2 * (i & 15))
    return out


def _funnel_shift(words: jnp.ndarray, s: int) -> jnp.ndarray:
    """(..., NW) uint32 bitstream >> s across word boundaries (0 <= s <= 31).

    Word i of the result reads bits [32i+s, 32i+s+32) of the stream; bits
    past the last word read as 0."""
    if s == 0:
        return words
    nxt = jnp.concatenate(
        [words[..., 1:], jnp.zeros_like(words[..., :1])], axis=-1)
    # (nxt << 32-s) via two shifts: legal for s in 1..31 (single shifts < 32)
    return (words >> np.uint32(s)) | ((nxt << np.uint32(31 - s))
                                      << np.uint32(1))


def _rev2_word(w):
    """Reverse the order of the 16 2-bit groups within each uint32."""
    w = ((w & np.uint32(0xFFFF0000)) >> 16) \
        | ((w & np.uint32(0x0000FFFF)) << 16)
    w = ((w & np.uint32(0xFF00FF00)) >> 8) \
        | ((w & np.uint32(0x00FF00FF)) << 8)
    w = ((w & np.uint32(0xF0F0F0F0)) >> 4) \
        | ((w & np.uint32(0x0F0F0F0F)) << 4)
    w = ((w & np.uint32(0xCCCCCCCC)) >> 2) \
        | ((w & np.uint32(0x33333333)) << 2)
    return w


@functools.partial(jax.jit, static_argnums=(1,))
def rc_keys2(keys: jnp.ndarray, K: int) -> jnp.ndarray:
    """Reverse-complement of (..., 2) uint32 pack_kmers2 window keys.

    Pure VPU bit ops (complement = XOR since A/T and C/G pair across the
    2-bit code, group reversal = 4-step butterfly + word swap, then a
    funnel realignment by 64-2K bits) — the device-side equivalent of the
    host's comp[window][::-1] repack (kmer_transform.hpp:16 semantics).
    2 <= K <= 31 (the pack_kmers2 contract)."""
    lo = ~keys[..., 0]
    hi = ~keys[..., 1]
    rlo = _rev2_word(hi)          # 64-bit 2-bit-group reversal + word swap
    rhi = _rev2_word(lo)
    s = 64 - 2 * K
    if s >= 32:
        out_lo = rhi if s == 32 else (rhi >> np.uint32(s - 32))
        out_hi = jnp.zeros_like(rhi)
    else:
        out_lo = (rlo >> np.uint32(s)) | (rhi << np.uint32(32 - s))
        out_hi = rhi >> np.uint32(s)
    mask_lo = np.uint32(0xFFFFFFFF) if K >= 16 \
        else np.uint32((1 << (2 * K)) - 1)
    mask_hi = np.uint32((1 << max(2 * K - 32, 0)) - 1)
    return jnp.stack([out_lo & mask_lo, out_hi & mask_hi], axis=-1)


def boss_rot2(keys: jnp.ndarray, K: int):
    """(..., 2) uint32 wire keys -> (lo, hi) BOSS-priority-order surrogates.

    boss_priority_order (packing.py:27) compares chars K-2, K-3, .., 0,
    then K-1 last.  On the wire key (char i at bits 2i; integer comparison
    weighs char K-1 most) that order is EXACTLY a 2-bit rotate-left within
    the 2K-bit key: char j moves to group j+1 (mod K), putting char K-2 in
    the top group and char K-1 in the bottom one.  Comparing the rotated
    keys as (hi, lo) pairs therefore reproduces the host's packed-row
    canonical-strand choice (kmer/extractor._rows_greater) bit-for-bit."""
    lo = keys[..., 0]
    hi = keys[..., 1]
    top2 = (hi >> np.uint32(2 * K - 34)) & np.uint32(3) if 2 * K - 2 >= 32 \
        else (lo >> np.uint32(2 * K - 2)) & np.uint32(3)
    mask_lo = np.uint32(0xFFFFFFFF) if K >= 16 \
        else np.uint32((1 << (2 * K)) - 1)
    mask_hi = np.uint32((1 << max(2 * K - 32, 0)) - 1)
    rlo = ((lo << np.uint32(2)) | top2) & mask_lo
    rhi = ((hi << np.uint32(2)) | (lo >> np.uint32(30))) & mask_hi
    return rlo, rhi


def keys2_greater(a: jnp.ndarray, b: jnp.ndarray, K: int) -> jnp.ndarray:
    """a > b in BOSS priority order, for (..., 2) uint32 wire keys."""
    alo, ahi = boss_rot2(a, K)
    blo, bhi = boss_rot2(b, K)
    return (ahi > bhi) | ((ahi == bhi) & (alo > blo))


@functools.partial(jax.jit, static_argnums=(1, 2))
def extract_windows2(words: jnp.ndarray, K: int, T: int) -> jnp.ndarray:
    """(C, NW) uint32 2-bit code stream -> (C, T, 2) uint32 window keys.

    Window j's key is bits [2j, 2j+2K) of the stream (pack_kmers2 layout).
    Needs NW >= ceil(T/16) + 2 words (callers pad).  Pure VPU shifts — the
    device-side replacement for unpack + device_pack_windows on the 2-bit
    wire format."""
    C, NW = words.shape
    G = _ceil_div(T, 16)
    assert NW >= G + 2, (NW, G)
    sh = jnp.arange(16, dtype=jnp.uint32) * 2          # r = j & 15 shifts
    hi_bits = 2 * K - 32
    mask_lo = np.uint32(0xFFFFFFFF) if K >= 16 \
        else np.uint32((1 << (2 * K)) - 1)
    mask_hi = np.uint32((1 << max(hi_bits, 0)) - 1)
    los, his = [], []
    for g in range(G):
        w0 = words[:, g, None]
        w1 = words[:, g + 1, None]
        w2 = words[:, g + 2, None]
        lo = ((w0 >> sh) | ((w1 << (np.uint32(31) - sh)) << np.uint32(1))) \
            & mask_lo
        if hi_bits > 0:
            hi = ((w1 >> sh) | ((w2 << (np.uint32(31) - sh)) << np.uint32(1))) \
                & mask_hi
        else:
            hi = jnp.zeros_like(lo)
        los.append(lo)
        his.append(hi)
    lo = jnp.concatenate(los, axis=1)[:, :T]
    hi = jnp.concatenate(his, axis=1)[:, :T]
    return jnp.stack([lo, hi], axis=-1)


def keys2_to_keys4(keys2: jnp.ndarray, K: int) -> jnp.ndarray:
    """(..., 2) uint32 pack_kmers2 wire keys -> (..., ceil(K/8)) uint32
    4-bit nibble keys in BOSS priority order (the pack_kmers32 layout).

    Lets the wire epochs probe the SAME 33 MB 4-bit hash table as the tiled
    path instead of a separate 2-bit-key table: the 2-bit table's bucket
    rows are 192 B (pathological XLA gather width) and its directory
    doubled on overflow to ~50 MB, past the scoped-VMEM staging budget —
    measured 60 M probes/s vs 105 M/s on the shared 4-bit table (r5).
    Pure VPU shifts, ~4 ops per char."""
    lo = keys2[..., 0]
    hi = keys2[..., 1]

    def char(j):           # wire char j (0-based), back to 1..4 BOSS codes
        w = lo if j < 16 else hi
        return ((w >> np.uint32((2 * j) & 31)) & np.uint32(3)) + np.uint32(1)

    W = _ceil_div(K, 8)
    words = []
    for w in range(W):
        acc = jnp.zeros_like(lo)
        for slot in range(8):
            p = w * 8 + slot                    # priority index
            if p >= K:
                break
            j = (K - 2 - p) if p < K - 1 else (K - 1)
            acc = acc | (char(j) << np.uint32(28 - 4 * slot))
        words.append(acc)
    return jnp.stack(words, axis=-1)


@functools.partial(jax.jit, static_argnums=(1, 2))
def window_valid2(vwords: jnp.ndarray, K: int, T: int) -> jnp.ndarray:
    """(C, NV) uint32 per-char valid bits -> (C, T) bool window validity.

    A window is valid iff all K of its chars are valid: a sliding AND of K
    consecutive bits, computed in O(log K) funnel-shift steps (T must be a
    multiple of 32)."""
    assert T % 32 == 0, T
    pows = {1: vwords}
    p, ln = vwords, 1
    while ln * 2 <= K:
        p = p & _funnel_shift(p, ln)
        ln *= 2
        pows[ln] = p
    acc, off, rem = p, ln, K - ln
    while rem:
        b = 1 << (rem.bit_length() - 1)
        acc = acc & _funnel_shift(pows[b], off)
        off += b
        rem -= b
    bits = ((acc[:, : T // 32, None]
             >> jnp.arange(32, dtype=jnp.uint32)) & 1)
    return bits.reshape(acc.shape[0], T).astype(bool)


# --------------------------------------------------------------------------
# DeviceKmerIndex: sorted multiword dictionary
# --------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceKmerIndex:
    """Sorted packed k-mers + payload ids, with vectorized binary search."""

    keys: jnp.ndarray      # (N, W32) uint32, sorted lexicographically
    ids: jnp.ndarray       # (N,) int32 payload (BOSS edge index)

    def tree_flatten(self):
        return (self.keys, self.ids), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_host(cls, kmers_chars: np.ndarray, ids: np.ndarray) -> "DeviceKmerIndex":
        keys = pack_kmers32(kmers_chars)
        # keys from construction are already sorted in BOSS order, but sort
        # defensively (stable, cheap on host)
        order = np.lexsort(tuple(keys[:, w] for w in range(keys.shape[1] - 1, -1, -1)))
        return cls(jnp.asarray(keys[order]), jnp.asarray(ids[order], dtype=jnp.int32))

    @property
    def n(self) -> int:
        return self.keys.shape[0]

    def lookup(self, queries: jnp.ndarray) -> jnp.ndarray:
        """(Q, W32) packed queries -> (Q,) int32 ids; 0 where absent."""
        return _kmer_lookup(self.keys, self.ids, queries)


def _rows_less(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic a < b (shared loop in kmer/packing.py, jnp mode)."""
    return packing.rows_lex_lt(a, b, xp=jnp)


@jax.jit
def _kmer_lookup(keys: jnp.ndarray, ids: jnp.ndarray, queries: jnp.ndarray):
    N = keys.shape[0]
    Q = queries.shape[0]
    steps = _ceil_log2(N + 1)

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) >> 1
        kmid = keys[jnp.clip(mid, 0, N - 1)]            # (Q, W) gather
        less = _rows_less(kmid, queries)
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
        return lo, hi

    lo = jnp.zeros(Q, dtype=jnp.int32)
    hi = jnp.full(Q, N, dtype=jnp.int32)
    lo, hi = lax.fori_loop(0, steps, body, (lo, hi))
    pos = jnp.clip(lo, 0, N - 1)
    found = (lo < N) & jnp.all(keys[pos] == queries, axis=-1)
    return jnp.where(found, ids[pos], 0)


# --------------------------------------------------------------------------
# DeviceHashIndex: bucketized 2-choice hash table — 1-2 wide gathers per query
# --------------------------------------------------------------------------

BUCKET = 16  # slots per bucket; bucket row = BUCKET * (W + 1) uint32, aligned

_HASH_C = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F,
           0x165667B1, 0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35)


def _hash_words(words, n_buckets: int, salt: int):
    """32-bit multiplicative hash of multiword keys -> bucket id."""
    h = np.uint32(salt) if isinstance(words, np.ndarray) else jnp.uint32(salt)
    W = words.shape[-1]
    for w in range(W):
        c = _HASH_C[w % len(_HASH_C)]
        x = words[..., w]
        if isinstance(words, np.ndarray):
            h = (np.uint32(h) ^ (x * np.uint32(c))).astype(np.uint32)
            h = (h * np.uint32(0x9E3779B1)).astype(np.uint32)
            h = h ^ (h >> np.uint32(15))
        else:
            h = (h ^ (x * jnp.uint32(c))) * jnp.uint32(0x9E3779B1)
            h = h ^ (h >> 15)
    return (h % np.uint32(n_buckets)).astype(
        np.int32 if isinstance(words, np.ndarray) else jnp.int32)


EMPTY_WORD = np.uint32(0xFFFFFFFF)


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceHashIndex:
    """Single-probe bucketized hash table over packed k-mers.

    Each bucket is one contiguous row of BUCKET slots x (W key words + id),
    so a lookup is exactly ONE wide row-gather + VPU compares.  Measured on
    v5e, XLA's gather cost scales with the gather COUNT, not row bytes
    (BUCKET=2 rows were ~2x slower than BUCKET=8 for the same workload), so
    one 16-slot probe beats two 8-slot 2-choice probes ~2x.  The TPU-native
    analog of DBGHashOrdered (ref dbg_hash_ordered.hpp:12).
    """

    table: jnp.ndarray     # (n_buckets, BUCKET*(W+1)) uint32 — flat bucket rows
    W: int                 # key words

    def tree_flatten(self):
        return (self.table,), (self.W,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @classmethod
    def from_packed(cls, keys: np.ndarray, ids: np.ndarray,
                    load: float = 0.45) -> "DeviceHashIndex":
        N, W = keys.shape
        ids = np.asarray(ids, dtype=np.uint32)
        n_buckets = max(2, int(2 ** np.ceil(np.log2(max(N, 1) / (BUCKET * load)))))
        while True:
            table = cls._build(keys, ids, n_buckets)
            if table is not None:
                flat = table.reshape(n_buckets, BUCKET * (W + 1))
                return cls(jnp.asarray(flat), W)
            n_buckets *= 2

    @staticmethod
    def _build(keys, ids, n_buckets):
        N, W = keys.shape
        table = np.full((n_buckets, BUCKET, W + 1), EMPTY_WORD, dtype=np.uint32)
        fill = np.zeros(n_buckets, dtype=np.int32)
        remaining = np.arange(N)
        h = _hash_words(keys, n_buckets, 1)
        # stable first-come placement per bucket, vectorized in rounds
        for _ in range(BUCKET):
            if remaining.size == 0:
                break
            hh = h[remaining]
            order = np.argsort(hh, kind="stable")
            s = hh[order]
            first = np.ones(len(s), dtype=bool)
            first[1:] = s[1:] != s[:-1]
            cand = order[first]
            b = hh[cand]
            ok = fill[b] < BUCKET
            cand, b = cand[ok], b[ok]
            table[b, fill[b], :W] = keys[remaining[cand]]
            table[b, fill[b], W] = ids[remaining[cand]]
            fill[b] += 1
            placed = np.zeros(len(remaining), dtype=bool)
            placed[cand] = True
            remaining = remaining[~placed]
        if remaining.size:
            # a bucket overflowed BUCKET slots: grow the directory and retry
            return None
        return table

    def lookup(self, queries: jnp.ndarray) -> jnp.ndarray:
        """(Q, W) packed queries -> (Q,) int32 ids (0 = miss)."""
        return _hash_lookup(self.table, queries)


@functools.partial(jax.jit, static_argnums=(2,))
def _hash_lookup_flat(flat_table: jnp.ndarray, queries: jnp.ndarray, W: int):
    """flat_table: (n_buckets, BUCKET*(W+1)) — contiguous row per bucket;
    ONE row-gather per query (single-probe layout, see DeviceHashIndex)."""
    n_buckets = flat_table.shape[0]
    Q = queries.shape[0]
    b = _hash_words(queries, n_buckets, 1)
    rows = flat_table[b].reshape(Q, BUCKET, W + 1)         # one 2D row-gather
    eq = jnp.all(rows[:, :, :W] == queries[:, None, :], axis=-1)
    hit = jnp.any(eq, axis=-1)
    # ids of matching slot (exactly one can match): mask-select, no 2nd gather
    ids = jnp.max(jnp.where(eq, rows[:, :, W], 0), axis=-1).astype(jnp.int32)
    return jnp.where(hit, ids, 0)


def _hash_lookup(flat_table: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    W = flat_table.shape[1] // BUCKET - 1
    return _hash_lookup_flat(flat_table, queries, W)


# --------------------------------------------------------------------------
# device window packing (query pipeline: codes -> packed k-mer windows)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1,))
def device_pack_windows(codes: jnp.ndarray, K: int):
    """(B, L) int32 codes -> packed windows (B, L-K+1, W32) + valid mask.

    Packs every K-window of each row in BOSS priority order.  Invalid codes
    (>= 5 for DNA... any code >= 15 is masked) invalidate their windows.
    """
    B, L = codes.shape
    n_win = L - K + 1
    W = _ceil_div(K, 8)
    invalid = (codes >= 5).astype(jnp.int32)
    cum = jnp.cumsum(invalid, axis=1)
    cum = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), cum], axis=1)
    valid = (cum[:, K:] - cum[:, :-K]) == 0                      # (B, n_win)

    safe = jnp.where(codes >= 5, 0, codes).astype(jnp.uint32)
    words = []
    for w in range(W):
        acc = jnp.zeros((B, n_win), dtype=jnp.uint32)
        for slot in range(8):
            p = w * 8 + slot                 # priority index
            if p >= K:
                break
            off = (K - 2 - p) if p < K - 1 else (K - 1)
            acc = acc | (lax.dynamic_slice_in_dim(safe, off, n_win, axis=1)
                         << np.uint32(28 - 4 * slot))
        words.append(acc)
    packed = jnp.stack(words, axis=-1)                            # (B, n_win, W)
    return packed, valid


# --------------------------------------------------------------------------
# DeviceBOSS: blocked rank/select navigation
# --------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceBOSS:
    """BOSS table with 128-wide blocked rank/select directories on device."""

    W_blocks: jnp.ndarray     # (nb, 128) int8 — W padded with -1
    cum_W: jnp.ndarray        # (nb + 1, 2*alph) int32 counts before block
    last_blocks: jnp.ndarray  # (nb, 128) int8
    cum_last: jnp.ndarray     # (nb + 1,) int32
    F: jnp.ndarray            # (alph,) int32
    NF: jnp.ndarray           # (alph,) int32
    valid: jnp.ndarray        # (M,) int8
    M: int                    # table size (num_edges + 1)
    alph: int
    k: int

    _static = ("M", "alph", "k")

    def tree_flatten(self):
        children = (self.W_blocks, self.cum_W, self.last_blocks, self.cum_last,
                    self.F, self.NF, self.valid)
        return children, (self.M, self.alph, self.k)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_host(cls, boss) -> "DeviceBOSS":
        M = len(boss.W)
        a = boss.alph_size
        nb = _ceil_div(M, BLOCK)
        Wp = np.full(nb * BLOCK, -1, dtype=np.int8)
        Wp[:M] = boss.W.astype(np.int8)
        lp = np.zeros(nb * BLOCK, dtype=np.int8)
        lp[:M] = boss.last.astype(np.int8)
        W_blocks = Wp.reshape(nb, BLOCK)
        last_blocks = lp.reshape(nb, BLOCK)
        cum_W = np.zeros((nb + 1, 2 * a), dtype=np.int32)
        for c in range(2 * a):
            per_block = (W_blocks == c).sum(axis=1)
            cum_W[1:, c] = np.cumsum(per_block)
        cum_last = np.zeros(nb + 1, dtype=np.int32)
        cum_last[1:] = np.cumsum(last_blocks.sum(axis=1))
        return cls(
            W_blocks=jnp.asarray(W_blocks), cum_W=jnp.asarray(cum_W),
            last_blocks=jnp.asarray(last_blocks), cum_last=jnp.asarray(cum_last),
            F=jnp.asarray(boss.F, dtype=jnp.int32),
            NF=jnp.asarray(boss.NF, dtype=jnp.int32),
            valid=jnp.asarray(boss.valid, dtype=jnp.int8),
            M=M, alph=a, k=boss.k)

    # -- rank -------------------------------------------------------------
    def rank_last(self, i):
        blk = i >> 7
        row = self.last_blocks[blk].astype(jnp.int32)              # (Q, 128)
        j = jax.lax.broadcasted_iota(jnp.int32, row.shape, row.ndim - 1)
        within = (i & 127)[..., None]
        cnt = jnp.sum(jnp.where(j <= within, row, 0), axis=-1)
        return self.cum_last[blk] + cnt

    def rank_W(self, i, c):
        """count of raw value c in W[1..i] (matches BOSS::rank_W)."""
        blk = i >> 7
        row = self.W_blocks[blk]
        j = jax.lax.broadcasted_iota(jnp.int32, row.shape, row.ndim - 1)
        within = (i & 127)[..., None]
        eq = (row == c[..., None].astype(jnp.int8)) & (j <= within)
        cnt = jnp.sum(eq.astype(jnp.int32), axis=-1)
        base = self.cum_W[blk, c]
        return base + cnt - (c == 0).astype(jnp.int32)

    # -- select -----------------------------------------------------------
    def _select_block(self, cum_col_gather, r):
        """binary search: first blk with cum[blk+1] >= r. cum gathers by fn."""
        nb = self.W_blocks.shape[0]
        steps = _ceil_log2(nb + 1)
        lo = jnp.zeros_like(r)
        hi = jnp.full_like(r, nb)

        def body(_, st):
            lo, hi = st
            mid = (lo + hi) >> 1
            ge = cum_col_gather(mid + 1) >= r
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid + 1)
            return lo, hi

        lo, hi = lax.fori_loop(0, steps, body, (lo, hi))
        return lo

    def select_last(self, r):
        """position of r-th set bit of last; 0 for r <= 0."""
        blk = self._select_block(lambda b: self.cum_last[b], r)
        row = self.last_blocks[
            jnp.clip(blk, 0, self.last_blocks.shape[0] - 1)].astype(jnp.int32)
        base = self.cum_last[blk]
        cs = jnp.cumsum(row, axis=-1)
        target = (r - base)[..., None]
        hit = (cs == target) & (row > 0)
        j = jnp.argmax(hit, axis=-1)
        pos = blk * BLOCK + j
        return jnp.where(r > 0, pos, 0).astype(jnp.int32)

    def select_W(self, c, r):
        """position of r-th occurrence of raw value c in W[1..] (sentinel-aware)."""
        r = r + (c == 0).astype(r.dtype)      # W[0] = 0 sentinel
        blk = self._select_block(lambda b: self.cum_W[b, c], r)
        row = self.W_blocks[jnp.clip(blk, 0, self.W_blocks.shape[0] - 1)]
        eq = row == c[..., None].astype(jnp.int8)
        cs = jnp.cumsum(eq.astype(jnp.int32), axis=-1)
        base = self.cum_W[blk, c]
        hit = (cs == (r - base)[..., None]) & eq
        j = jnp.argmax(hit, axis=-1)
        return (blk * BLOCK + j).astype(jnp.int32)

    # -- node search ------------------------------------------------------
    def index(self, nodes: jnp.ndarray) -> jnp.ndarray:
        """(Q, k) int32 node codes -> last-edge index per node (0 = absent)."""
        Q, k = nodes.shape
        M = self.M
        alive = jnp.all(nodes < self.alph, axis=1)
        s0 = jnp.where(alive, nodes[:, 0], 0)
        F_ext = jnp.concatenate(
            [self.F, jnp.array([M - 1], dtype=jnp.int32)])
        rl = jnp.minimum(self.F[s0] + 1, M).astype(jnp.int32)
        ru = F_ext[s0 + 1].astype(jnp.int32)
        alive = alive & (rl <= ru)

        def body(pos, st):
            rl, ru, alive = st
            s = jnp.where(alive, nodes.T[pos], 0)
            rk_rl = self.rank_W(jnp.maximum(rl - 1, 0), s) + 1
            rk_ru = self.rank_W(ru, s)
            ok = alive & (rk_rl <= rk_ru)
            nf = self.NF[s]
            new_rl = self.select_last(nf + rk_rl - 1) + 1
            new_ru = self.select_last(nf + rk_ru)
            rl = jnp.where(ok, new_rl, rl)
            ru = jnp.where(ok, new_ru, ru)
            return rl, ru, ok

        rl, ru, alive = lax.fori_loop(1, k, body, (rl, ru, alive))
        return jnp.where(alive, ru, 0)

    def pick_edge(self, edge, c):
        """edge with label c (or c+alph) out of node ending at `edge`; 0 if none."""
        r_last = self.rank_last(jnp.maximum(edge - 1, 0))
        begin = self.select_last(r_last) + 1
        res = jnp.zeros_like(edge)
        for base in (0, self.alph):
            cand = c + base
            lo = self.rank_W(jnp.maximum(begin - 1, 0), cand)
            hi = self.rank_W(edge, cand)
            found = hi > lo
            pos = self.select_W(cand, lo + 1)
            res = jnp.where(found & (res == 0), pos, res)
        return res

    def map_kmers(self, kmers: jnp.ndarray) -> jnp.ndarray:
        """(Q, k+1) int32 edge strings -> BOSS edge ids (0 = absent)."""
        node_edge = self.index(kmers[:, :-1])
        label = kmers[:, -1]
        picked = self.pick_edge(node_edge, label)
        ok = (node_edge > 0) & (label < self.alph) & (label > 0)
        return jnp.where(ok, picked, 0)
