"""Full device (TPU) batch query pipeline.

One jitted step covers the per-batch hot path of `metagraph query`:
window packing -> hash-index lookup -> annotation row gather -> per-sequence
label counts.  Thresholding/top-k/formatting stay on host (tiny per-sequence
work).  Produces results identical to the host pipeline.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..annotation import ops as anno_ops
from ..annotation.annotated_dbg import get_min_count
from ..succinct import ops as graph_ops


@functools.partial(jax.jit, static_argnums=(4, 5))
def query_step(table: jnp.ndarray, bitmap: jnp.ndarray, queries: jnp.ndarray,
               seq_ids: jnp.ndarray, num_seqs: int, num_labels: int):
    """packed k-mer windows (Q, W) + seq ids -> (counts, present, nodes)."""
    nodes = graph_ops._hash_lookup(table, queries)
    counts, present = anno_ops.count_labels(bitmap, nodes, seq_ids,
                                            num_seqs, num_labels)
    return counts, present, nodes


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def query_epoch(table: jnp.ndarray, bitmap: jnp.ndarray, queries: jnp.ndarray,
                seq_ids: jnp.ndarray, num_seqs: int, num_labels: int,
                chunk: int = 1 << 17):
    """Whole-workload query in ONE dispatch: lax.scan over fixed chunks keeps
    the bit-expansion intermediate bounded while XLA pipelines the chunks.

    The batch is padded internally to a chunk multiple with 0xFFFFFFFF
    sentinel keys (never a valid packed k-mer -> lookup miss) and seq_id 0,
    so misses contribute nothing to counts/present."""
    pad = (-queries.shape[0]) % chunk
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.full((pad, queries.shape[1]),
                               jnp.iinfo(jnp.uint32).max, queries.dtype)])
        seq_ids = jnp.concatenate(
            [seq_ids, jnp.zeros(pad, seq_ids.dtype)])
    n = queries.shape[0] // chunk
    qs = queries.reshape(n, chunk, queries.shape[1])
    ss = seq_ids.reshape(n, chunk)

    def body(acc, x):
        q, s = x
        nodes = graph_ops._hash_lookup(table, q)
        c, p = anno_ops.count_labels_matmul(bitmap, nodes, s, num_seqs,
                                            num_labels)
        return (acc[0] + c, acc[1] + p), None

    init = (jnp.zeros((num_seqs, num_labels), jnp.float32),
            jnp.zeros(num_seqs, jnp.float32))
    (counts, present), _ = jax.lax.scan(body, init, (qs, ss))
    return counts.astype(jnp.int32), present.astype(jnp.int32)



def _tile_label_counts_expand(bitmap, nodes_ct, num_labels, words_fn=None):
    """Round-3 counting body (int8 bit-expand + tile sum), kept for
    profiling comparison; production counting is the CSA popcount below
    (measured 120.6 -> 98.9 ms on the v5e count stage, identical output)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    hit = nodes_ct > 0
    if words_fn is None:
        rows = jnp.where(hit, nodes_ct - 1, 0)
        words = anno_ops.gather_anno_rows(bitmap, rows, num_labels) \
            * hit[..., None].astype(jnp.uint32)
    else:
        rows = jnp.where(hit, nodes_ct - 1, -1)
        words = words_fn(bitmap, rows.reshape(-1)).reshape(
            nodes_ct.shape[0], nodes_ct.shape[1], -1)
    Lw = words.shape[-1]
    bits = ((words[..., None] >> shifts) & 1).astype(jnp.int8)
    tc = bits.sum(axis=1, dtype=jnp.int32).reshape(
        nodes_ct.shape[0], Lw * 32)
    return tc[:, :num_labels], hit.sum(axis=1, dtype=jnp.int32)


def _csa_add(A, B):
    """Bit-sliced ripple add of two carry-save numbers (lists of uint32
    bit-planes, same length): returns len+1 planes.  ~5 VPU ops per plane —
    the classic vertical-counter popcount building block."""
    out = []
    carry = None
    for a, b in zip(A, B):
        if carry is None:
            out.append(a ^ b)
            carry = a & b
        else:
            axb = a ^ b
            out.append(axb ^ carry)
            carry = (a & b) | (carry & axb)
    out.append(carry)
    return out


def _tile_label_counts(bitmap, nodes_ct, num_labels, words_fn=None):
    """(C, T) node ids (0 = miss) -> ((C, L) int32 tile label counts,
    (C,) int32 tile hits).  The ONE counting body shared by every epoch
    variant, replacing the reference's per-sequence sum_rows
    (annotated_dbg.cpp:246-280).

    Counting is a carry-save-adder popcount over the tile: the (C, T, Lw)
    gathered words tree-reduce IN THE BIT DOMAIN (pairwise CSA combines,
    log2(T) levels, ~5 VPU ops per plane) down to ceil(log2(T))+1
    bit-planes, which expand to int32 only once per tile.  This avoids
    materializing the (C, T, L) int8 bit expansion the round-3 body used:
    measured on v5e, the count stage drops 120.6 -> 98.9 ms on the bench
    workload with bit-identical output.

    words_fn(anno_dev, rows) optionally replaces the dense bitmap gather
    with a compressed row-words source (BRWT descend / row-diff walk,
    annotation/device_matrix.py) — ``bitmap`` then carries the device
    annotation pytree instead of the raw array."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    hit = nodes_ct > 0
    if words_fn is None:
        rows = jnp.where(hit, nodes_ct - 1, 0)
        words = anno_ops.gather_anno_rows(bitmap, rows, num_labels) \
            * hit[..., None].astype(jnp.uint32)
    else:
        rows = jnp.where(hit, nodes_ct - 1, -1)
        words = words_fn(bitmap, rows.reshape(-1)).reshape(
            nodes_ct.shape[0], nodes_ct.shape[1], -1)
    C, T, Lw = words.shape
    num = [words]
    while num[0].shape[1] > 1:
        t = num[0].shape[1]
        if t % 2:
            num = [jnp.pad(p, ((0, 0), (0, 1), (0, 0))) for p in num]
            t += 1
        A = [p.reshape(C, t // 2, 2, Lw)[:, :, 0] for p in num]
        B = [p.reshape(C, t // 2, 2, Lw)[:, :, 1] for p in num]
        num = _csa_add(A, B)
    tc = jnp.zeros((C, Lw * 32), jnp.int32)
    for p, pl in enumerate(num):
        bits = ((pl[:, 0, :, None] >> shifts) & 1).astype(jnp.int32)
        tc = tc + (bits << p).reshape(C, Lw * 32)
    return tc[:, :num_labels], hit.sum(axis=1, dtype=jnp.int32)


def _fold_tiles(tc, th, tile_seq, num_seqs):
    """(Ntiles, L)/(Ntiles,) int32 tile sums -> per-sequence (S, L) counts
    + (S,) present via one f32 matmul (exact: per-cell sums < 2^24; callers
    enforce the sequence-length bound)."""
    tile_counts = tc.astype(jnp.float32)
    tile_hit = th.astype(jnp.float32)
    onehot = (tile_seq[:, None]
              == jnp.arange(num_seqs, dtype=tile_seq.dtype)[None, :]
              ).astype(jnp.float32)
    counts = jax.lax.dot_general(onehot, tile_counts,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    present = jnp.sum(onehot * tile_hit[:, None], axis=0)
    return counts.astype(jnp.int32), present.astype(jnp.int32)


def _pack_selection_mask(counts, present, dsel, selmin):
    """Fused threshold selection: pack (counts >= dsel & present >= selmin)
    into uint32 words (the host downloads S*L/32 bits)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    ok = present >= selmin
    sel = (counts >= dsel[:, None]) & ok[:, None]
    S, L = sel.shape
    padL = (-L) % 32
    if padL:
        sel = jnp.pad(sel, ((0, 0), (0, padL)))
    w = (sel.reshape(S, -1, 32).astype(jnp.uint32)
         << shifts[None, None, :])
    return w.sum(axis=2, dtype=jnp.uint32)


TILE = 256   # windows per tile in the tiled count layout


@functools.partial(jax.jit, static_argnums=(4, 5))
def query_epoch_tiled(table: jnp.ndarray, bitmap: jnp.ndarray,
                      queries: jnp.ndarray, tile_seq: jnp.ndarray,
                      num_seqs: int, num_labels: int):
    """Whole-workload annotated query with the tiled count layout.

    queries: (N, T, W) packed windows, each row one fixed-size tile of one
    sequence (sentinel-padded); tile_seq: (N,) owning sequence per tile.

    Counting per tile is a fused gather -> bit-expand -> axis-sum (pure
    VPU/HBM work, no O(S*Q*L) one-hot matmul); folding tiles into sequences
    is a tiny exact f32 matmul over (S, N) x (N, L).  Replaces the
    reference's per-sequence sum_rows loop (annotated_dbg.cpp:246-280) with
    two dense batched ops.
    """
    N, T, W = queries.shape
    C = max(1, (1 << 17) // T)           # tiles per scan chunk
    pad = (-N) % C
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.full((pad, T, W), jnp.iinfo(jnp.uint32).max,
                               queries.dtype)])
        tile_seq = jnp.concatenate([tile_seq, jnp.zeros(pad, tile_seq.dtype)])
    nc = queries.shape[0] // C
    qs = queries.reshape(nc, C, T, W)

    def body(carry, q):
        nodes = graph_ops._hash_lookup(table, q.reshape(C * T, W))
        nodes = nodes.reshape(C, T)
        tc, th = _tile_label_counts(bitmap, nodes, num_labels)
        return carry, (tc, th, nodes)
    _, (tc, th, nodes) = jax.lax.scan(body, 0, qs)
    counts, present = _fold_tiles(tc.reshape(nc * C, num_labels),
                                  th.reshape(nc * C), tile_seq, num_seqs)
    return counts, present, nodes.reshape(nc * C, T)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def query_epoch_codes(table: jnp.ndarray, bitmap: jnp.ndarray,
                      code_tiles: jnp.ndarray, tile_seq: jnp.ndarray,
                      num_seqs: int, num_labels: int, K: int):
    """Fully fused device query from RAW CODES: window packing + hash lookup
    + tiled label counting in one dispatch.

    code_tiles: (N, T + K - 1) uint8 — each row the code slice covering one
    tile of T windows (invalid code 5 pads tails -> those windows miss).
    Host->device traffic is ~1 byte/bp instead of ~16 bytes/window of packed
    keys — the transfer-optimal layout for the query hot path
    (ref query.cpp:1304 batched_query_fasta).
    """
    N, TK = code_tiles.shape
    T = TK - (K - 1)
    C = max(1, (1 << 17) // T)
    pad = (-N) % C
    if pad:
        code_tiles = jnp.concatenate(
            [code_tiles, jnp.full((pad, TK), 5, code_tiles.dtype)])
        tile_seq = jnp.concatenate([tile_seq, jnp.zeros(pad, tile_seq.dtype)])
    nc = code_tiles.shape[0] // C

    def body(carry, chunk):
        packed, valid = graph_ops.device_pack_windows(
            chunk.astype(jnp.int32), K)                  # (C, T, W), (C, T)
        W = packed.shape[-1]
        nodes = graph_ops._hash_lookup(table, packed.reshape(C * T, W))
        nodes = jnp.where(valid, nodes.reshape(C, T), 0)
        tc, th = _tile_label_counts(bitmap, nodes, num_labels)
        return carry, (tc, th, nodes)
    _, (tc, th, nodes) = jax.lax.scan(body, 0, code_tiles.reshape(nc, C, TK))
    counts, present = _fold_tiles(tc.reshape(nc * C, num_labels),
                                  th.reshape(nc * C), tile_seq, num_seqs)
    return counts, present, nodes.reshape(nc * C, T)


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10))
def query_epoch_codes2(table: jnp.ndarray, bitmap: jnp.ndarray,
                       packed2: jnp.ndarray, validb: jnp.ndarray,
                       tile_seq: jnp.ndarray, dsel: jnp.ndarray,
                       selmin: jnp.ndarray,
                       num_seqs: int, num_labels: int,
                       K: int, TK: int):
    """query_epoch_codes from 2-BIT PACKED code tiles (native tile_pack2
    layout): host->device traffic is 2.25 bits/bp instead of 8.

    packed2: (N, TKp/4) uint8 — 2-bit codes, position j at bits 2*(j%4) of
    byte j//4; validb: (N, ceil(TK/8)) uint8 — little-endian validity bits.
    Codes are reconstructed on device (valid ? 2bit+1 : 5) and fed through
    the same pack+lookup+count pipeline.

    Label SELECTION is fused into the same dispatch (one relay round trip):
    dsel/selmin are per-sequence int32 thresholds precomputed on host from
    num_kmers alone (float64 ceil semantics of get_min_count,
    annotated_dbg.py:26 — dsel = max(ceil(df*nk),1), selmin =
    max(dsel, max(ceil(pf*nk),1)); INT32_MAX disables a row).  The returned
    mask packs (counts >= dsel & present >= selmin) into uint32 words, so
    the host downloads S*L/32 bits; counts stay device-resident for modes
    that gather hit values."""
    N, PB = packed2.shape
    T = TK - (K - 1)
    C = max(1, (1 << 17) // T)
    pad = (-N) % C
    if pad:
        packed2 = jnp.concatenate(
            [packed2, jnp.zeros((pad, PB), packed2.dtype)])
        validb = jnp.concatenate(
            [validb, jnp.zeros((pad, validb.shape[1]), validb.dtype)])
        tile_seq = jnp.concatenate([tile_seq, jnp.zeros(pad, tile_seq.dtype)])
    nc = packed2.shape[0] // C
    sh2 = jnp.arange(0, 8, 2, dtype=jnp.uint8)       # 2-bit lane shifts
    sh1 = jnp.arange(8, dtype=jnp.uint8)             # valid-bit lane shifts

    def body(carry, x):
        p2, vb = x
        # unpack: (C, PB, 4) -> (C, TKp) codes in 0..3; (C, VB, 8) -> bits
        c4 = ((p2[..., None] >> sh2) & 3).reshape(C, -1)[:, :TK]
        v8 = ((vb[..., None] >> sh1) & 1).reshape(C, -1)[:, :TK]
        chunk = jnp.where(v8 == 1, c4.astype(jnp.int32) + 1, 5)
        packed, valid = graph_ops.device_pack_windows(chunk, K)
        W = packed.shape[-1]
        nodes = graph_ops._hash_lookup(table, packed.reshape(C * T, W))
        nodes = jnp.where(valid, nodes.reshape(C, T), 0)
        tc, th = _tile_label_counts(bitmap, nodes, num_labels)
        return carry, (tc, th, nodes)
    _, (tc, th, nodes) = jax.lax.scan(
        body, 0, (packed2.reshape(nc, C, PB),
                  validb.reshape(nc, C, validb.shape[1])))
    counts, present = _fold_tiles(tc.reshape(nc * C, num_labels),
                                  th.reshape(nc * C), tile_seq, num_seqs)
    # fused selection (select_mask_epoch inlined — saves a dispatch RTT)
    mask = _pack_selection_mask(counts, present, dsel, selmin)
    return mask, counts, present, nodes.reshape(nc * C, T)


def _wire_epoch_core(table4, bitmap, words, vwords, tile_seq, dsel, selmin,
                     num_seqs: int, num_labels: int, K: int, T: int,
                     canon: int = 0, canon_offset: int = 0, words_fn=None):
    """Traced body shared by query_epoch_wire (five device args) and
    query_epoch_wire_buf (one fused upload buffer).

    table4 is the SAME 4-bit nibble-key DeviceHashIndex the tiled path
    probes (33 MB, fast gather class): wire window keys funnel-shift out of
    the 2-bit stream and convert to nibble keys on the VPU
    (ops.keys2_to_keys4) right before the probe.  r4 used a separate
    2-bit-key table here; its 192 B bucket rows and overflow-doubled 50 MB
    directory gathered at ~60 M probes/s vs 105 M/s for the shared table.

    canon: 0 = plain lookup; 1 = canonical-mode graph (each window resolves
    to its canonical form's node: the rc key is a few VPU bit ops,
    ops.rc_keys2, and at most one strand can hit a canonical graph, so the
    canonical node is max(fwd, rc) — ref sequence_graph.hpp:49); 2 =
    CanonicalDBG over a primary graph (fwd hit wins, rc hits shift by
    canon_offset for the emitted node id while label counting uses the BASE
    row — ref canonical_dbg.hpp:38, annotated_dbg.hpp:50)."""
    N, NW = words.shape
    C = max(1, (1 << 17) // T)
    pad = (-N) % C
    if pad:
        words = jnp.concatenate([words, jnp.zeros((pad, NW), words.dtype)])
        vwords = jnp.concatenate(
            [vwords, jnp.zeros((pad, vwords.shape[1]), vwords.dtype)])
        tile_seq = jnp.concatenate([tile_seq, jnp.zeros(pad, tile_seq.dtype)])
    nc = words.shape[0] // C

    def body(carry, x):
        wd, vw = x
        keys = graph_ops.extract_windows2(wd, K, T)          # (C, T, 2)
        valid = graph_ops.window_valid2(vw, K, T)            # (C, T)
        k4 = lambda k2: graph_ops.keys2_to_keys4(k2, K)
        nodes_f = graph_ops._hash_lookup(
            table4, k4(keys.reshape(C * T, 2))).reshape(C, T)
        if canon == 0:
            nodes = jnp.where(valid, nodes_f, 0)
            rows_ct = nodes
        else:
            rck = graph_ops.rc_keys2(keys.reshape(C * T, 2), K)
            if canon == 1:
                # canonical-mode graph stores BOTH strands; the host maps
                # each window to its canonical form (min strand in BOSS
                # priority order, pipeline._map_windows) — select that key
                # on device and do ONE lookup (bit-exact with host)
                kf = keys.reshape(C * T, 2)
                take_rc = graph_ops.keys2_greater(kf, rck, K)
                kc = jnp.where(take_rc[:, None], rck, kf)
                nodes = jnp.where(
                    valid,
                    graph_ops._hash_lookup(table4, k4(kc)).reshape(C, T), 0)
                rows_ct = nodes
            else:
                nodes_r = graph_ops._hash_lookup(
                    table4, k4(rck)).reshape(C, T)
                rows_ct = jnp.where(valid,
                                    jnp.where(nodes_f > 0, nodes_f, nodes_r),
                                    0)
                nodes = jnp.where(
                    valid,
                    jnp.where(nodes_f > 0, nodes_f,
                              jnp.where(nodes_r > 0,
                                        nodes_r + np.int32(canon_offset), 0)),
                    0)
        tc, th = _tile_label_counts(bitmap, rows_ct, num_labels, words_fn)
        return carry, (tc, th, nodes)
    _, (tc, th, nodes) = jax.lax.scan(
        body, 0, (words.reshape(nc, C, NW),
                  vwords.reshape(nc, C, vwords.shape[1])))
    counts, present = _fold_tiles(tc.reshape(nc * C, num_labels),
                                  th.reshape(nc * C), tile_seq, num_seqs)
    mask = _pack_selection_mask(counts, present, dsel, selmin)
    return mask, counts, present, nodes.reshape(nc * C, T)


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12, 13))
def query_epoch_wire(table4: jnp.ndarray, bitmap: jnp.ndarray,
                     words: jnp.ndarray, vwords: jnp.ndarray,
                     tile_seq: jnp.ndarray, dsel: jnp.ndarray,
                     selmin: jnp.ndarray,
                     num_seqs: int, num_labels: int, K: int, T: int,
                     canon: int = 0, canon_offset: int = 0, words_fn=None):
    """query_epoch_codes2 with hash keys taken DIRECTLY from the 2-bit wire
    words (DNA, K <= 31): window keys are funnel shifts of the uploaded
    stream (ops.extract_windows2) and validity is a log2(K)-step sliding AND
    of the valid bitstream (ops.window_valid2) — no per-char unpack, no
    nibble repack.  ~25% less device work per window than the codes2 path.

    words: (N, NW) uint32 — tile_pack2's packed2 bytes padded to
    max(ceil(PB/4), T/16 + 2) words and viewed little-endian; vwords:
    (N, NV) uint32 — validb likewise.  table2 is a DeviceHashIndex built
    over pack_kmers2 keys (W = 2).  Same fused selection/return contract as
    query_epoch_codes2."""
    return _wire_epoch_core(table4, bitmap, words, vwords, tile_seq, dsel,
                            selmin, num_seqs, num_labels, K, T, canon,
                            canon_offset, words_fn)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
def query_epoch_wire_buf(table4: jnp.ndarray, bitmap: jnp.ndarray,
                         buf: jnp.ndarray, N: int, NW: int, NV: int,
                         num_seqs: int, num_labels: int, K: int, T: int,
                         canon: int = 0, canon_offset: int = 0,
                         words_fn=None):
    """query_epoch_wire over ONE fused uint32 upload buffer laid out as
    [words (N*NW) | vwords (N*NV) | tile_seq (N) | dsel (num_seqs) |
    selmin (num_seqs)] (int32 fields bitcast).  Per-transfer dispatch
    latency on the host<->device link dominates at production batch sizes
    (~25 ms/transfer on the relay), so collapsing five uploads into one
    saves ~100 ms per sub-batch; the device-side slicing is free (fused
    into the same program)."""
    o = 0
    words = buf[o:o + N * NW].reshape(N, NW)
    o += N * NW
    vwords = buf[o:o + N * NV].reshape(N, NV)
    o += N * NV
    bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    tile_seq = bc(buf[o:o + N])
    o += N
    dsel = bc(buf[o:o + num_seqs])
    o += num_seqs
    selmin = bc(buf[o:o + num_seqs])
    return _wire_epoch_core(table4, bitmap, words, vwords, tile_seq, dsel,
                            selmin, num_seqs, num_labels, K, T, canon,
                            canon_offset, words_fn)


def wire_epoch_buffer(words: np.ndarray, vwords: np.ndarray,
                      tile_seq: np.ndarray, dsel: np.ndarray,
                      selmin: np.ndarray) -> np.ndarray:
    """Host-side packing of query_epoch_wire_buf's fused upload buffer."""
    # the .view(uint32) bitcasts require 4-byte elements — a wider dtype
    # would double the element count and shift every later field
    for a in (tile_seq, dsel, selmin):
        assert a.dtype.itemsize == 4, a.dtype
    return np.concatenate([
        words.reshape(-1), vwords.reshape(-1),
        np.ascontiguousarray(tile_seq).view(np.uint32),
        np.ascontiguousarray(dsel).view(np.uint32),
        np.ascontiguousarray(selmin).view(np.uint32)])


def wire_words_layout(packed2: np.ndarray, validb: np.ndarray, K: int,
                      T: int, npad: int):
    """tile_pack2 byte tiles -> zero-row-padded uint32 word views for
    query_epoch_wire: ((npad, NW) words, (npad, NV) vwords)."""
    n, PB = packed2.shape
    NW = max(-(-PB // 4), -(-T // 16) + 2)
    NV = -(-validb.shape[1] // 4)
    wb = np.zeros((npad, NW * 4), np.uint8)
    wb[:n, :PB] = packed2
    vb = np.zeros((npad, NV * 4), np.uint8)
    vb[:n, :validb.shape[1]] = validb
    return wb.view(np.uint32), vb.view(np.uint32)


def pad_tile_rows(n: int, C: int, lo: int = 4) -> int:
    """Geometric tile-row padding: nc = ceil(n/C) rounded up into a ~1.12x
    bucket series.  Caps jit recompiles (one per bucket) while wasting
    <=12.5% of the epoch on padding (r4 used a 1.25x series — its 25%
    worst-case pad was ~13% of the measured CLI device time)."""
    nc = max(-(-n // C), 1)
    b = lo
    while b < nc:
        b = max(b + 1, int(b * 9) // 8)
    return b * C


def tile_codes_layout(codes_list, K: int, tile: int = TILE):
    """Per-sequence code arrays -> (N, T+K-1) uint8 code tiles + per-tile
    sequence ids + per-seq window counts (for unpacking nodes later).

    Fully vectorized: one gather over the concatenated codes (positions past
    each sequence's end read as invalid code 5, identical to the per-tile
    slicing+padding it replaces)."""
    TK = tile + K - 1
    lens = np.array([len(c) for c in codes_list], dtype=np.int64)
    nwins_arr = np.maximum(lens - K + 1, 0)
    nwins = nwins_arr.tolist()
    ntiles = -(-nwins_arr // tile)
    N = int(ntiles.sum())
    if N == 0:
        return (np.zeros((0, TK), np.uint8), np.zeros(0, np.int32), nwins)
    cat = np.concatenate(codes_list)
    seq_start = np.concatenate([[0], np.cumsum(lens)])
    tile_seq = np.repeat(np.arange(len(codes_list), dtype=np.int32), ntiles)
    tile_base = np.concatenate([[0], np.cumsum(ntiles)])
    t_in_seq = np.arange(N, dtype=np.int64) - tile_base[tile_seq]
    starts = seq_start[tile_seq] + t_in_seq * tile
    idx = starts[:, None] + np.arange(TK, dtype=np.int64)
    in_seq = idx < seq_start[tile_seq + 1][:, None]
    out = np.where(in_seq, cat[np.minimum(idx, len(cat) - 1)],
                   np.uint8(5)).astype(np.uint8)
    return out, tile_seq, nwins


def untile_nodes(nodes_tiled: np.ndarray, tile_seq: np.ndarray,
                 nwins, tile: int = TILE):
    """(N, T) tiled node ids -> per-sequence flat node arrays."""
    out = []
    base = 0
    for i, nwin in enumerate(nwins):
        nt = -(-nwin // tile) if nwin else 0
        if nt:
            flat = nodes_tiled[base: base + nt].reshape(-1)[:nwin]
        else:
            flat = np.zeros(0, dtype=nodes_tiled.dtype)
        out.append(flat.astype(np.int64))
        base += nt
    return out


@functools.partial(jax.jit, static_argnums=(3, 4))
def count_epoch_tiled(bitmap: jnp.ndarray, nodes: jnp.ndarray,
                      tile_seq: jnp.ndarray, num_seqs: int, num_labels: int):
    """query_epoch_tiled without the hash lookup: tiled annotation-row ids
    (N, T) int32 (0 = miss) -> per-sequence label counts + presence.  Used
    when node mapping already happened (e.g. canonical-mode folding on host,
    ref annotated_dbg.hpp:50)."""
    N, T = nodes.shape
    C = max(1, (1 << 17) // T)
    pad = (-N) % C
    if pad:
        nodes = jnp.concatenate([nodes, jnp.zeros((pad, T), nodes.dtype)])
        tile_seq = jnp.concatenate([tile_seq, jnp.zeros(pad, tile_seq.dtype)])
    nc = nodes.shape[0] // C

    def body(carry, nn):
        tc, th = _tile_label_counts(bitmap, nn, num_labels)
        return carry, (tc, th)
    _, (tc, th) = jax.lax.scan(body, 0, nodes.reshape(nc, C, T))
    return _fold_tiles(tc.reshape(nc * C, num_labels),
                       th.reshape(nc * C), tile_seq, num_seqs)


@jax.jit
def select_mask_epoch(counts: jnp.ndarray, dmin: jnp.ndarray) -> jnp.ndarray:
    """Device-side label selection: pack (counts >= dmin_row) into uint32
    words so the host downloads S*L/32 bits instead of the S*L int32 counts
    matrix (the relay transfer is the CLI-path bottleneck).  dmin is the
    host-computed per-sequence discovery threshold (float64 ceil semantics
    of get_min_count stay on host — no f32 divergence on device)."""
    sel = counts >= dmin[:, None]
    S, L = sel.shape
    pad = (-L) % 32
    if pad:
        sel = jnp.pad(sel, ((0, 0), (0, pad)))
    w = (sel.reshape(S, -1, 32).astype(jnp.uint32)
         << jnp.arange(32, dtype=jnp.uint32)[None, None, :])
    return w.sum(axis=2, dtype=jnp.uint32)


@jax.jit
def gather_flat(counts: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """counts.reshape(-1)[idx] on device — downloads only the hit values."""
    return counts.reshape(-1)[idx]


def tile_layout(queries: np.ndarray, seq_ids: np.ndarray, num_seqs: int,
                tile: int = TILE, fill=None):
    """Pack flat (Q, W) windows (or (Q,) row ids) + sorted seq_ids into the
    (N, T, W) (or (N, T)) tiled layout (padded with sentinel misses) + the
    per-tile owning sequence (N,)."""
    nwin = np.bincount(seq_ids, minlength=num_seqs) if len(seq_ids) \
        else np.zeros(num_seqs, dtype=np.int64)
    ntiles = -(-nwin // tile)                 # ceil; 0 for empty seqs
    tile_base = np.concatenate([[0], np.cumsum(ntiles)])
    N = int(tile_base[-1])
    if queries.ndim == 1:
        shape = (N * tile,)
        fill = 0 if fill is None else fill
    else:
        shape = (N * tile, queries.shape[1])
        fill = np.iinfo(np.uint32).max if fill is None else fill
    out = np.full(shape, fill, dtype=queries.dtype)
    if len(seq_ids):
        seq_start = np.concatenate([[0], np.cumsum(nwin)])
        idx = np.arange(len(seq_ids)) - seq_start[seq_ids]
        flat = (tile_base[seq_ids] + idx // tile) * tile + idx % tile
        out[flat] = queries
    tile_seq = np.repeat(np.arange(num_seqs, dtype=np.int32),
                         ntiles.astype(np.int64))
    return out.reshape((N, tile) + shape[1:]), tile_seq


def _rowmin_packed(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rowwise lexicographic min of two (N, W) packed-word arrays."""
    from ..kmer import packing
    lt = packing.rows_lex_lt(a, b)
    return np.where(lt[:, None], a, b)


class DeviceQueryPipeline:
    def __init__(self, graph, annotation):
        boss = graph.boss
        valid_edges = np.flatnonzero(boss.valid)
        kchars = boss.get_edge_seq(valid_edges)
        from ..kmer.packing import bits_for_alphabet
        self._bits = bits_for_alphabet(graph.alphabet.sigma)
        # host copies kept for CPU-baseline / debug cross-checks
        self.index_keys = graph_ops.pack_kmers32(kchars, bits=self._bits)
        self.index_ids = valid_edges.astype(np.uint32)
        self.index = graph_ops.DeviceHashIndex.from_packed(
            self.index_keys, self.index_ids)
        self.annotation = anno_ops.DeviceAnnotation.from_column_annotation(
            annotation, graph.max_index())
        self.graph = graph
        self.anno = annotation
        self.k = graph.k

    def prepare_batch(self, seqs: List[bytes]):
        """host-side packing of a sequence batch -> device inputs.

        For canonical-mode graphs each window is canonicalized (packed min of
        fwd/rc), matching DBGSuccinct.map_to_nodes (ref sequence_graph.hpp:49).
        """
        k = self.k
        ex = self.graph.extractor
        if seqs and max(len(s) for s in seqs) >= (1 << 24):
            # per-(seq,label) counts are folded with exact-integer f32
            # matmuls (integral below 2^24); split longer sequences
            raise ValueError("sequences longer than 2^24 bp must be split "
                             "before the device count fold (f32 exactness "
                             "bound)")
        canonical = getattr(self.graph, "mode", None) == "canonical"
        comp = ex.extended_complement_table() if canonical else None
        from .. import native
        if native.get_lib() is not None and self._bits == 4:
            # the native packer emits 4-bit nibble words (DNA-family);
            # wide alphabets take the host path below with 8-bit words
            sep = np.array([ex.alphabet.sigma], dtype=np.uint8)
            codes_list = [ex.encode(s) for s in seqs]
            num_kmers = [max(len(c) - k + 1, 0) for c in codes_list]
            cat = np.concatenate(
                [np.concatenate([c, sep]) for c in codes_list]) \
                if codes_list else sep[:0]
            if len(cat) >= k:
                all_packed = native.pack_windows_boss(cat, k, bits=32)
                if canonical:
                    rc_packed = native.pack_windows_boss(
                        np.ascontiguousarray(comp[cat[::-1]]), k,
                        bits=32)[::-1]
                    all_packed = _rowmin_packed(all_packed, rc_packed)
                q_parts, sid_parts = [], []
                off = 0
                for i, c in enumerate(codes_list):
                    n = num_kmers[i]
                    if n:
                        q_parts.append(all_packed[off: off + n])
                        sid_parts.append(np.full(n, i, dtype=np.int32))
                    off += len(c) + 1
                if q_parts:
                    return (np.concatenate(q_parts),
                            np.concatenate(sid_parts), num_kmers)
            W = (k + 7) // 8
            return (np.zeros((0, W), dtype=np.uint32),
                    np.zeros(0, dtype=np.int32), num_kmers)
        per = 32 // self._bits
        q_parts, sid_parts = [], []
        num_kmers = []
        for i, s in enumerate(seqs):
            codes = ex.encode(s)
            n = max(len(codes) - k + 1, 0)
            num_kmers.append(n)
            if n == 0:
                continue
            wins = np.lib.stride_tricks.sliding_window_view(codes, k)
            bad = np.concatenate([[0], np.cumsum(codes >= ex.alphabet.sigma)])
            valid = (bad[k:] - bad[:-k]) == 0
            packed = np.zeros((n, graph_ops._ceil_div(k, per)),
                              dtype=np.uint32)
            if valid.any():
                pk = graph_ops.pack_kmers32(wins[valid], bits=self._bits)
                if canonical:
                    rc_wins = np.lib.stride_tricks.sliding_window_view(
                        comp[codes[::-1]], k)[::-1]
                    pk = _rowmin_packed(
                        pk, graph_ops.pack_kmers32(rc_wins[valid],
                                                   bits=self._bits))
                packed[valid] = pk
                packed[~valid] = np.iinfo(np.uint32).max
            else:
                packed[:] = np.iinfo(np.uint32).max
            q_parts.append(packed)
            sid_parts.append(np.full(n, i, dtype=np.int32))
        if q_parts:
            queries = np.concatenate(q_parts)
            seq_ids = np.concatenate(sid_parts)
        else:
            queries = np.zeros((0, graph_ops._ceil_div(k, per)),
                               dtype=np.uint32)
            seq_ids = np.zeros(0, dtype=np.int32)
        return queries, seq_ids, num_kmers

    def query_labels(self, seqs: List[bytes], mode: str = "labels",
                     num_top_labels: int = 2 ** 63,
                     discovery_fraction: float = 0.7,
                     presence_fraction: float = 0.0):
        """LABELS / MATCHES for a batch; payloads identical to the host path.

        Note: counts here are per *distinct row occurrence* as in the host
        path (duplicate k-mers count multiply — segment-sum does exactly
        that).
        """
        queries, seq_ids, num_kmers = self.prepare_batch(seqs)
        S = len(seqs)
        counts, present, _ = query_step(
            self.index.table, self.annotation.bitmap, jnp.asarray(queries),
            jnp.asarray(seq_ids), S, self.annotation.num_labels)
        counts = np.asarray(counts)
        present = np.asarray(present)
        enc = self.anno.encoder
        out = []
        for i in range(S):
            nk = num_kmers[i]
            if nk == 0:
                out.append([])
                continue
            min_count = get_min_count(discovery_fraction, presence_fraction,
                                      nk, int(present[i]))
            if present[i] < min_count:
                out.append([])
                continue
            sel = np.flatnonzero(counts[i] >= min_count)
            if mode == "labels":
                out.append([enc.decode(int(c)) for c in sel])
            else:
                pairs = sorted(((int(counts[i][c]), -int(c)) for c in sel),
                               reverse=True)
                pairs = pairs[: num_top_labels] if num_top_labels < len(pairs) \
                    else pairs
                out.append([(enc.decode(-negc), n) for n, negc in pairs])
        return out


@functools.partial(jax.jit, static_argnums=(5, 6))
def query_epoch_dedup(table: jnp.ndarray, bitmap: jnp.ndarray,
                      dkeys: jnp.ndarray, did_tiles: jnp.ndarray,
                      tile_seq: jnp.ndarray, num_seqs: int, num_labels: int):
    """Deduplicated device query epoch — the reference's query-graph move
    (ref query.cpp:893 construct_query_graph: each batch is deduped into a
    local index before touching the full graph) expressed on device.

    dkeys: (Dpad, W) packed DISTINCT window keys (row 0 = sentinel miss);
    did_tiles: (N, T) int32 per-window distinct ids (0 = invalid window);
    tile_seq: (N,) owning sequence per tile.

    Stage A probes the hash index and gathers annotation rows once per
    DISTINCT k-mer, building a compact (Dpad, Lw+1) [hit | words] table;
    stage B propagates per-window through one did-gather and counts with
    the shared CSA body.  Counts identical to query_epoch_tiled.

    Measured regimes (r5, scripts/exp_dedup_epoch.py): the propagation
    gather costs exactly one issue per occurrence, like the direct row
    gather — so this wins iff the compact table lands in the fast gather
    class (total/distinct high enough that Dpad*(Lw+1)*4 <= ~34 MB) or the
    probe table dominates; at D ~ R (batches covering the whole index) the
    per-occurrence epoch is the right choice and stays production."""
    Dpad = dkeys.shape[0]
    Lw = max((num_labels + 31) // 32, 1)
    nodes_d = graph_ops._hash_lookup(table, dkeys)          # (Dpad,)
    hit_d = (nodes_d > 0)
    rows_d = jnp.where(hit_d, nodes_d - 1, 0)
    words_d = anno_ops.gather_anno_rows(bitmap, rows_d, num_labels) \
        * hit_d[:, None].astype(jnp.uint32)
    wd = jnp.concatenate([hit_d[:, None].astype(jnp.uint32), words_d],
                         axis=1)                            # (Dpad, Lw+1)
    N, T = did_tiles.shape
    C = max(1, (1 << 17) // T)
    pad = (-N) % C
    if pad:
        did_tiles = jnp.concatenate(
            [did_tiles, jnp.zeros((pad, T), did_tiles.dtype)])
        tile_seq = jnp.concatenate([tile_seq, jnp.zeros(pad, tile_seq.dtype)])
    nc = did_tiles.shape[0] // C

    def body(carry, dd):
        w = wd[dd.reshape(C * T)].reshape(C, T, Lw + 1)
        words = w[:, :, 1:]
        hits = w[:, :, 0]
        # CSA popcount over the tile (the shared counting body)
        num = [words]
        while num[0].shape[1] > 1:
            t = num[0].shape[1]
            if t % 2:
                num = [jnp.pad(p, ((0, 0), (0, 1), (0, 0))) for p in num]
                t += 1
            A = [p.reshape(C, t // 2, 2, Lw)[:, :, 0] for p in num]
            B = [p.reshape(C, t // 2, 2, Lw)[:, :, 1] for p in num]
            num = _csa_add(A, B)
        shifts = jnp.arange(32, dtype=jnp.uint32)
        tc = jnp.zeros((C, Lw * 32), jnp.int32)
        for pl_i, pl in enumerate(num):
            bits = ((pl[:, 0, :, None] >> shifts) & 1).astype(jnp.int32)
            tc = tc + (bits << pl_i).reshape(C, Lw * 32)
        return carry, (tc[:, :num_labels],
                       hits.sum(axis=1, dtype=jnp.int32))
    _, (tc, th) = jax.lax.scan(body, 0, did_tiles.reshape(nc, C, T))
    return _fold_tiles(tc.reshape(nc * C, num_labels),
                       th.reshape(nc * C), tile_seq, num_seqs)


def dedup_batch(queries: np.ndarray, seq_ids: np.ndarray, num_seqs: int,
                tile: int = TILE):
    """Host-side batch dedup for query_epoch_dedup: packed windows ->
    (distinct keys (D+1, W) with sentinel row 0, did tiles, tile_seq,
    distinct count D)."""
    uniq, inv = np.unique(queries, axis=0, return_inverse=True)
    # drop the all-sentinel invalid key from the distinct set if present
    sent = np.iinfo(np.uint32).max
    valid_u = ~np.all(uniq == sent, axis=1)
    remap = np.zeros(len(uniq) + 1, np.int32)
    remap[1:][valid_u] = np.arange(1, int(valid_u.sum()) + 1)
    dids = remap[1:][inv]
    dkeys = np.concatenate(
        [np.full((1, queries.shape[1]), sent, np.uint32), uniq[valid_u]])
    did_tiles, tile_seq = tile_layout(dids.astype(np.int32), seq_ids,
                                      num_seqs, tile=tile, fill=0)
    return dkeys, did_tiles, tile_seq, int(valid_u.sum())
