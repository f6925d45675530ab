"""Mesh-sharded graph construction.

The reference shards construction by k-mer suffix: workers bucket k-mers
into per-suffix chunk files, sort each chunk, and concatenate
(ref boss_chunk_construct.cpp:1020-1120, cli/build.cpp:110-158).  The mesh
equivalent is a range partition of the packed k-mer key space:

  1. sample split boundaries on host (quantiles of a key sample)
  2. every device buckets its local slice by destination range
  3. one all_to_all exchanges the buckets over the ICI mesh axis
  4. each device sorts + dedupes its received range (lax.sort multiword)
  5. concatenating the shard outputs in axis order yields the globally
     sorted unique k-mer set — byte-identical to the single-device sort

Sentinel rows (all-0xFFFFFFFF) pad every fixed-size buffer; they route to
the last shard, sort last, and are dropped on host.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

SENTINEL = np.uint32(0xFFFFFFFF)


def sample_boundaries(keys: np.ndarray, m: int,
                      sample: int = 1 << 16) -> np.ndarray:
    """(m-1, W) split rows: quantiles of a sorted host sample."""
    from ..kmer import packing
    n = len(keys)
    if n == 0 or m <= 1:
        return np.zeros((max(m - 1, 0), keys.shape[1]), dtype=keys.dtype)
    idx = np.linspace(0, n - 1, min(sample, n)).astype(np.int64)
    smp = keys[idx]
    smp = smp[packing.lexsort_rows(smp)]
    cuts = np.linspace(0, len(smp) - 1, m + 1).astype(np.int64)[1:-1]
    return smp[cuts]


def _rows_greater_j(rows: jnp.ndarray, cut: jnp.ndarray) -> jnp.ndarray:
    """rows > cut lexicographically (shared loop in kmer/packing.py)."""
    from ..kmer import packing
    return packing.rows_lex_gt(rows, cut, xp=jnp)


_SORT_FN_CACHE = {}


def sharded_sort_unique_fn(mesh: Mesh, m: int, B: int, W: int):
    """Jitted sharded sort: (m*B, W) keys sharded over 'shard' ->
    per-shard sorted rows + uniqueness mask, range-exchanged via all_to_all.
    Cached per (mesh devices, m, B, W) — rebuilding the shard_map closure
    forces a full XLA recompile otherwise."""
    key = (tuple(d.id for d in mesh.devices.flat), m, B, W)
    cached = _SORT_FN_CACHE.get(key)
    if cached is not None:
        return cached

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P("shard", None), P(None, None)),
        out_specs=(P("shard", None), P("shard")), check_vma=False)
    def _step(local, boundaries):
        # destination shard per row: #boundaries the row exceeds
        dest = jnp.zeros(B, dtype=jnp.int32)
        for b in range(m - 1):
            dest = dest + _rows_greater_j(local, boundaries[b]).astype(
                jnp.int32)
        # group rows by destination: stable sort by dest
        order = jnp.argsort(dest, stable=True)
        rows_sorted = local[order]
        dest_sorted = dest[order]
        starts = jnp.searchsorted(dest_sorted,
                                  jnp.arange(m, dtype=dest.dtype))
        slot = jnp.arange(B, dtype=jnp.int32) - starts[dest_sorted]
        send = jnp.full((m, B, W), SENTINEL, dtype=local.dtype)
        send = send.at[dest_sorted, slot].set(rows_sorted)
        recv = lax.all_to_all(send, "shard", split_axis=0, concat_axis=0,
                              tiled=False)
        mine = recv.reshape(m * B, W)
        cols = tuple(mine[:, w] for w in range(W))
        s = jnp.stack(lax.sort(cols, num_keys=W), axis=1)
        prev = jnp.concatenate(
            [jnp.full((1, W), SENTINEL, s.dtype), s[:-1]], axis=0)
        new = jnp.any(s != prev, axis=1)
        new = new.at[0].set(True)
        return s, new

    fn = jax.jit(_step)
    _SORT_FN_CACHE[key] = fn
    return fn


def sharded_sort_unique(keys: np.ndarray, mesh: Mesh | None = None,
                        n_devices: int | None = None) -> np.ndarray:
    """Globally sorted unique packed rows via the mesh-sharded pipeline."""
    if mesh is None:
        devs = jax.devices()[: n_devices or len(jax.devices())]
        mesh = Mesh(np.array(devs), ("shard",))
    m = mesh.shape["shard"]
    N, W = keys.shape
    B = max(-(-N // m), 1)
    pad = m * B - N
    if pad:
        keys = np.concatenate(
            [keys, np.full((pad, W), SENTINEL, dtype=keys.dtype)])
    boundaries = sample_boundaries(keys[:N], m)
    if m == 1:
        boundaries = np.zeros((0, W), dtype=keys.dtype)
    keys_d = jax.device_put(keys, NamedSharding(mesh, P("shard", None)))
    b_d = jax.device_put(
        np.ascontiguousarray(boundaries.reshape(max(m - 1, 1), W)
                             if m > 1 else np.zeros((1, W), keys.dtype)),
        NamedSharding(mesh, P(None, None)))
    fn = sharded_sort_unique_fn(mesh, m, B, W)
    s, new = fn(keys_d, b_d)
    s = np.asarray(s)
    new = np.asarray(new)
    # shard outputs are disjoint sorted ranges; concatenation is sorted.
    # adjacent-duplicate masks are per-shard: a shard-leading row duplicating
    # the previous shard's last row is impossible (same key -> same shard)
    keep = new & ~np.all(s == SENTINEL, axis=1)
    return s[keep]


def sharded_build_kmers(sequences, k: int, mesh: Mesh | None = None,
                        mode: str = "basic", n_devices: int | None = None):
    """Sharded construction front half: extract windows, mesh-sort, return
    the sorted unique (N, K) code matrix (feeds build_boss_arrays; the BOSS
    arrays then equal the single-device build's)."""
    from ..kmer import packing
    shards, _ = _front_half_shards(sequences, k, mesh, n_devices, mode)
    uniq = np.concatenate([s for s in shards if len(s)]) \
        if any(len(s) for s in shards) else shards[0]
    return packing.unpack_codes(uniq, k, packing.boss_priority_order(k))


def _front_half_shards(sequences, k: int, mesh, n_devices,
                       mode: str = "basic"):
    """Mesh-sharded sort+dedupe keeping PER-SHARD outputs: returns
    (per-shard packed uint64 key rows — disjoint sorted ranges in BOSS
    priority order — and the uint32 range boundaries used to route)."""
    from ..kmer.extractor import KmerExtractor
    ex = KmerExtractor()
    packed, _ = ex._packed_windows(list(sequences), k, mode)
    W64 = packed.shape[1]
    keys32 = np.empty((len(packed), W64 * 2), dtype=np.uint32)
    keys32[:, 0::2] = (packed >> np.uint64(32)).astype(np.uint32)
    keys32[:, 1::2] = (packed & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    if mesh is None:
        devs = jax.devices()[: n_devices or len(jax.devices())]
        mesh = Mesh(np.array(devs), ("shard",))
    m = mesh.shape["shard"]
    N, W = keys32.shape
    B = max(-(-N // m), 1)
    pad = m * B - N
    if pad:
        keys32 = np.concatenate(
            [keys32, np.full((pad, W), SENTINEL, dtype=keys32.dtype)])
    boundaries = sample_boundaries(keys32[:N], m)
    keys_d = jax.device_put(keys32, NamedSharding(mesh, P("shard", None)))
    b_d = jax.device_put(
        np.ascontiguousarray(boundaries.reshape(max(m - 1, 1), W)
                             if m > 1 else np.zeros((1, W), keys32.dtype)),
        NamedSharding(mesh, P(None, None)))
    fn = sharded_sort_unique_fn(mesh, m, B, W)
    s, new = fn(keys_d, b_d)
    s = np.asarray(s)
    new = np.asarray(new)
    per = m * B
    shards = []
    for i in range(m):
        si = s[i * per: (i + 1) * per]
        ni = new[i * per: (i + 1) * per]
        keep = ni & ~np.all(si == SENTINEL, axis=1)
        s32 = si[keep]
        shards.append((s32[:, 0::2].astype(np.uint64) << np.uint64(32))
                      | s32[:, 1::2].astype(np.uint64))
    return shards, boundaries


# --------------------------------------------------------------- back half
# Sharded dummy generation + per-shard BOSS emission.  Everything below
# operates on PER-SHARD slices only (each step touches <= N/m + halo rows per
# shard); the inter-shard moves are m x m bucket exchanges — the host model
# of the all_to_all the front half already runs over the device mesh (on a
# pod the same routes ride the DCN; ref boss_chunk_construct.cpp:1020-1120
# does the same with per-suffix chunk files).  No step sorts or
# materializes the global stream.


def _exchange(buckets):
    """m x m bucket exchange: buckets[src][dst] -> per-dst concatenation
    (the host-side all_to_all; per-dst inputs keep src order)."""
    m = len(buckets)
    out = []
    for d in range(m):
        parts = [buckets[s][d] for s in range(m) if len(buckets[s][d])]
        out.append(np.concatenate(parts) if parts
                   else buckets[0][d])
    return out


def _route_rows(rows, keys, boundaries, m):
    """Split rows into m range buckets by packed key vs boundaries."""
    from ..kmer import packing
    dest = np.zeros(len(rows), dtype=np.int64)
    for b in range(m - 1):
        dest += packing.rows_lex_gt(keys, boundaries[b], xp=np)
    return [rows[dest == d] for d in range(m)]


def _uniq_sorted(keys):
    from ..kmer import packing
    if len(keys) == 0:
        return keys
    s = keys[packing.lexsort_rows(keys)]
    keep = np.ones(len(s), dtype=bool)
    if len(s) > 1:
        np.any(s[1:] != s[:-1], axis=1, out=keep[1:])
    return s[keep]


def sharded_generate_dummies(shard_codes, alph_size: int = 5):
    """Per-shard dummy-edge generation (back half step 1; semantics of
    construct.generate_dummy_kmers, ref boss_chunk_construct.cpp:42-171,
    decomposed into per-node-range owners).

    shard_codes: per-shard (N_i, K) real edge strings (disjoint BOSS-order
    ranges).  Returns per-OWNER dummy edge lists (unsorted; owners are
    node-key ranges — callers re-route by edge key before emission)."""
    from ..kmer import packing
    m = len(shard_codes)
    K = shard_codes[0].shape[1]
    k = K - 1
    bits = packing.bits_for_alphabet(alph_size)
    order_k = packing.colex_priority_order(k)

    def nkey(nodes):
        return packing.pack_codes(nodes, order_k, bits=bits)

    # node-range boundaries from a sample of source-node keys
    samples = [nkey(s[:, :k][:: max(len(s) // 256, 1)])
               for s in shard_codes if len(s)]
    node_bounds = sample_boundaries(
        np.concatenate(samples) if samples else
        np.zeros((0, 1), dtype=np.uint64), m)

    # route (node key, node chars) of every source and target to its owner
    src_b = [[None] * m for _ in range(m)]
    tgt_b = [[None] * m for _ in range(m)]
    for i, s in enumerate(shard_codes):
        for which, nodes, buckets in (("s", s[:, :k], src_b),
                                      ("t", s[:, 1:], tgt_b)):
            keys = nkey(nodes)
            parts = _route_rows(nodes, keys, node_bounds, m)
            for d in range(m):
                buckets[i][d] = parts[d]
    srcs = _exchange(src_b)
    tgts = _exchange(tgt_b)

    per_owner = []
    levels = []          # per-owner dummy-1 edges for the level loop
    for d in range(m):
        sk = _uniq_sorted(nkey(srcs[d]))
        tk = nkey(tgts[d])
        ts = tgts[d][packing.lexsort_rows(tk)]
        tks = tk[packing.lexsort_rows(tk)]
        tnew = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            np.any(tks[1:] != tks[:-1], axis=1, out=tnew[1:])
        tgt_nodes_u = ts[tnew]
        tk_u = tks[tnew]
        # dummy sinks: unique target nodes with no outgoing real edge
        sink_mask = ~packing.rows_in(sk, tk_u)
        sinks = np.concatenate(
            [tgt_nodes_u[sink_mask],
             np.zeros((int(sink_mask.sum()), 1), dtype=np.uint8)], axis=1)
        # dummy-1 sources: unique source nodes with no incoming real edge
        sn = _uniq_sorted_nodes(srcs[d], nkey)
        src_mask = ~packing.rows_in(tk_u, nkey(sn))
        lvl = np.concatenate(
            [np.zeros((int(src_mask.sum()), 1), dtype=np.uint8),
             sn[src_mask]], axis=1)
        per_owner.append([sinks, lvl])
        levels.append(lvl)

    # higher-level sources: prepend '$', dedupe per new node owner, repeat
    for _ in range(2, k + 1):
        buckets = [[None] * m for _ in range(m)]
        for i in range(m):
            nodes = levels[i][:, : K - 1]
            keys = nkey(nodes)
            parts = _route_rows(nodes, keys, node_bounds, m)
            for d in range(m):
                buckets[i][d] = parts[d]
        routed = _exchange(buckets)
        for d in range(m):
            uniq_nodes = _uniq_sorted_nodes(routed[d], nkey)
            lvl = np.concatenate(
                [np.zeros((len(uniq_nodes), 1), dtype=np.uint8), uniq_nodes],
                axis=1)
            per_owner[d].append(lvl)
            levels[d] = lvl
    return [np.concatenate(parts) if parts else
            np.zeros((0, K), dtype=np.uint8) for parts in per_owner]


def _uniq_sorted_nodes(nodes, nkey):
    """Unique node CHAR rows by packed key (set semantics; order free)."""
    from ..kmer import packing
    if len(nodes) == 0:
        return nodes
    keys = nkey(nodes)
    idx = packing.lexsort_rows(keys)
    s = keys[idx]
    keep = np.ones(len(s), dtype=bool)
    if len(s) > 1:
        np.any(s[1:] != s[:-1], axis=1, out=keep[1:])
    return nodes[idx[keep]]


def sharded_emit_boss(streams, alph_size: int = 5):
    """Per-shard BOSS row emission with halo exchange (back half step 2;
    semantics of construct.emit_boss, ref boss_chunk.cpp:33-133).

    streams: per-shard (M_i, K) edge strings, each locally sorted, shards in
    global BOSS order, beginning with the all-$ row in shard 0.  Per-shard
    work needs only (a) the next shard's first node key and (b) per-label
    carry of the last target key — O(alph_size) halo words per boundary.
    Returns assembled BossArrays (bit-identical to the host emit)."""
    from ..kmer import packing
    from ..succinct.construct import BossArrays, _node_key, _target_key
    bits = packing.bits_for_alphabet(alph_size)
    streams = [s for s in streams if len(s)]
    m = len(streams)
    K = streams[0].shape[1]
    k = K - 1

    node_keys = [_node_key(s, bits) for s in streams]
    tgt_keys = [_target_key(s, bits) for s in streams]

    # halo (a): first node key of the NEXT shard
    next_first = [node_keys[i + 1][0] if i + 1 < m else None
                  for i in range(m)]
    # halo (b): for each label c, the target key of the last label-c row in
    # any earlier shard — per-shard lasts + host exclusive scan
    carry = [[None] * alph_size]
    for i in range(m):
        prev = carry[-1]
        cur = list(prev)
        labels = streams[i][:, K - 1]
        for c in range(1, alph_size):
            pos = np.flatnonzero(labels == c)
            if len(pos):
                cur[c] = tgt_keys[i][pos[-1]]
        carry.append(cur)

    W_parts, last_parts, valid_parts = [], [], []
    F = np.zeros(alph_size, dtype=np.int64)
    for i in range(m):
        s = streams[i]
        M = len(s)
        labels = s[:, K - 1].astype(np.int64)
        node_last = s[:, K - 2].astype(np.int64)
        first_char = s[:, 0].astype(np.int64)
        same_next = np.zeros(M, dtype=bool)
        if M > 1:
            same_next[:-1] = np.all(node_keys[i][1:] == node_keys[i][:-1],
                                    axis=1)
        if next_first[i] is not None:
            same_next[-1] = bool(np.all(node_keys[i][-1] == next_first[i]))
        drop = same_next & (labels == 0) & (node_last > 0)
        keep = ~drop
        last_bits = (~same_next).astype(np.uint8)
        minus = np.zeros(M, dtype=bool)
        for c in range(1, alph_size):
            idx = np.flatnonzero(keep & (labels == c))
            if len(idx) == 0:
                continue
            if len(idx) > 1:
                minus[idx[1:]] = np.all(
                    tgt_keys[i][idx[1:]] == tgt_keys[i][idx[:-1]], axis=1)
            hc = carry[i][c]
            if hc is not None:
                minus[idx[0]] = bool(np.all(tgt_keys[i][idx[0]] == hc))
        W_full = (labels + np.where(minus, alph_size, 0)).astype(np.uint8)
        kept = np.flatnonzero(keep)
        W_parts.append(W_full[kept])
        last_parts.append(last_bits[kept])
        valid_parts.append(
            ((labels[kept] > 0) & (first_char[kept] > 0)).astype(np.uint8))
        nlc = node_last[kept]
        for c in range(1, alph_size):
            F[c] += int(np.searchsorted(nlc, c, side="left"))

    W = np.concatenate([[0]] + W_parts).astype(np.uint8)
    last = np.concatenate([[0]] + last_parts).astype(np.uint8)
    valid = np.concatenate([[0]] + valid_parts).astype(np.uint8)
    return BossArrays(k=k, alph_size=alph_size, W=W, last=last, F=F,
                      valid=valid)


def sharded_build_boss(sequences, k: int, mesh: Mesh | None = None,
                       mode: str = "basic", n_devices: int | None = None,
                       alph_size: int = 5):
    """Fully sharded BOSS construction: mesh-sorted real k-mers (device
    all_to_all) -> per-node-range dummy generation -> edge-range routing ->
    per-shard local sort -> per-shard emission with halos.  No host-global
    sort or stream materialization; the assembled arrays are bit-identical
    to succinct.construct.build_boss_arrays (asserted by tests and the
    driver dryrun).  Ref: boss_chunk_construct.cpp:1020-1120."""
    from ..kmer import packing
    key_shards, boundaries32 = _front_half_shards(sequences, k, mesh,
                                                  n_devices, mode)
    m = len(key_shards)
    K = k                       # edge-string length (BOSS node length k-1)
    order = packing.boss_priority_order(K)
    shard_codes = [packing.unpack_codes(s, K, order) for s in key_shards]
    bits = packing.bits_for_alphabet(alph_size)

    dummies = sharded_generate_dummies(shard_codes, alph_size)
    # route dummies + the all-$ row to their EDGE-range owners (the same
    # boundaries the reals were partitioned by), then local sort per shard
    b64 = (boundaries32[:, 0::2].astype(np.uint64) << np.uint64(32)) \
        | boundaries32[:, 1::2].astype(np.uint64)
    buckets = [[None] * m for _ in range(m)]
    for i in range(m):
        extra = dummies[i]
        if i == 0:
            extra = np.concatenate(
                [np.zeros((1, K), dtype=np.uint8), extra])
        keys = packing.pack_codes(extra, order, bits=bits)
        parts = _route_rows(extra, keys, b64, m)
        for d in range(m):
            buckets[i][d] = parts[d]
    routed = _exchange(buckets)
    streams = []
    for i in range(m):
        stream = np.concatenate([shard_codes[i], routed[i]]) \
            if len(routed[i]) else shard_codes[i]
        idx = packing.lexsort_rows(
            packing.pack_codes(stream, order, bits=bits))
        streams.append(stream[idx])
    return sharded_emit_boss(streams, alph_size)
